"""Run the training-data distillation pipeline over a documents table.

    python tools/distill_corpus.py [in.parquet] [out.parquet]
                                   [--langs en,de | --all-langs]
                                   [--no-quality] [--no-near-dup]

Defaults to $SPARK_GRAFT_SF_DIR/documents.parquet (or
/root/testdata/sf0.1). Writes the cleaned, annotated corpus and prints
ONE JSON line with the per-stage row counts.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    default_in = os.path.join(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "documents.parquet")
    ap.add_argument("input", nargs="?", default=default_in)
    ap.add_argument("output", nargs="?", default="/tmp/distilled.parquet")
    ap.add_argument("--langs", default="en")
    ap.add_argument("--all-langs", action="store_true")
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("-t", "--threads", type=int, default=None)
    args = ap.parse_args()

    from high_performance_parallel_search_engine_spark.operators.pipeline import (
        DistillConfig, distill_corpus)
    from high_performance_parallel_search_engine_spark.session import (
        build_session)

    master = f"local[{args.threads}]" if args.threads else None
    spark = build_session("distill", master=master,
                          shuffle_partitions=args.threads)
    docs = spark.read.parquet(args.input)
    cfg = DistillConfig(
        langs=None if args.all_langs else tuple(args.langs.split(",")),
        require_quality=not args.no_quality,
        near_dup=not args.no_near_dup)
    t0 = time.perf_counter()
    clean, stages = distill_corpus(docs, cfg, count_stages=True)
    clean.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"metric": "distill_stages", "stages": stages,
                      "output": args.output,
                      "wall_sec": round(time.perf_counter() - t0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
