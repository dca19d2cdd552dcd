"""Isolated extract_write stage bench: scan corpus -> length gate ->
one-pass text+links extraction -> parquet write, the crawl's dominant
stage, in a fresh process so Spark conf experiments are clean.

Usage:
  python tools/bench_extract_stage.py <threads> <corpus_path> [out]
Env knobs (experiment surface):
  EX_ARROW_BATCH   spark.sql.execution.arrow.maxRecordsPerBatch (def 256,
                   the session default this sweep selected)
  EX_CODEC         parquet codec for the output write (def snappy)
  EX_MAX_PART_MB   spark.sql.files.maxPartitionBytes in MB (def 32)
  EX_SELF_DESTRUCT arrow selfDestruct (def false)
  EX_SKIP_LINKS    'true' = text-only extraction (the crawl's final-round
                   shape, and what the mp ceiling measures)
Prints one JSON line with wall + pages/s.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    threads = int(sys.argv[1])
    corpus = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/extract_stage_out"
    batch = os.environ.get("EX_ARROW_BATCH", "256")
    codec = os.environ.get("EX_CODEC", "snappy")
    part_mb = int(os.environ.get("EX_MAX_PART_MB", "32"))
    selfd = os.environ.get("EX_SELF_DESTRUCT", "false")

    from high_performance_parallel_search_engine_spark.session import (
        build_session,
    )

    spark = build_session(
        "extract-stage", master=f"local[{threads}]",
        shuffle_partitions=threads,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(part_mb * 1024 * 1024),
            "spark.sql.execution.arrow.maxRecordsPerBatch": batch,
            "spark.sql.execution.arrow.pyspark.selfDestruct.enabled": selfd,
            "spark.sql.parquet.compression.codec": codec,
        })
    from pyspark.sql import functions as F

    from high_performance_parallel_search_engine_spark.functions.udfs import (
        html_text_and_links,
    )

    skip_links = os.environ.get("EX_SKIP_LINKS", "false") == "true"
    pages = spark.read.parquet(corpus).select("url", "html", "warc_ts",
                                              "lang")
    src = (pages.where(F.length("html") > 100)
           .withColumn("_skip_links", F.lit(skip_links)))

    # warmup: a small slice through the same UDF+write path so the timed
    # run measures the steady-state stage (the crawl reaches its big rounds
    # in a warm JVM with python workers already spawned)
    warm = src.limit(4000)
    html_text_and_links(warm, skip_links_col="_skip_links").drop(
        "html").write.mode("overwrite").parquet(out + "_warm")
    shutil.rmtree(out + "_warm", ignore_errors=True)

    import statistics

    reps = int(os.environ.get("EX_REPS", "3"))
    walls = []
    for _ in range(reps):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.monotonic()
        extracted = html_text_and_links(src, skip_links_col="_skip_links")
        extracted.drop("html").write.mode("overwrite").parquet(out)
        walls.append(round(time.monotonic() - t0, 2))
    wall = statistics.median(walls)
    n = spark.read.parquet(out).count()
    print(json.dumps({"threads": threads, "batch": int(batch),
                      "codec": codec, "part_mb": part_mb,
                      "pages": n, "walls": walls, "wall_sec": wall,
                      "pages_per_sec": round(n / wall, 1)}))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
