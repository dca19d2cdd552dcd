"""Measure what LSM delta segments buy in index-maintenance I/O.

A realistic maintenance profile: one large initial corpus batch, then a
stream of small crawl-round increments (the steady state of a continuous
crawl). The same batches are folded twice:

- full:  compact_every=1 - every batch rewrites the whole merged base
         (write cost O(index) per batch),
- lsm:   compact_every=K - each batch writes only its own segment;
         every Kth batch compacts (write cost O(delta) amortized).

Bytes written are measured directly (sum of file sizes ADDED to the
index_root between applies - retention deletions don't offset writes).
Both modes must read back identically; asserted before anything is
reported.

Run ALONE (never concurrently with another Spark bench). Writes one JSON
artifact (default bench_index_maintenance.json) and prints it.

Usage: python tools/bench_index_maintenance.py [out.json] [big] [small] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from high_performance_parallel_search_engine_spark.session import (  # noqa: E402
    build_session)
from high_performance_parallel_search_engine_spark.streaming.index_stream import (  # noqa: E402
    apply_index_delta, read_current_postings)

BIG = 20_000
SMALL = 500
# the long-crawl shape: 1 big + 13 small rounds. 13 (not a multiple of
# compact_every) leaves segments OUTSTANDING at the end, so the final
# equality check exercises the LSM merged read view (latest-segment-wins
# + base anti-join), not just the compaction path
ROUNDS = 13
COMPACT_EVERY = 6
TOKENS_PER_DOC = 60
VOCAB = 12_000


def synth_batch(spark, start: int, n: int):
    from high_performance_parallel_search_engine_spark.sources.synth import (
        hash_docs_df)

    return hash_docs_df(spark, n, start=start,
                        tokens_per_doc=TOKENS_PER_DOC, vocab=VOCAB) \
        .withColumn("warc_ts", F.expr("timestamp'2026-01-01'"))


def _files(root):
    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            out[p] = os.path.getsize(p)
    return out


def drain(spark, root, batches, compact_every):
    written, walls = [], []
    before = {}
    for i, b in enumerate(batches):
        t0 = time.perf_counter()
        apply_index_delta(root, b, i, compact_every=compact_every)
        walls.append(time.perf_counter() - t0)
        after = _files(root)
        written.append(sum(sz for p, sz in after.items()
                           if p not in before))
        before = after
    return written, walls


def main() -> None:
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "bench_index_maintenance.json")
    big = int(sys.argv[2]) if len(sys.argv) > 2 else BIG
    small = int(sys.argv[3]) if len(sys.argv) > 3 else SMALL
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else ROUNDS
    spark = build_session("bench-index-maint", master="local[32]",
                          shuffle_partitions=32)
    import tempfile
    work = tempfile.mkdtemp(prefix="bench-ixmaint-")

    batches = [synth_batch(spark, 0, big)]
    for r in range(rounds):
        batches.append(synth_batch(spark, big + r * small, small))

    results = {}
    for mode, ce in (("full", 1), ("lsm", COMPACT_EVERY)):
        root = f"{work}/{mode}"
        written, walls = drain(spark, root, batches, ce)
        results[mode] = {"bytes_per_batch": written,
                         "total_bytes": sum(written),
                         "wall_sec": round(sum(walls), 2)}

    # equality must hold with segments OUTSTANDING (the merged read view,
    # not just the compaction path) - and is checked Spark-side so the
    # bench scales with the `big` knob instead of collecting the index
    from high_performance_parallel_search_engine_spark.streaming.index_stream import (
        read_manifest)
    outstanding = len(read_manifest(f"{work}/lsm")["deltas"])
    assert outstanding > 0, \
        "schedule ended on a compaction; equality would be vacuous"
    a, _ = read_current_postings(spark, f"{work}/full")
    b, _ = read_current_postings(spark, f"{work}/lsm")
    same = (a.exceptAll(b).limit(1).count() == 0
            and b.exceptAll(a).limit(1).count() == 0)
    assert same, "LSM read view diverged from full-rewrite mode"

    # steady-state economics: bytes per SMALL batch, big batch excluded
    steady_full = sum(results["full"]["bytes_per_batch"][1:])
    steady_lsm = sum(results["lsm"]["bytes_per_batch"][1:])
    out = {
        "metric": "lsm_steady_write_bytes_reduction",
        "value": round(steady_full / steady_lsm, 2),
        "unit": "x",
        "corpus": {"big": big, "small": small, "rounds": rounds,
                   "vocab": VOCAB, "tokens_per_doc": TOKENS_PER_DOC},
        "compact_every": COMPACT_EVERY,
        "total_bytes": {m: r["total_bytes"] for m, r in results.items()},
        "steady_bytes": {"full": steady_full, "lsm": steady_lsm},
        "wall_sec": {m: r["wall_sec"] for m, r in results.items()},
        "bytes_per_batch": {m: r["bytes_per_batch"]
                            for m, r in results.items()},
        "read_views_identical": True,
        "outstanding_deltas_at_check": outstanding,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "bytes_per_batch"}))


if __name__ == "__main__":
    main()
