"""Round-6 measurement harness (bench.py is FROZEN for measurement; this
file carries the extra instrumentation the optimization round needs).

Modes:
  python bench_extra.py queries [name ...]   - phase-1 methodology (median
      of 3 counts, same session conf as bench.py) + noop-sink isolation
      (guide §1.4) + job counts per query
  python bench_extra.py plans <tag> [name ...] - write .explain("formatted")
      for each headline query to plans/r06/<name>_<tag>.txt
  python bench_extra.py warm               - phase-1b warm-query timing
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "url_normalize", "url_valid", "postings", "bm25_topk", "per_parent_cap",
    "sessionize", "lineitem_agg", "nation_revenue_topk", "dedup_exact",
    "minhash_lsh_pairs", "simhash", "ngram_jaccard_pairs", "cosine_topk",
    "lang_id", "quality_score", "token_counts", "dedup_components",
    "postings_incremental",
]


def build_session():
    from high_performance_parallel_search_engine_spark.session import (
        build_session as bs,
    )

    return bs("bench-extra", master=f"local[{CPUS}]",
              shuffle_partitions=CPUS,
              extra_conf={"spark.sql.files.maxPartitionBytes": "33554432"})


def mode_queries(names: list[str]) -> None:
    from high_performance_parallel_search_engine_spark.oracles import QUERIES

    spark = build_session()
    sc = spark.sparkContext
    QUERIES["url_priority"](spark, SF_DIR).count()  # warmup (as bench.py)
    out = {}
    for name in names or HEADLINE:
        fn = QUERIES[name]
        walls, jobs = [], []
        for _ in range(3):
            tracker = sc.statusTracker()
            j0 = tracker.getJobIdsForGroup(None)
            sc.setJobDescription(f"hq:{name}")
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            walls.append(time.monotonic() - t0)
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            jobs.append(len(set(j1) - set(j0)))
        # noop isolation: computes every column (count can prune)
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        noop = time.monotonic() - t0
        sc.setJobDescription(None)
        out[name] = {"median": round(statistics.median(walls), 3),
                     "walls": [round(w, 3) for w in walls],
                     "noop": round(noop, 3), "jobs": jobs[-1], "rows": n}
        print(f"{name}: med={out[name]['median']}s walls={out[name]['walls']}"
              f" noop={out[name]['noop']}s jobs={jobs} rows={n}", flush=True)
    print(json.dumps(out))
    spark.stop()


def mode_plans(tag: str, names: list[str]) -> None:
    from high_performance_parallel_search_engine_spark.oracles import QUERIES

    spark = build_session()
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r06")
    os.makedirs(dest, exist_ok=True)
    for name in names or HEADLINE:
        df = QUERIES[name](spark, SF_DIR)
        p = os.path.join(dest, f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print(f"wrote {p}", flush=True)
    spark.stop()


def mode_warm() -> None:
    from high_performance_parallel_search_engine_spark.operators import (
        index as IX,
        local_serve as LS,
        ranking as RK,
    )

    spark = build_session()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    postings = IX.build_postings(docs).cache()
    stats = IX.build_doc_stats(docs).cache()
    total = stats.count()
    avg_dl = IX.avg_doc_len(stats, total)
    postings.count()
    dfs = IX.term_df(postings).cache()
    df_map = IX.term_df_map(dfs)
    with RK.interactive_query_conf(spark):
        RK.rank_bm25(postings, stats, "spark join window stream",
                     total_docs=total, avg_dl=avg_dl, df_map=df_map).collect()
        times = []
        for _ in range(5):
            t0 = time.monotonic()
            RK.rank_bm25(postings, stats, "spark join window stream",
                         total_docs=total, avg_dl=avg_dl, top_k=10,
                         df_map=df_map).collect()
            times.append((time.monotonic() - t0) * 1000)
    print(f"warm sf median {statistics.median(times):.1f} ms "
          f"({[round(t, 1) for t in times]})")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        mode_queries(sys.argv[2:])
    elif mode == "plans":
        mode_plans(sys.argv[2], sys.argv[3:])
    elif mode == "warm":
        mode_warm()
    else:
        raise SystemExit(f"unknown mode {mode}")
