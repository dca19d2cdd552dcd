"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, comparing row count, schema (column names), and an
order-insensitive value hash (rows sorted by their string rendering, columns
sorted by name, floats rendered via repr of round(12)).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = []
    for row in rows:
        parts = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            parts.append(str(v))
        lines.append("\x1f".join(parts))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # align the oracle-side sf dir with the one under check BEFORE the
    # registry imports: ivf_topk_trained's oracle trains its centroid
    # literals from ORACLE_SF_DIR, and a mismatch (e.g. checking sf0.001
    # with the sf0.01 default) fails the gate spuriously - the Spark and
    # DuckDB sides must train on the SAME embeddings
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import duckdb

    import __spark_entry__ as entrymod
    from high_performance_parallel_search_engine_spark.session import build_session

    spark = build_session("correctness", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only n={len(srows)} "
                  f"({time.monotonic() - t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        else:
            hs = value_hash(scols, srows)
            ho = value_hash(ocols, orows)
            if hs != ho:
                problems.append("value hash mismatch")
                pairs = {tuple(sorted(zip(scols, map(str, r)))) for r in srows}
                opairs = {tuple(sorted(zip(ocols, map(str, r)))) for r in orows}
                diff = list(pairs.symmetric_difference(opairs))[:3]
                problems.append(f"sample diff: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: n={len(srows)} "
                  f"({time.monotonic() - t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
