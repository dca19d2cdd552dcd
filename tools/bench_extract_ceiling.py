"""Same-work extraction ceiling (invoked by bench.py, optionally under
taskset): html_to_text + parquet write over a sample of the bench corpus in
a plain multiprocessing pool - zero Spark. Run at N and 4N processes this
measures the BOX's scaling ceiling for the crawl's dominant stage (CPython
byte state machines are memory/allocator-bound well before 32 cores; integer
busy-loops overstate the ceiling). Each worker writes its extracted text to
its own parquet file (pyarrow), matching the work the Spark extract_write
stage actually does, so the stage-vs-ceiling ratio compares equal jobs.

Usage: python tools/bench_extract_ceiling.py <procs> <corpus_path> [max_pages]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

_OUT_DIR = None


def _pool_init(out_dir: str) -> None:
    global _OUT_DIR
    _OUT_DIR = out_dir


def work(args: tuple[int, list[bytes]]) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_parallel_search_engine_spark.kernel.html import (
        html_to_text,
    )

    idx, htmls = args
    texts = [html_to_text(h).decode("utf-8", errors="replace")
             for h in htmls]
    pq.write_table(pa.table({"text": texts}),
                   os.path.join(_OUT_DIR, f"part-{idx:05d}.parquet"))
    return sum(len(t) for t in texts)


def main() -> None:
    procs = int(sys.argv[1])
    corpus = sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 60_000

    import pyarrow.dataset as ds

    data = (ds.dataset(corpus).head(cap, columns=["html"])
            .column("html").to_pylist())
    chunks = [(i, data[i::procs * 4]) for i in range(procs * 4)]
    out_dir = tempfile.mkdtemp(prefix="extract_ceiling_")
    try:
        with mp.Pool(procs, initializer=_pool_init,
                     initargs=(out_dir,)) as pool:
            pool.map(work, [(i + 10000, c[:10]) for i, c in chunks])  # warm
            t0 = time.perf_counter()
            pool.map(work, chunks)
            wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({"procs": procs, "pages": len(data),
                      "wall_sec": round(wall, 2),
                      "pages_per_sec": round(len(data) / wall, 1)}))


if __name__ == "__main__":
    main()
