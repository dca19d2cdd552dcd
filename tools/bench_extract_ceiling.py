"""Same-kernel extraction ceiling (invoked by bench.py, optionally under
taskset): html_to_text over a sample of the bench corpus in a plain
multiprocessing pool - zero Spark. Run at N and 4N processes this measures
the BOX's scaling ceiling for the crawl's dominant compute (CPython byte
state machines are memory/allocator-bound well before 32 cores; integer
busy-loops overstate the ceiling).

Usage: python tools/bench_extract_ceiling.py <procs> <corpus_path> [max_pages]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def work(htmls: list[bytes]) -> int:
    from high_performance_parallel_search_engine_spark.kernel.html import (
        html_to_text,
    )

    n = 0
    for h in htmls:
        n += len(html_to_text(h))
    return n


def main() -> None:
    procs = int(sys.argv[1])
    corpus = sys.argv[2]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 60_000

    import pyarrow.dataset as ds

    data = (ds.dataset(corpus).head(cap, columns=["html"])
            .column("html").to_pylist())
    chunks = [data[i::procs * 4] for i in range(procs * 4)]
    with mp.Pool(procs) as pool:
        pool.map(work, [c[:10] for c in chunks])  # warm the pool
        t0 = time.perf_counter()
        pool.map(work, chunks)
        wall = time.perf_counter() - t0
    print(json.dumps({"procs": procs, "pages": len(data),
                      "wall_sec": round(wall, 2),
                      "pages_per_sec": round(len(data) / wall, 1)}))


if __name__ == "__main__":
    main()
