"""Serve the S8 dashboard API over a crawl workdir.

    python tools/serve_api.py --workdir /data/crawl [--pages-table P]
                              [--port 8080] [-t THREADS]

Endpoints: GET /api/status, GET /api/metrics, POST /api/search
{"query": ..., "limit": 10}, POST /api/crawl {"start_url": ...,
"depth": 2, "max_pages": 10}.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages-table")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("-t", "--threads", type=int, default=None)
    args = ap.parse_args()

    from high_performance_parallel_search_engine_spark.api import make_server
    from high_performance_parallel_search_engine_spark.session import (
        build_session,
    )

    master = f"local[{args.threads}]" if args.threads else None
    spark = build_session("hppse-api", master=master,
                          shuffle_partitions=args.threads)
    pages = (spark.read.parquet(args.pages_table)
             .select("url", "warc_ts", "html", "lang")
             if args.pages_table else None)
    srv = make_server(spark, args.workdir, pages, port=args.port)
    print(f"serving on http://127.0.0.1:{srv.server_address[1]}")
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
