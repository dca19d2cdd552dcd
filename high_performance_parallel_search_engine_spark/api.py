"""S8: the dashboard API contract (WebSite/api.py routes :350-520),
re-expressed over the Spark engine. The reference Flask app shells out to
the C binaries; this serves the same JSON surface from an in-process
SparkSession over a crawl workdir - stdlib http.server, zero extra deps.

Routes (reference analog in parens):

  GET  /api/status                      (api.py:358 - engine + index state)
  POST /api/search  {query, limit?}     (api.py:372 - BM25 top-k + timing)
  GET  /api/metrics                     (api.py:414 - per-round crawl
                                         metrics.json list)
  POST /api/crawl   {start_url, depth?, max_pages?}
                                        (api.py:428 /api/build analog:
                                         launches a crawl into the workdir;
                                         409 when a build is in progress)
  POST /api/compare {query, versions?, limit?}
                                        (api.py:468 - same query through
                                         multiple engine versions, results +
                                         timings side by side; here the
                                         versions are the ranking paths:
                                         'serial' = exact-term BM25,
                                         'openmp' = the OpenMP
                                         plural/singular-retry variant)

Launch: `python tools/serve_api.py --workdir D [--pages-table P] [--port N]`
or programmatically via make_server(...).serve_forever().
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import urlparse

# The reference's VERSIONS list names compiled engine variants
# (WebSite/api.py:31); this engine has one executable but two ranking
# semantics - the serial exact-term scorer and the OpenMP retry scorer
# (OpenMP Version/src/ranking.c:110-150) - which is what compare diffs.
COMPARE_VERSIONS = {"serial": False, "openmp": True}


class EngineState:
    """Lazily builds and caches the query index over the workdir's crawled
    pages; a crawl through /api/crawl invalidates it.

    Locking: `_lock` guards the cached index for the FULL duration of every
    search (so a concurrent crawl's invalidate() can never unpersist a
    postings DataFrame mid-collect); `_crawl_lock` serializes /api/crawl -
    a second build while one is running answers 409 busy instead of racing
    two run_crawl loops into the same workdir."""

    def __init__(self, spark, workdir: str, pages_df=None):
        self.spark = spark
        self.workdir = workdir
        self.pages_df = pages_df
        self._lock = threading.Lock()
        self._crawl_lock = threading.Lock()
        self._index = None

    def _build_index(self):
        from pyspark.sql import functions as F

        from .operators.index import build_doc_stats, build_postings

        from .operators.index import term_df

        docs = (self.spark.read
                .parquet(f"{self.workdir}/round=*/pages.parquet")
                .select(F.col("seq").alias("doc_id"), "url", "text"))
        postings = build_postings(docs).cache()
        stats = build_doc_stats(docs).cache()
        total = stats.count()
        avg_dl = ((stats.groupBy().sum("dl").collect()[0][0] or 0) / total
                  if total else 0.0)
        postings.count()
        # (term, df) cached once at build: every search then skips the
        # per-query df aggregation (rank_bm25 df_table warm path)
        dfs = term_df(postings).cache()
        dfs.count()
        # urls stay a DataFrame: resolving a top-k result joins k rows
        # against it (broadcast on the k side), so nothing doc-count-sized
        # ever crosses to the driver - a 10^9-doc corpus serves the same way
        urls = docs.select("doc_id", "url").cache()
        urls.count()
        return {"postings": postings, "stats": stats, "total": total,
                "avg_dl": avg_dl, "urls": urls, "term_df": dfs}

    def _index_locked(self):
        if self._index is None:
            self._index = self._build_index()
        return self._index

    def invalidate(self):
        with self._lock:
            if self._index is not None:
                self._index["postings"].unpersist()
                self._index["stats"].unpersist()
                self._index["urls"].unpersist()
                self._index["term_df"].unpersist()
            self._index = None

    # ---- endpoint logic -----------------------------------------------

    def status(self) -> dict:
        rounds = sorted(p.name for p in Path(self.workdir).glob("round=*")
                        if (p / "manifest.json").exists()
                        and not p.name.startswith("round=-"))  # skip seed init
        return {"status": "ok", "api_version": "1.0",
                "workdir": self.workdir, "committed_rounds": len(rounds),
                "building": self._crawl_lock.locked()}

    def _search_locked(self, query: str, limit: int,
                       fallback: bool) -> dict:
        from pyspark.sql import functions as F

        from .operators.ranking import interactive_query_conf, rank_bm25

        ix = self._index_locked()
        t0 = time.perf_counter()
        hits = rank_bm25(ix["postings"], ix["stats"], query,
                         total_docs=ix["total"], avg_dl=ix["avg_dl"],
                         top_k=limit, fallback=fallback,
                         df_table=ix["term_df"])
        # k rows broadcast into the urls table - never a driver-side url map
        with interactive_query_conf(self.spark):
            rows = (ix["urls"].join(F.broadcast(hits), "doc_id")
                    .select("doc_id", "url", "score").collect())
        rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
        ms = (time.perf_counter() - t0) * 1000
        return {"status": "ok", "query": query,
                "query_time_ms": round(ms, 2),
                "results": [{"doc_id": r["doc_id"], "url": r["url"],
                             "score": round(r["score"], 4)} for r in rows]}

    def search(self, query: str, limit: int = 10) -> dict:
        with self._lock:
            return self._search_locked(query, limit, fallback=True)

    def compare(self, query: str, versions: list[str],
                limit: int = 10) -> dict:
        """WebSite/api.py:468 analog: one query through each named version,
        results + timings side by side plus a diff envelope."""
        bad = [v for v in versions if v.lower() not in COMPARE_VERSIONS]
        if bad:
            return {"status": "error", "_code": 400,
                    "error": f"Invalid version: {bad[0]}. Must be one of: "
                             f"{', '.join(sorted(COMPARE_VERSIONS))}"}
        results = {}
        with self._lock:
            for v in versions:
                results[v] = self._search_locked(
                    query, limit, fallback=COMPARE_VERSIONS[v.lower()])
        diff = {}
        if len(versions) >= 2:
            a, b = versions[0], versions[1]
            diff = {
                "query_time_ms_delta": round(
                    results[b]["query_time_ms"]
                    - results[a]["query_time_ms"], 2),
                "results_equal": [r["doc_id"] for r in results[a]["results"]]
                == [r["doc_id"] for r in results[b]["results"]],
            }
        return {"status": "ok", "query": query, "results": results,
                "diff": diff}

    def metrics(self) -> dict:
        out = []
        for p in sorted(Path(self.workdir).glob("round=*/metrics.json")):
            out.append(json.loads(p.read_text()))
        return {"status": "ok", "rounds": out}

    def crawl(self, start_url: str, depth: int = 2,
              max_pages: int = 10) -> dict:
        from .operators.crawl import CrawlConfig, run_crawl
        from .sources.synth import build_corpus_df

        if not self._crawl_lock.acquire(blocking=False):
            return {"status": "error", "_code": 409,
                    "error": "a crawl is already in progress"}
        try:
            pages = self.pages_df
            if pages is None:
                pages = build_corpus_df(self.spark) \
                    .select("url", "warc_ts", "html", "lang")
            state = run_crawl(self.spark, pages, [start_url], self.workdir,
                              CrawlConfig(max_depth=depth,
                                          max_pages=max_pages))
            self.invalidate()
            return {"status": "ok", "pages_crawled": state.pages_crawled,
                    "rounds": state.round,
                    "stopped": state.stopped or "frontier_empty"}
        finally:
            self._crawl_lock.release()


def make_server(spark, workdir: str, pages_df=None,
                port: int = 0) -> ThreadingHTTPServer:
    engine = EngineState(spark, workdir, pages_df)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            code = obj.pop("_code", code) if isinstance(obj, dict) else code
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            try:
                if path == "/":
                    # the reference serves its dashboard SPA at / (api.py:
                    # 350-356); this engine ships a minimal status page so
                    # the route surface is complete without a frontend build
                    st = engine.status()
                    body = (
                        "<!doctype html><title>hppse-spark</title>"
                        "<h1>High-Performance Parallel Search Engine "
                        "(PySpark)</h1>"
                        f"<p>workdir: {st['workdir']} - committed rounds: "
                        f"{st['committed_rounds']}</p>"
                        "<ul><li>GET /api/status</li><li>GET /api/metrics"
                        "</li><li>POST /api/search {query, limit?}</li>"
                        "<li>POST /api/crawl {start_url, depth?, max_pages?}"
                        "</li><li>POST /api/compare {query, versions?}</li>"
                        "</ul>").encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif path == "/api/status":
                    self._json(engine.status())
                elif path == "/api/metrics":
                    self._json(engine.metrics())
                else:
                    self._json({"status": "error",
                                "error": "not found"}, 404)
            except Exception as e:  # mirror api.py's 500 envelope
                self._json({"status": "error", "error": str(e)}, 500)

        def do_POST(self):
            path = urlparse(self.path).path
            try:
                n = int(self.headers.get("Content-Length") or 0)
                data = json.loads(self.rfile.read(n) or b"{}")
                if path == "/api/search":
                    if "query" not in data:
                        self._json({"status": "error",
                                    "error": "Missing required field: "
                                             "query"}, 400)
                        return
                    self._json(engine.search(
                        data["query"], int(data.get("limit", 10))))
                elif path == "/api/compare":
                    if "query" not in data:
                        self._json({"status": "error",
                                    "error": "Missing required fields: "
                                             "query and versions"}, 400)
                        return
                    self._json(engine.compare(
                        data["query"],
                        data.get("versions") or ["serial", "openmp"],
                        int(data.get("limit", 10))))
                elif path == "/api/crawl":
                    if "start_url" not in data:
                        self._json({"status": "error",
                                    "error": "Missing required field: "
                                             "start_url"}, 400)
                        return
                    self._json(engine.crawl(
                        data["start_url"], int(data.get("depth", 2)),
                        int(data.get("max_pages", 10))))
                else:
                    self._json({"status": "error",
                                "error": "not found"}, 404)
            except Exception as e:
                self._json({"status": "error", "error": str(e)}, 500)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
