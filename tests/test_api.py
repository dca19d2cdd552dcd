"""S8 dashboard API (WebSite/api.py analog) end-to-end over HTTP."""

import json
import threading
import urllib.request


def _get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_api_crawl_search_metrics(spark, tmp_path):
    from high_performance_parallel_search_engine_spark.api import make_server

    srv = make_server(spark, str(tmp_path / "wd"), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, st = _get(port, "/api/status")
        assert code == 200 and st["status"] == "ok"
        assert st["committed_rounds"] == 0

        # the dashboard root (reference api.py:350 serves the SPA; here a
        # minimal status page completes the route surface)
        import urllib.request as _ur
        with _ur.urlopen(f"http://127.0.0.1:{port}/", timeout=60) as r:
            assert r.status == 200
            assert b"/api/search" in r.read()

        # /api/crawl launches a crawl over the synthetic web
        code, cr = _post(port, "/api/crawl",
                         {"start_url": "https://host0.example.com/p/0",
                          "depth": 3, "max_pages": 30})
        assert code == 200 and cr["status"] == "ok"
        assert cr["pages_crawled"] > 0

        code, st2 = _get(port, "/api/status")
        assert st2["committed_rounds"] > 0

        code, m = _get(port, "/api/metrics")
        assert code == 200 and len(m["rounds"]) == st2["committed_rounds"]
        assert all("stage_wall" in r for r in m["rounds"])

        code, s = _post(port, "/api/search",
                        {"query": "crawl indexes bm25", "limit": 5})
        assert code == 200 and s["status"] == "ok"
        assert s["results"] and s["results"][0]["url"]
        assert s["query_time_ms"] > 0

        # validation envelope mirrors the reference's 400s
        code, err = _post(port, "/api/search", {})
        assert code == 400 and err["status"] == "error"
        code, _ = _get(port, "/api/nope")
        assert code == 404

        # /api/compare (WebSite/api.py:468 analog): same query through both
        # ranking versions, results + timings side by side + diff envelope
        code, cp = _post(port, "/api/compare",
                         {"query": "crawl indexes bm25", "limit": 5})
        assert code == 200 and cp["status"] == "ok"
        assert set(cp["results"]) == {"serial", "openmp"}
        for v in cp["results"].values():
            assert v["query_time_ms"] > 0 and v["results"]
        assert "query_time_ms_delta" in cp["diff"]
        # same corpus, all primary terms present -> identical rankings
        assert cp["diff"]["results_equal"] is True
        code, cp_bad = _post(port, "/api/compare",
                             {"query": "x", "versions": ["serial", "cuda"]})
        assert code == 400 and "Invalid version" in cp_bad["error"]
        code, cp_miss = _post(port, "/api/compare", {})
        assert code == 400
    finally:
        srv.shutdown()


def test_api_recrawl_replaces_stale_rounds_and_409_busy(spark, tmp_path):
    """A second, SHORTER crawl into the same workdir must not leave the
    first crawl's later rounds in the index glob (ADVICE round-2 item); a
    concurrent build answers 409 busy instead of racing the workdir."""
    from high_performance_parallel_search_engine_spark.api import make_server

    srv = make_server(spark, str(tmp_path / "wd"), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        _post(port, "/api/crawl", {"start_url": "https://host0.example.com/p/0",
                                   "depth": 3, "max_pages": 30})
        code, st1 = _get(port, "/api/status")
        n1 = st1["committed_rounds"]
        code, cr2 = _post(port, "/api/crawl",
                          {"start_url": "https://host0.example.com/p/0",
                           "depth": 1, "max_pages": 5})
        assert code == 200
        code, st2 = _get(port, "/api/status")
        assert st2["committed_rounds"] < n1  # stale rounds are gone
        code, m = _get(port, "/api/metrics")
        assert len(m["rounds"]) == st2["committed_rounds"]
        # the rebuilt index must only hold the second crawl's pages
        code, s = _post(port, "/api/search",
                        {"query": "crawl indexes bm25", "limit": 100})
        assert len(s["results"]) <= cr2["pages_crawled"]
    finally:
        srv.shutdown()


def test_api_crawl_busy_returns_409(spark, tmp_path):
    from high_performance_parallel_search_engine_spark.api import EngineState

    eng = EngineState(spark, str(tmp_path / "wd2"))
    assert eng._crawl_lock.acquire(blocking=False)
    try:
        out = eng.crawl("https://host0.example.com/p/0", 1, 5)
        assert out["_code"] == 409 and out["status"] == "error"
    finally:
        eng._crawl_lock.release()
    # lock released -> the same call now runs
    out = eng.crawl("https://host0.example.com/p/0", 1, 3)
    assert out["status"] == "ok" and out["pages_crawled"] > 0
