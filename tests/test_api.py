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
    finally:
        srv.shutdown()
