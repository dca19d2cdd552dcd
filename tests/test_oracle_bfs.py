"""Oracle validation.

The round-based oracle (kernel/bfs.py) claims: with no politeness budget,
processing whole BFS rounds in (parent order, link order) reproduces the
serial reference's strict-FIFO fetch order (crawl_website,
Serial Version/src/crawler.c:1075-1383). This test cross-checks that claim
with a LITERAL ring-FIFO simulation - a structurally different control flow
using the same kernel primitives - over many (seed, depth, pages) configs.
"""

from collections import deque

import pytest

from high_performance_parallel_search_engine_spark.kernel.bfs import crawl
from high_performance_parallel_search_engine_spark.kernel.html import extract_links
from high_performance_parallel_search_engine_spark.kernel.urls import (
    extract_base_domain,
    is_html_content_url,
    is_valid_crawl_url,
    normalize_url,
)
from high_performance_parallel_search_engine_spark.sources.synth import (
    pages_dict,
    seed_urls,
)


def fifo_crawl(pages, seed, max_depth, max_pages, failure_stop=10):
    """Literal translation of the serial FIFO loop (crawler.c:1032-1403)."""
    visited = set()
    q = deque()
    ns = normalize_url(seed)
    if not ns:
        return []
    q.append((ns, 1))
    visited.add(ns)
    bd = extract_base_domain(seed)
    crawled = 0
    failed = 0
    order = []
    while q and crawled < max_pages and failed < failure_stop:
        url, depth = q.popleft()
        if not is_valid_crawl_url(url, bd):
            continue
        html = pages.get(url)
        ok = html is not None and len(html) > 100 and is_html_content_url(url)
        if not ok:
            failed += 1
            continue
        order.append(url)
        crawled += 1
        failed = 0
        if depth < max_depth:
            added = 0
            for link in extract_links(html, url):
                if added >= 20:
                    break
                if not is_valid_crawl_url(link, bd):
                    continue
                if link in visited:
                    continue
                visited.add(link)
                q.append((link, depth + 1))
                added += 1
    return order


PAGES = pages_dict()
SEEDS = seed_urls()


@pytest.mark.parametrize("seed", SEEDS + ["https://medium.com/@user1",
                                          "https://host1.example.com/p/3"])
@pytest.mark.parametrize("max_depth,max_pages", [(1, 5), (2, 10), (2, 100),
                                                 (3, 17), (3, 1000), (4, 60)])
def test_round_oracle_equals_literal_fifo(seed, max_depth, max_pages):
    expected = fifo_crawl(PAGES, seed, max_depth, max_pages)
    got = crawl(PAGES, [seed], max_depth=max_depth, max_pages=max_pages)
    assert got.fetch_order == expected


def test_invalid_seed_yields_no_fetches():
    r = crawl(PAGES, ["ftp://nope.example.com/x"], max_depth=2, max_pages=5)
    assert r.fetch_order == []


def test_failure_stop_counts_consecutive_failures():
    # a corpus of only dead links: seed fetch fails, crawl stops, no retry loop
    r = crawl({}, ["https://host0.example.com/p/0"], max_depth=2, max_pages=5)
    assert r.pages_crawled == 0
    assert [e.action for e in r.events] == ["fetch_failed"]


def test_politeness_budget_defers_not_drops():
    r_unl = crawl(PAGES, SEEDS, max_depth=3, max_pages=10_000)
    r_pol = crawl(PAGES, SEEDS, max_depth=3, max_pages=10_000,
                  politeness={"*": 3})
    # same set of pages eventually fetched, politeness only reorders rounds
    assert set(r_pol.fetch_order) == set(r_unl.fetch_order)
    # budget respected per (host, round)
    per = {}
    for e in r_pol.events:
        if e.action in ("fetched", "fetch_failed"):
            per[(e.host, e.round)] = per.get((e.host, e.round), 0) + 1
    assert max(per.values()) <= 3


def test_robots_denied_pages_never_fetch():
    r = crawl(PAGES, SEEDS, max_depth=3, max_pages=10_000,
              robots={"host0.example.com": [("disallow", "/p/1")]})
    for e in r.events:
        if e.host == "host0.example.com" and e.url.split("/p/")[-1].startswith("1"):
            assert e.action == "robots_denied"


def test_priority_mode_reorders_within_round_only():
    r_f = crawl(PAGES, ["https://medium.com/@user0"], max_depth=3, max_pages=10_000)
    r_p = crawl(PAGES, ["https://medium.com/@user0"], max_depth=3,
                max_pages=10_000, priority=True)
    assert set(r_p.fetch_order) == set(r_f.fetch_order)
    by_round_f = {}
    by_round_p = {}
    for e in r_f.events:
        by_round_f.setdefault(e.round, set()).add(e.url)
    for e in r_p.events:
        by_round_p.setdefault(e.round, set()).add(e.url)
    assert by_round_f == by_round_p  # same rounds, order differs inside
