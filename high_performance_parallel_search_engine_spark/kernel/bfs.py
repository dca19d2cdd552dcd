"""Serial crawl oracle - the executable spec for crawl-order parity.

A straight-line Python re-implementation of the Serial reference loop
(`crawl_website`, Serial Version/src/crawler.c:1032-1403):

- FIFO dequeue of (url, depth); seed normalized + marked visited upfront
  (crawler.c:1046-1063); global base_domain from the UN-normalized seed
  (crawler.c:1068);
- dequeue-time is_valid_crawl_url gate (crawler.c:1082) - drops without a
  fetch, a delay, or a failure count;
- fetch success = page exists AND len(html) > 100 (crawler.c:1115) AND the
  URL-extension content gate passes (is_html_content, crawler.c:848-858 via
  download_url:936); failure increments a CONSECUTIVE counter, success
  resets it; 10 consecutive failures stop the crawl (crawler.c:1075);
- pages_crawled counts successes only, max_pages checked at dequeue;
- children extracted only when current_depth < max_depth (crawler.c:1289),
  filtered by is_valid_crawl_url against the GLOBAL base_domain
  (crawler.c:1305), dropped if already visited, enqueued with
  depth = parent+1, AT MOST 20 per page (added_urls < 20, crawler.c:1299),
  each marked visited at enqueue (crawler.c:1335).

The round structure is our engine's (the serial loop has none): round r
processes frontier list F_r in order; with no politeness budget F_r is
exactly the depth-(r+1) FIFO segment, so the event order equals the serial
C trace. Engine extensions (OURS, defined here as the spec, defaults off):

- politeness budgets: per (host, round) at most `budget` fetch attempts;
  further URLs of that host are DEFERRED to the front of F_{r+1} in order;
- robots rules: per-host allow/disallow path prefixes, longest prefix wins,
  tie -> disallow, no match -> allow; applied at the dequeue gate (a robots
  denial behaves like an invalid URL: dropped silently, logged as an event);
- priority ordering: children of round r are ordered by (priority desc,
  discovery order) instead of pure discovery order (OpenMP
  Version/src/crawler.c:650-731 classifier; north_rule's priority queue).

Simulated politeness delay (the reference sleeps rand()%300+200 ms,
crawler.c:1380): we ACCOUNT delay_ms = crc32(url) % 300 + 200 per attempt -
deterministic and reproducible in Spark via F.crc32.
"""

from __future__ import annotations

import zlib
from collections import deque
from dataclasses import dataclass, field

from .html import extract_links
from .urls import (
    extract_base_domain,
    is_html_content_url,
    is_valid_crawl_url,
    normalize_url,
    openmp_insertion_order,
    url_diversity,
    url_host,
    url_priority,
)

MAX_LINKS_PER_PAGE = 20  # crawler.c:1299
FAILURE_STOP = 10        # crawler.c:1075
DEFAULT_MAX_DEPTH = 2    # main.c default
DEFAULT_MAX_PAGES = 10


def politeness_delay_ms(url: str) -> int:
    """Deterministic stand-in for usleep((rand()%300+200)*1000)."""
    return zlib.crc32(url.encode("utf-8")) % 300 + 200


def robots_allowed(url: str, robots: dict[str, list[tuple[str, str]]] | None) -> bool:
    """Longest-matching path-prefix rule wins; tie -> disallow; no rule ->
    allow. `robots` maps host -> [(rule, path_prefix)]."""
    if not robots:
        return True
    host = url_host(url)
    rules = robots.get(host)
    if not rules:
        return True
    base = extract_base_domain(url)
    path = url[len(base):] or "/"
    best_len = -1
    best_allow = True
    for rule, prefix in rules:
        if path.startswith(prefix) and len(prefix) >= best_len:
            allow = rule == "allow"
            if len(prefix) > best_len:
                best_len = len(prefix)
                best_allow = allow
            else:  # tie -> disallow wins
                best_allow = best_allow and allow
    return best_allow


@dataclass
class CrawlEvent:
    seq: int
    round: int
    url: str
    parent_url: str | None
    depth: int
    host: str
    action: str  # 'fetched' | 'fetch_failed' | 'deferred' | 'robots_denied'
    delay_ms: int


@dataclass
class CrawlResult:
    events: list[CrawlEvent] = field(default_factory=list)
    url_seen_rounds: list[set[str]] = field(default_factory=list)  # cumulative per round
    pages_crawled: int = 0
    stopped_reason: str = "frontier_empty"

    @property
    def fetch_order(self) -> list[str]:
        return [e.url for e in self.events if e.action == "fetched"]


def crawl(pages: dict[str, bytes], seeds: list[str],
          max_depth: int = DEFAULT_MAX_DEPTH, max_pages: int = DEFAULT_MAX_PAGES,
          politeness: dict[str, int] | None = None,
          robots: dict[str, list[tuple[str, str]]] | None = None,
          priority: bool = False,
          failure_stop: int = FAILURE_STOP,
          max_links_per_page: int = MAX_LINKS_PER_PAGE) -> CrawlResult:
    """Run the oracle crawl over an in-memory pages map (url -> html bytes)."""
    res = CrawlResult()
    visited: set[str] = set()
    # frontier item: (url, depth, parent_url, base_domain_of_its_seed)
    frontier: deque = deque()
    for seed in seeds:
        ns = normalize_url(seed)
        if not ns or ns in visited:
            continue
        base_domain = extract_base_domain(seed)  # from the raw seed (c.c:1068)
        frontier.append((ns, 1, None, base_domain))
        visited.add(ns)

    pages_crawled = 0
    failed = 0
    seq = 0
    rnd = 0
    stopped = None

    while frontier:
        next_frontier: deque = deque()
        host_fetches: dict[str, int] = {}
        children: list[tuple[str, int, str, str, int]] = []  # +priority
        while frontier:
            if pages_crawled >= max_pages:
                stopped = "max_pages"
                break
            if failed >= failure_stop:
                stopped = "failure_stop"
                break
            url, depth, parent, base_domain = frontier.popleft()
            if not is_valid_crawl_url(url, base_domain):
                continue  # silent skip (crawler.c:1082-1086)
            if not robots_allowed(url, robots):
                res.events.append(CrawlEvent(seq, rnd, url, parent, depth,
                                             url_host(url), "robots_denied", 0))
                seq += 1
                continue
            host = url_host(url)
            if politeness is not None:
                budget = politeness.get(host, politeness.get("*", 1 << 30))
                if host_fetches.get(host, 0) >= budget:
                    res.events.append(CrawlEvent(seq, rnd, url, parent, depth,
                                                 host, "deferred", 0))
                    seq += 1
                    next_frontier.append((url, depth, parent, base_domain))
                    continue
                host_fetches[host] = host_fetches.get(host, 0) + 1
            html = pages.get(url)
            ok = html is not None and len(html) > 100 and is_html_content_url(url)
            res.events.append(CrawlEvent(
                seq, rnd, url, parent, depth, host,
                "fetched" if ok else "fetch_failed", politeness_delay_ms(url)))
            seq += 1
            if not ok:
                failed += 1
                continue
            pages_crawled += 1
            failed = 0
            if depth < max_depth:
                added = 0
                for li, link in enumerate(extract_links(html, url)):
                    if added >= max_links_per_page:
                        break
                    if not is_valid_crawl_url(link, base_domain):
                        continue
                    if link in visited:
                        continue
                    visited.add(link)
                    children.append((link, depth + 1, url, base_domain,
                                     url_priority(link, url)))
                    added += 1
        if stopped:
            res.stopped_reason = stopped
            res.url_seen_rounds.append(set(visited))
            break
        if priority == "openmp":
            # OpenMP combined insertion policy (crawler.c:693-731): each
            # child inserts into the queue at 0 / len/4 / len/2 when
            # priority + diversity > 3, else appends - applied per round
            # over children in discovery order (the round adaptation of the
            # reference's shared pending-url array).
            scored = [(c[4] + url_diversity(c[0]), i)
                      for i, c in enumerate(children)]
            children = [children[i] for i in openmp_insertion_order(scored)]
        elif priority:
            # north_rule priority queue: classifier desc, host in-degree
            # (among this round's enqueued children) desc, then discovery
            # order (recency tie-break). Stable sort keeps determinism.
            host_deg: dict[str, int] = {}
            for link, *_ in children:
                h = url_host(link)
                host_deg[h] = host_deg.get(h, 0) + 1
            children.sort(key=lambda c: (-c[4], -host_deg[url_host(c[0])]))
        for link, d, parent, base_domain, _pr in children:
            next_frontier.append((link, d, parent, base_domain))
        res.url_seen_rounds.append(set(visited))
        frontier = next_frontier
        rnd += 1

    res.pages_crawled = pages_crawled
    if stopped:
        res.stopped_reason = stopped
    return res
