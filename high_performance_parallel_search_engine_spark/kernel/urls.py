"""URL-domain semantic kernel.

Exact behavioural ports of the reference crawler's URL functions. Citations
point into the read-only reference checkout:

- normalize_url          -> Serial Version/src/crawler.c:515-558
- extract_base_domain    -> Serial Version/src/crawler.c:487-512
- resolve_url            -> Serial Version/src/crawler.c:561-628
                            (process_extracted_url: scheme-junk filter +
                            relative resolution + normalize)
- is_valid_crawl_url     -> Serial Version/src/crawler.c:979-1029
- url_priority           -> OpenMP Version/src/crawler.c:650-731 (classifier
                            only; the OpenMP list-reordering insertion is a
                            variant-only scheduling hack, not ported)

Deliberately preserved quirks (load-bearing for crawl-order parity):

- all substring checks are plain substring tests (C strstr), NOT suffix or
  component matching - e.g. the extension blocklist in is_valid_crawl_url
  rejects ``https://x.com/top.jsons-page`` because ``.json`` occurs anywhere;
- "medium.com" checks look at the WHOLE string (query included), so a
  ``?next=medium.com`` URL takes the medium branch of normalize_url;
- scheme-junk prefixes are case-SENSITIVE (C strncmp), so ``JavaScript:...``
  slips past the junk filter and is then treated as a relative URL;
- extract_base_domain returns scheme+host ("https://example.com"), or the
  whole (truncated) input when no "://" is present.

These functions operate on str; the reference operates on bytes. All parity
corpora are valid UTF-8/ASCII so the two views agree; buffer-size truncations
(512/1024 bytes) are applied at character granularity which is identical for
ASCII URLs.
"""

from __future__ import annotations

MAX_URL_LENGTH = 512  # crawler.c:15

# crawler.c:991-996 - the 27-entry extension blocklist, matched case-
# insensitively ANYWHERE in the URL (strcasestr, crawler.c:999).
BLOCKED_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".ico", ".tiff",
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".zip", ".rar", ".tar", ".gz", ".mp3", ".mp4", ".avi", ".mov",
    ".css", ".js", ".json", ".xml",
)

# crawler.c:573-578 - case-sensitive prefix junk filter.
JUNK_PREFIXES = ("javascript:", "mailto:", "tel:", "data:", "#")


def normalize_url(url: str | None) -> str:
    """Canonical URL form (crawler.c:515-558).

    (a) strip ``#fragment``; (b) medium.com URLs: strip the whole query;
    other URLs: strip the query only when it contains a tracking marker
    (``utm_``, ``fbclid=``, ``gclid=``); (c) strip ONE trailing slash.
    NULL/empty -> "".
    """
    if not url:
        return ""
    # strncpy into a 1024-byte buffer (crawler.c:527) -> truncate.
    u = url[: MAX_URL_LENGTH * 2 - 1]
    frag = u.find("#")
    if frag >= 0:
        u = u[:frag]
    q = u.find("?")
    if q >= 0:
        if "medium.com" in u:  # checked on the full fragment-stripped string
            u = u[:q]
        else:
            query = u[q:]
            if "utm_" in query or "fbclid=" in query or "gclid=" in query:
                u = u[:q]
    if u.endswith("/"):
        u = u[:-1]
    return u


def extract_base_domain(url: str | None) -> str:
    """Scheme+host prefix, e.g. ``https://host.example.com``
    (crawler.c:487-512). No "://" -> the (truncated) input unchanged.
    """
    if not url:
        return ""
    d = url[: MAX_URL_LENGTH - 1]
    p = d.find("://")
    if p < 0:
        return d
    rest = d[p + 3:]
    s = rest.find("/")
    if s < 0:
        return d
    return d[: p + 3 + s]


def url_host(url: str | None) -> str:
    """Bare hostname (no scheme) - our partitioning key; not a reference
    function (the reference keys on extract_base_domain's scheme+host)."""
    base = extract_base_domain(url)
    p = base.find("://")
    return base[p + 3:] if p >= 0 else base


def resolve_url(raw: str | None, base_url: str, base_domain: str) -> str | None:
    """Scheme-junk filter + relative->absolute resolution + normalize
    (process_extracted_url, crawler.c:561-646). Returns the canonical URL or
    None when the candidate is dropped. Domain-scope validity is NOT checked
    here (see `extract_links` / `is_valid_crawl_url`).
    """
    if raw is None:
        return None
    # url_len <= 0 or >= MAX_URL_LENGTH -> dropped (crawler.c:563)
    if len(raw) <= 0 or len(raw) >= MAX_URL_LENGTH:
        return None
    url = raw
    for p in JUNK_PREFIXES:  # case-sensitive strncmp (crawler.c:574-578)
        if url.startswith(p):
            return None
    if not url.startswith("http"):  # strncmp(new_url, "http", 4) - c.c:584
        if url.startswith("/"):
            if url.startswith("//"):
                # protocol-relative (crawler.c:594-605): scheme incl. ':'
                pe = base_url.find("://")
                if pe >= 0:
                    absolute = base_url[: pe + 1] + url[2:]
                else:
                    absolute = "https:" + url
            else:
                absolute = base_domain + url  # crawler.c:608
        else:
            # page-relative (crawler.c:610-624): truncate base after last '/'
            absolute = base_url
            ls = absolute.rfind("/")
            if ls >= 0 and ls != len(absolute) - 1:
                absolute = absolute[: ls + 1]
            elif ls < 0:
                absolute = absolute + "/"
            # base ending in '/' is kept whole (quirk)
            absolute = absolute + url
        url = absolute
    canon = normalize_url(url)
    return canon if canon else None


def extractor_domain_valid(canon_url: str, base_url: str, base_domain: str) -> bool:
    """The in-extractor domain-scope check (crawler.c:665-673): medium pages
    accept any medium.com URL; otherwise require base_domain as a SUBSTRING.
    """
    if "medium.com" in base_url and "medium.com" in canon_url:
        return True
    # C: `base_domain && strstr(final_url, base_domain)` - an EMPTY (non-NULL)
    # base_domain matches everything (strstr(x, "") == x).
    return base_domain is not None and base_domain in canon_url


def is_valid_crawl_url(url: str | None, base_domain: str | None) -> bool:
    """Enqueue/dequeue-time validity (crawler.c:979-1029)."""
    if not url:
        return False
    if not (url.startswith("http://") or url.startswith("https://")):
        return False
    low = url.lower()
    for ext in BLOCKED_EXTENSIONS:  # strcasestr - substring, anywhere
        if ext in low:
            return False
    if "medium.com" in url:
        if ("medium.com/m/signin" in url or "medium.com/m/signout" in url
                or "medium.com/plans" in url or "help.medium.com" in url
                or "policy.medium.com" in url):
            return False
        if ("medium.com/@" in url or "/p/" in url or "/tag/" in url
                or "/topics/" in url or "medium.com/" in url):
            return True
        return False  # unreachable for medium.com URLs with a path, kept for parity
    # C: `base_domain != NULL && strstr(url, base_domain)` - empty base_domain
    # matches every URL (strstr with "" needle).
    if base_domain is not None and base_domain in url:
        return True
    return False


def url_priority(url: str, base_url: str) -> int:
    """Priority classifier 1-5 (OpenMP Version/src/crawler.c:662-691).

    Higher = fetch earlier in priority scheduling mode. The serial reference
    has no priorities; this is the OpenMP variant's classification, used by
    our optional priority queue (north_rule: host-rank + depth + recency).
    """
    pr = 1
    if "medium.com" in base_url:
        if "medium.com" in url:
            if "/tagged/" in url:
                pr = 3
            elif "/@" in url and "/followers" not in url:
                pr = 4
            elif "/p/" in url:
                pr = 5
    else:
        if ("/article/" in url or "/post/" in url or "/blog/" in url
                or "/story/" in url):
            pr = 4
        elif "/category/" in url or "/tag/" in url or "/topics/" in url:
            pr = 3
        elif "/page/" in url or "?page=" in url:
            pr = 2
    return pr


def url_hash_filename(url: str) -> str:
    """The hash fallback of get_url_filename (Serial Version/src/
    crawler.c:84-90): java-style h = 31*h + url[i], unsigned 32-bit,
    rendered as webpage_%u.txt. url[i] is a plain `char` - SIGNED on x86 -
    so bytes >= 0x80 contribute their negative two's-complement value
    (b - 256), not the raw byte; fuzzed byte-exact vs the compiled C."""
    h = 0
    for b in url.encode("utf-8"):
        h = (h * 31 + (b if b < 0x80 else b - 256)) & 0xFFFFFFFF
    return f"webpage_{h}.txt"


def derive_filename(url: str) -> str:
    """S4: get_url_filename (Serial Version/src/crawler.c:58-90).

    Last path segment (text after the LAST '/'), query string stripped;
    kept only when 0 < len < 50 - measured in BYTES (the C strlen), so a
    multi-byte-UTF-8 segment of < 50 characters but >= 50 bytes still falls
    to the hash; fuzzed byte-exact vs the compiled C. Quirks preserved: a
    trailing-slash url, an empty-before-'?' segment, or a >= 50-byte
    segment all fall through to the url-hash name (NOT to each other's
    branches)."""
    b = url.encode("utf-8")
    slash = b.rfind(b"/")
    if slash >= 0 and len(b) - slash > 1:
        seg = b[slash + 1:]
        q = seg.find(b"?")
        if q >= 0:
            if 0 < q < 50:
                return seg[:q].decode("utf-8", errors="replace")
        else:
            if 0 < len(seg) < 50:
                return seg.decode("utf-8", errors="replace")
    return url_hash_filename(url)


def url_diversity(url: str) -> int:
    """Diversity score 0-3 (OpenMP Version/src/crawler.c:694-699): tag/topic/
    category pages score 2, author pages 3, everything else 0. The /tag/
    branch is checked FIRST, so a URL matching both families scores 2."""
    if "/tag/" in url or "/topic/" in url or "/category/" in url:
        return 2
    if "/@" in url or "/author/" in url:
        return 3
    return 0


def openmp_insertion_order(scored: list[tuple[int, int]]) -> list[int]:
    """The OpenMP combined insertion policy (crawler.c:701-731) as a pure
    function: given [(combined_score, discovery_idx)] in discovery order,
    return discovery_idx values in final queue order.

    combined_score = url_priority + url_diversity. score > 3 with a
    non-empty queue inserts at 0 (score >= 7), len/4 (score >= 5) or len/2
    (score 4); everything else appends."""
    queue: list[int] = []
    for score, idx in scored:
        n = len(queue)
        if score > 3 and n > 0:
            if score >= 7:
                pos = 0
            elif score >= 5:
                pos = n // 4
            else:
                pos = n // 2
            queue.insert(pos, idx)   # pos < n always holds here
        else:
            queue.append(idx)
    return queue


def is_html_content_url(url: str) -> bool:
    """URL-extension half of is_html_content (crawler.c:848-858): the
    extension is the substring after the LAST '.', compared case-
    insensitively against 7 asset types. (The content-type half always says
    HTML for our synthetic corpus.)
    """
    dot = url.rfind(".")
    if dot >= 0:
        ext = url[dot:].lower()
        if ext in (".jpg", ".jpeg", ".png", ".gif", ".css", ".js", ".pdf"):
            return False
    return True
