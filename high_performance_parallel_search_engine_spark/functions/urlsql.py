"""Catalyst-native Column implementations of the URL kernel.

Each builder mirrors a kernel function exactly for the URL population that
can reach it in the pipeline (validated http/https URLs); the kernel pandas
UDFs remain the authoritative oracle and tests assert Column == kernel over
the full synthetic corpus plus adversarial cases. Staying in Column land
keeps the hot path inside whole-stage codegen - no Python boundary at all
for canonicalization/validity/priority at 100 TB scale.

Reference citations as in kernel/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel.urls import BLOCKED_EXTENSIONS


def normalize_url_col(url: Column) -> Column:
    """normalize_url (crawler.c:515-558) as a Column expression."""
    u = F.substring(url, 1, 1023)                      # strncpy truncation
    u = F.substring_index(u, "#", 1)                   # strip fragment
    qpos = F.instr(u, "?")
    query = F.substring(u, qpos, 1 << 30)              # '?...' tail
    strip_q = F.substring(u, 1, qpos - 1)
    u = (
        F.when(qpos == 0, u)
        .when(u.contains("medium.com"), strip_q)
        .when(
            query.contains("utm_") | query.contains("fbclid=")
            | query.contains("gclid="),
            strip_q,
        )
        .otherwise(u)
    )
    u = F.when(u.endswith("/"), u.substr(F.lit(1), F.length(u) - 1)).otherwise(u)
    return F.coalesce(u, F.lit(""))


def base_domain_col(url: Column) -> Column:
    """extract_base_domain (crawler.c:487-512) for http(s) URLs: scheme+host.
    Falls back to the truncated input when no '://' is present."""
    d = F.substring(url, 1, 511)
    has_proto = F.instr(d, "://") > 0
    # first '://' then everything up to the next '/'
    scheme = F.substring(d, 1, F.instr(d, "://") - 1)
    rest = F.substring(d, F.instr(d, "://") + 3, 1 << 30)
    hostpart = F.substring_index(rest, "/", 1)
    return F.coalesce(
        F.when(has_proto, F.concat(scheme, F.lit("://"), hostpart)).otherwise(d),
        F.lit(""),
    )


def host_col(url: Column) -> Column:
    """Bare hostname (partitioning key)."""
    bd = base_domain_col(url)
    return F.when(F.instr(bd, "://") > 0,
                  F.substring(bd, F.instr(bd, "://") + 3, 1 << 30)).otherwise(bd)


def valid_crawl_url_col(url: Column, base_domain: Column) -> Column:
    """is_valid_crawl_url (crawler.c:979-1029). base_domain is the GLOBAL
    per-seed domain column; empty string matches everything (strstr quirk)."""
    low = F.lower(url)
    blocked = F.lit(False)
    for ext in BLOCKED_EXTENSIONS:
        blocked = blocked | low.contains(ext)
    medium = url.contains("medium.com")
    medium_denied = (
        url.contains("medium.com/m/signin") | url.contains("medium.com/m/signout")
        | url.contains("medium.com/plans") | url.contains("help.medium.com")
        | url.contains("policy.medium.com")
    )
    medium_allowed = (
        url.contains("medium.com/@") | url.contains("/p/") | url.contains("/tag/")
        | url.contains("/topics/") | url.contains("medium.com/")
    )
    domain_ok = base_domain.isNotNull() & (
        (base_domain == "") | (F.instr(url, base_domain) > 0)
    )
    return (
        url.isNotNull() & (url != "")
        & (url.startswith("http://") | url.startswith("https://"))
        & ~blocked
        & F.when(medium, ~medium_denied & medium_allowed).otherwise(domain_ok)
    )


def url_diversity_col(url: Column) -> Column:
    """Diversity score 0-3 (OpenMP Version/src/crawler.c:694-699);
    /tag/-family checked first, mirroring kernel.urls.url_diversity."""
    return (F.when(url.contains("/tag/") | url.contains("/topic/")
                   | url.contains("/category/"), F.lit(2))
            .when(url.contains("/@") | url.contains("/author/"), F.lit(3))
            .otherwise(F.lit(0)))


def url_hash_filename_col(url: Column) -> Column:
    """webpage_%u.txt hash fallback (crawler.c:84-90): java-style
    31*h + url[i] over the utf-8 bytes (byte-exact via hex-pair folding),
    unsigned 32. url[i] is a SIGNED char on x86, so bytes >= 0x80 add
    b - 256 (pmod folds the negatives back into unsigned range)."""
    pairs = F.filter(F.split(F.hex(F.encode(url, "utf-8")), r"(?<=\G..)"),
                     lambda x: x != "")

    def _step(acc, x):
        b = F.conv(x, 16, 10).cast("long")
        signed = F.when(b >= 128, b - 256).otherwise(b)
        return F.pmod(acc * 31 + signed, F.lit(4294967296).cast("long"))

    h = F.aggregate(pairs, F.lit(0).cast("long"), _step)
    return F.concat(F.lit("webpage_"), h.cast("string"), F.lit(".txt"))


def derive_filename_col(url: Column) -> Column:
    """S4 get_url_filename (crawler.c:58-90) as a pure Column: last path
    segment, query stripped, kept only when 0 < len < 50; else the url-hash
    name. Mirrors kernel.urls.derive_filename exactly (incl. the quirk that
    an empty or >=50-char pre-'?' prefix falls to the hash, not to the
    plain-segment branch)."""
    seg = F.regexp_extract(url, r"/([^/]*)$", 1)
    has_tail = url.contains("/") & (F.length(seg) > 0)
    q = F.instr(seg, "?")
    pre = seg.substr(F.lit(1), q - 1)
    # the C's 0 < len < 50 gates count BYTES (strlen), not characters
    keep_q = has_tail & (q > 1) & (F.octet_length(pre) < 50)
    keep_plain = has_tail & (q == 0) & (F.octet_length(seg) < 50)
    return (F.when(keep_q, pre)
            .when(keep_plain, seg)
            .otherwise(url_hash_filename_col(url)))


def is_html_content_url_col(url: Column) -> Column:
    """URL-extension half of is_html_content (crawler.c:848-858): last-dot
    suffix check against 7 asset types."""
    ext = F.lower(F.regexp_extract(url, r"(\.[^./]*)$", 1))
    return ~ext.isin(".jpg", ".jpeg", ".png", ".gif", ".css", ".js", ".pdf")


def url_priority_col(url: Column, base_url: Column) -> Column:
    """url_priority classifier (OpenMP Version/src/crawler.c:662-691)."""
    medium_base = base_url.contains("medium.com")
    medium_pr = (
        F.when(~url.contains("medium.com"), F.lit(1))
        .when(url.contains("/tagged/"), F.lit(3))
        .when(url.contains("/@") & ~url.contains("/followers"), F.lit(4))
        .when(url.contains("/p/"), F.lit(5))
        .otherwise(F.lit(1))
    )
    other_pr = (
        F.when(url.contains("/article/") | url.contains("/post/")
               | url.contains("/blog/") | url.contains("/story/"), F.lit(4))
        .when(url.contains("/category/") | url.contains("/tag/")
              | url.contains("/topics/"), F.lit(3))
        .when(url.contains("/page/") | url.contains("?page="), F.lit(2))
        .otherwise(F.lit(1))
    )
    return F.when(medium_base, medium_pr).otherwise(other_pr)
