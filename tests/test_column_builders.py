"""Catalyst Column builders == Python kernel, over the corpus + adversarial
URLs. This pins the fast path (codegen) to the exact semantics."""

import pandas as pd
from pyspark.sql import functions as F

from high_performance_parallel_search_engine_spark.functions.urlsql import (
    base_domain_col,
    host_col,
    is_html_content_url_col,
    normalize_url_col,
    url_priority_col,
    valid_crawl_url_col,
)
from high_performance_parallel_search_engine_spark.kernel.urls import (
    extract_base_domain,
    is_html_content_url,
    is_valid_crawl_url,
    normalize_url,
    url_host,
    url_priority,
)
from high_performance_parallel_search_engine_spark.kernel.html import extract_links
from high_performance_parallel_search_engine_spark.sources.synth import corpus_rows

ADVERSARIAL = [
    "https://medium.com/@u?anything=1", "https://medium.com/@u/",
    "https://medium.com/@u#content", "https://x.com/a?keep=1",
    "https://x.com/a?utm_source=1", "https://x.com/a?fbclid=2&b=3",
    "https://x.com/a?gclid=z", "https://x.com/top.jsons-page",
    "https://medium.com", "https://medium.com/m/signin?operation=register",
    "https://help.medium.com/hc", "http://plain.com", "ftp://nope.com/x",
    "https://a.com/file.PDF", "https://a.com/x.Mp3", "no-scheme", "",
    "https://h.com/x/", "https://h.com/x//", "https://h.com/#/",
    "https://h.com/?utm_x=1", "https://HOST.COM/UP.JPG",
    "https://h.com/a?next=medium.com/x",
]


def _all_urls():
    urls = list(ADVERSARIAL)
    for r in corpus_rows():
        urls.append(r["url"])
        urls.extend(extract_links(r["html"], r["url"])[:5])
    return sorted(set(urls))


def test_column_builders_match_kernel(spark):
    urls = _all_urls()
    bds = ["https://host0.example.com", "medium.com", ""]
    pdf = pd.DataFrame([(u, bd) for u in urls for bd in bds],
                       columns=["url", "bd"])
    df = spark.createDataFrame(pdf)
    out = df.select(
        "url", "bd",
        normalize_url_col(F.col("url")).alias("norm"),
        base_domain_col(F.col("url")).alias("base"),
        host_col(F.col("url")).alias("host"),
        valid_crawl_url_col(F.col("url"), F.col("bd")).alias("valid"),
        is_html_content_url_col(F.col("url")).alias("htmlish"),
        url_priority_col(F.col("url"), F.lit("https://host0.example.com/p/1")).alias("pr"),
        url_priority_col(F.col("url"), F.lit("https://medium.com/@u")).alias("pr_m"),
    ).toPandas()
    for row in out.itertuples():
        assert row.norm == normalize_url(row.url), row.url
        assert row.base == extract_base_domain(row.url), row.url
        assert row.host == url_host(row.url), row.url
        assert row.valid == is_valid_crawl_url(row.url, row.bd), (row.url, row.bd)
        assert row.htmlish == is_html_content_url(row.url), row.url
        assert row.pr == url_priority(row.url, "https://host0.example.com/p/1"), row.url
        assert row.pr_m == url_priority(row.url, "https://medium.com/@u"), row.url


def test_extract_udf_matches_kernel(spark):
    from high_performance_parallel_search_engine_spark.functions.udfs import (
        html_text_and_links,
    )
    from high_performance_parallel_search_engine_spark.kernel.html import html_to_text

    rows = list(corpus_rows(n_hosts=2, pages_per_host=8, n_medium=4))
    pdf = pd.DataFrame([(r["url"], r["html"]) for r in rows],
                       columns=["url", "html"])
    df = spark.createDataFrame(pdf)
    out = {r["url"]: r for r in
           html_text_and_links(df).toPandas().to_dict("records")}
    for r in rows:
        got = out[r["url"]]
        assert got["text"] == html_to_text(r["html"]).decode("utf-8")
        assert list(got["links"]) == extract_links(r["html"], r["url"])


def test_derive_filename_kernel_quirks():
    """S4 get_url_filename (crawler.c:58-90) edge semantics."""
    from high_performance_parallel_search_engine_spark.kernel.urls import (
        derive_filename,
        url_hash_filename,
    )

    assert derive_filename("https://a.com/path/page.html") == "page.html"
    assert derive_filename("https://a.com/p?x=1") == "p"
    # trailing slash, empty-before-?, >=50-char segment -> hash fallback
    assert derive_filename("https://a.com/x/").startswith("webpage_")
    assert derive_filename("https://a.com/?x=1").startswith("webpage_")
    long_seg = "https://a.com/" + "s" * 50
    assert derive_filename(long_seg).startswith("webpage_")
    assert derive_filename("https://a.com/" + "s" * 49) == "s" * 49
    # the pre-'?' length check is its own gate: 50+ chars before ? -> hash
    assert derive_filename(
        "https://a.com/" + "s" * 50 + "?x").startswith("webpage_")
    # java-style unsigned 32-bit byte hash
    assert url_hash_filename("") == "webpage_0.txt"
    h = 0
    for b in b"ab":
        h = (h * 31 + b) & 0xFFFFFFFF
    assert url_hash_filename("ab") == f"webpage_{h}.txt"


def test_medium_filename_kernel():
    from high_performance_parallel_search_engine_spark.kernel.html import (
        derive_medium_filename,
    )

    html = b"<html><title>My Great Post! (2024)</title></html>"
    # '!','(',')' dropped; spaces -> '_'; lowered
    assert derive_medium_filename("https://x.com/a", html) == \
        "medium_my_great_post_2024.txt"
    # no title -> profile username (cut at / ? but NOT #)
    assert derive_medium_filename("https://medium.com/@usr/p?q", b"") == \
        "medium_profile_usr.txt"
    assert derive_medium_filename("https://medium.com/@u#f", b"") == \
        "medium_profile_u#f.txt"
    # no title, no profile -> url filename
    assert derive_medium_filename("https://a.com/page", b"") == "page"
