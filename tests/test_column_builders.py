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
