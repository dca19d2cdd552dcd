"""Hypothesis property tests: the Catalyst Column builders and the pure
Python kernel must agree on GENERATED inputs, not just the curated corpus +
adversarial lists (test_column_builders.py). Strategy mixes url-ish
structure with raw junk so both the happy paths and the parser quirks get
hit. One Spark round-trip per test (all examples batched into one
DataFrame) keeps wall time sane."""

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from high_performance_parallel_search_engine_spark.functions.urlsql import (
    base_domain_col,
    derive_filename_col,
    normalize_url_col,
    url_diversity_col,
    url_priority_col,
    valid_crawl_url_col,
)
from high_performance_parallel_search_engine_spark.kernel.urls import (
    derive_filename,
    extract_base_domain,
    is_valid_crawl_url,
    normalize_url,
    url_diversity,
    url_priority,
)

_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789.-_~%?#&=@/ ",
    min_size=0, max_size=24)
_scheme = st.sampled_from(["https://", "http://", "ftp://", "", "//"])
_host = st.sampled_from([
    "example.com", "medium.com", "sub.medium.com", "a.co", "x",
    "host0.example.com", "EXAMPLE.com", ""])
_urlish = st.builds(lambda s, h, p: s + h + p, _scheme, _host, _seg)
_junk = st.text(min_size=0, max_size=40)
URLS = st.lists(st.one_of(_urlish, _junk), min_size=1, max_size=120)


def _collect(spark, urls, col_expr, extra=None):
    pdf = pd.DataFrame({"url": urls,
                        "bd": [extra or "" for _ in urls]})
    df = spark.createDataFrame(pdf)
    return [r["v"] for r in
            df.select(col_expr.alias("v")).collect()]


@settings(max_examples=8, deadline=None)
@given(urls=URLS)
def test_normalize_and_base_domain_property(spark, urls):
    got_norm = _collect(spark, urls, normalize_url_col(F.col("url")))
    got_base = _collect(spark, urls, base_domain_col(F.col("url")))
    for u, gn, gb in zip(urls, got_norm, got_base):
        assert gn == normalize_url(u), repr(u)
        assert gb == extract_base_domain(u), repr(u)


@settings(max_examples=8, deadline=None)
@given(urls=URLS, bd=st.sampled_from(
    ["https://example.com", "medium.com", "", "x"]))
def test_validity_property(spark, urls, bd):
    got = _collect(spark, urls,
                   valid_crawl_url_col(F.col("url"), F.col("bd")), extra=bd)
    for u, g in zip(urls, got):
        assert bool(g) == is_valid_crawl_url(u, bd), repr((u, bd))


@settings(max_examples=8, deadline=None)
@given(urls=URLS)
def test_priority_diversity_filename_property(spark, urls):
    got_pr = _collect(spark, urls, url_priority_col(F.col("url"),
                                                    F.col("url")))
    got_dv = _collect(spark, urls, url_diversity_col(F.col("url")))
    got_fn = _collect(spark, urls, derive_filename_col(F.col("url")))
    for u, gp, gd, gf in zip(urls, got_pr, got_dv, got_fn):
        assert gp == url_priority(u, u), repr(u)
        assert gd == url_diversity(u), repr(u)
        assert gf == derive_filename(u), repr(u)
