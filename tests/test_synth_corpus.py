"""Synthetic corpus generator properties."""

from high_performance_parallel_search_engine_spark.kernel.html import html_to_text
from high_performance_parallel_search_engine_spark.kernel.urls import normalize_url
from high_performance_parallel_search_engine_spark.sources.synth import (
    corpus_rows,
    page_record,
)


def test_deterministic_across_calls():
    a = list(corpus_rows())
    b = list(corpus_rows())
    assert a == b


def test_page_record_is_pure():
    kw = dict(n_hosts=3, pages_per_host=25, n_medium=12, seed=42)
    r1 = page_record("host", 1, 7, **kw)
    r2 = page_record("host", 1, 7, **kw)
    assert r1 == r2
    r3 = page_record("host", 1, 7, n_hosts=3, pages_per_host=25, n_medium=12,
                     seed=43)
    assert r3["html"] != r1["html"]


def test_urls_are_canonical():
    for r in corpus_rows():
        assert normalize_url(r["url"]) == r["url"]


def test_text_is_oracle_extraction_and_utf8_roundtrips():
    for r in corpus_rows():
        extracted = html_to_text(r["html"])
        assert extracted.decode("utf-8") == r["text"]
        assert r["text"].encode("utf-8") == extracted  # byte-identity holds


def test_corpus_has_failure_pages():
    tiny = [r for r in corpus_rows() if len(r["html"]) <= 100]
    assert tiny, "need <=100-byte pages to exercise the fetch-failure path"
