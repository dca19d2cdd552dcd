"""Positional postings + phrase search (operators/phrase.py).

Invariants:
- the positional table is a strict superset of build_postings: dropping
  positions reproduces (term, doc_id, tf) exactly,
- phrase_match agrees with an independent pure-Python oracle over the
  same kept-token stream (adjacency in the filtered stream, occurrence
  counts included, overlapping occurrences, repeated-term phrases),
- rank_bm25_phrase scores only phrase-matching docs with the ranking.py
  BM25 (k1/b/idf) and deterministic ordering,
- stopword-only phrases are rejected.
"""

import pytest

from high_performance_parallel_search_engine_spark.kernel.text import tokenize
from high_performance_parallel_search_engine_spark.operators.index import (
    build_index_tables, build_postings)
from high_performance_parallel_search_engine_spark.operators.phrase import (
    build_positional_postings, phrase_match, phrase_terms, rank_bm25_phrase)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and another quick brown fox appear"),
    (2, "brown quick fox is not the phrase order"),
    (3, "quick brown cat then quick brown fox at the end"),
    (4, "totally unrelated words here"),
    (5, "fox fox fox fox"),                     # repeated-term phrases
    (6, "quick brown"),                          # prefix only, no fox
]


def _oracle_phrase(docs, phrase):
    """Occurrences of the phrase's kept-token sequence in each doc's
    kept-token stream - the independent reference implementation."""
    want = tokenize(phrase)
    out = {}
    for did, text in docs:
        toks = tokenize(text)
        n = sum(1 for i in range(len(toks) - len(want) + 1)
                if toks[i:i + len(want)] == want)
        if n:
            out[did] = n
    return out


@pytest.fixture(scope="module")
def pos_index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pos = build_positional_postings(docs).cache()
    pos.count()
    return docs, pos


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_positional_projects_to_bag_of_words(spark, pos_index):
    docs, pos = pos_index
    assert _rows(pos.select("term", "doc_id", "tf")) == \
        _rows(build_postings(docs))


@pytest.mark.parametrize("phrase", [
    "quick brown fox",       # multi-occurrence in doc 1
    "brown fox",
    "fox fox",               # overlapping repeated term: 3 in doc 5
    "the lazy dog",          # stopword-filtered adjacency
    "quick brown cat",
    "no such phrase here at all",
])
def test_phrase_match_agrees_with_oracle(spark, pos_index, phrase):
    _, pos = pos_index
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_match(pos, phrase).collect()}
    assert got == _oracle_phrase(DOCS, phrase)


def test_phrase_rejects_stopword_only(pos_index):
    _, pos = pos_index
    assert phrase_terms("the of a") == []
    with pytest.raises(ValueError):
        phrase_match(pos, "the of a")


def test_rank_bm25_phrase_scores_only_matches(spark, pos_index):
    docs, pos = pos_index
    _, stats = build_index_tables(docs)
    top = rank_bm25_phrase(pos, stats, "quick brown fox", top_k=10)
    rows = top.collect()
    match_ids = set(_oracle_phrase(DOCS, "quick brown fox"))
    assert {r["doc_id"] for r in rows} == match_ids
    # doc 1 has the phrase twice and higher tf on every term: top rank
    assert rows[0]["doc_id"] == 1 and rows[0]["n_occurrences"] == 2
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in rows)


def test_phrase_term_filters_reach_parquet_scan(spark, tmp_path):
    """Each phrase term's scan pushes its EqualTo(term) into parquet -
    the phrase join never reads the whole positional index."""
    from high_performance_parallel_search_engine_spark.plans.lineage import (
        explain_text)

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = str(tmp_path / "pos")
    build_positional_postings(docs).write.parquet(p)
    pos = spark.read.parquet(p)
    plan = explain_text(phrase_match(pos, "quick brown fox"), "formatted")
    assert "PushedFilters" in plan
    assert plan.count("EqualTo(term,") >= 3  # one pruned scan per term


def test_rank_bm25_phrase_uses_corpus_df_for_idf(spark):
    """df must be CORPUS document frequency, not frequency within the
    phrase matches (where every doc has every term and idf collapses to
    a constant): the doc loaded with the RARE term must outrank the doc
    loaded with the common one."""
    filler = [(100 + i, "alpha filler words here") for i in range(20)]
    docs = spark.createDataFrame(
        [(1, "alpha beta " + "alpha " * 20),   # common-term heavy
         (2, "alpha beta " + "beta " * 20)]    # rare-term heavy
        + filler, "doc_id long, text string")
    pos = build_positional_postings(docs)
    _, stats = build_index_tables(docs)
    top = rank_bm25_phrase(pos, stats, "alpha beta", top_k=2).collect()
    assert [r["doc_id"] for r in top] == [2, 1]
    assert top[0]["score"] > top[1]["score"]  # strictly, not a tie-break


def test_phrase_over_bucketed_positional_store(spark, tmp_path):
    """The positional index stored via the generic bucketed-table core:
    phrase queries prune to their terms' buckets (SelectedBucketsCount)
    and match identically to the plain in-memory index - the 100 TB
    phrase-read story, same shape as BM25's candidate-term pruning."""
    from high_performance_parallel_search_engine_spark.operators.index_store import (
        register_postings_store, save_bucketed_table, selected_buckets)

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pos = build_positional_postings(docs)
    path = str(tmp_path / "pos_store")
    save_bucketed_table(pos, path, table="t_pos_store", buckets=16)

    # a fresh catalog re-attaches via the sidecar DDL (incl. the
    # array<int> positions column) and prunes
    spark.sql("DROP TABLE t_pos_store")
    tbl = register_postings_store(spark, path)
    assert dict(tbl.dtypes)["positions"] == "array<int>"
    matched = phrase_match(tbl, "quick brown fox")
    sel = selected_buckets(matched)
    assert sel is not None and sel[0] < sel[1] == 16
    got = {r["doc_id"]: r["n_occurrences"] for r in matched.collect()}
    assert got == _oracle_phrase(DOCS, "quick brown fox")


def test_rarity_order_sorts_by_df_then_position():
    from high_performance_parallel_search_engine_spark.operators.phrase import (
        _rarity_order)

    terms = ["quick", "brown", "fox"]
    assert _rarity_order(terms, {"quick": 5, "brown": 3, "fox": 1}) == [2, 1, 0]
    # ties break by phrase position; missing stats keep phrase order
    assert _rarity_order(terms, {"quick": 2, "brown": 2, "fox": 9}) == [0, 1, 2]
    assert _rarity_order(terms, None) == [0, 1, 2]
    assert _rarity_order(terms, {}) == [0, 1, 2]


def test_phrase_match_rarity_order_identical_and_rarest_first(spark, pos_index):
    docs, pos = pos_index
    # 'fox' is the rarest in df terms? compute real dfs from the index
    dfs = {r["term"]: r["df"] for r in
           pos.groupBy("term").count().withColumnRenamed("count", "df")
           .collect()}
    phrase = "quick brown fox"
    base = _rows(phrase_match(pos, phrase))
    ordered = phrase_match(pos, phrase, term_dfs=dfs)
    assert _rows(ordered) == base  # inner joins + set intersect commute
    # the join tree's driving (leftmost) side must filter on the rarest term
    terms = phrase_terms(phrase)
    rarest = min(terms, key=lambda t: (dfs.get(t, 0), terms.index(t)))
    # depth-first plan printing reaches the left-deep join tree's driving
    # leaf first, so the FIRST term filter line is the side that drives
    plan = ordered._jdf.queryExecution().analyzed().toString()
    first_filter = plan[plan.index("Filter (term#"):]
    assert rarest in first_filter.split("\n")[0]


def test_rank_bm25_phrase_unchanged_by_join_reorder(spark, pos_index):
    docs, pos = pos_index
    from high_performance_parallel_search_engine_spark.operators.index import (
        build_doc_stats)
    stats = build_doc_stats(docs)
    out = rank_bm25_phrase(pos, stats, "quick brown fox", top_k=10)
    rows = _rows(out)
    assert rows  # docs 0,1,3 match
    assert {r[0] for r in rows} == {0, 1, 3}
