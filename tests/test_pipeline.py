"""Distillation pipeline (operators/pipeline.py): the operator family
composed end-to-end over a planted corpus.

Invariants:
- exact duplicates collapse to the min-id copy,
- a near-duplicate (one word changed) collapses into the original's
  cluster via LSH pairs -> components -> survivors,
- junk (quality gate) and non-English (language gate) docs drop,
- survivors carry the annotation columns and original bodies,
- stage counts are monotone non-increasing and match the survivors,
- disabling stages via DistillConfig re-admits exactly the gated docs.
"""

import pytest

from high_performance_parallel_search_engine_spark.operators.pipeline import (
    DistillConfig, distill_corpus)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the green forest of tall trees where a small river flows "
        "past the old stone bridge and the wind is soft") * 2
NEAR = BASE.replace("stone bridge", "wooden bridge", 1)
SPANISH = ("el rio pasa por los arboles y la montana es alta y el cielo "
           "es azul sobre los campos verdes y la tierra es rica") * 2


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),            # canonical
        (1, BASE),            # exact duplicate of 0 -> dropped
        (2, NEAR),            # near-duplicate of 0 -> dropped
        (3, "the archive holds a million pages of maps and a index of "
            "every road in the country and the record is complete"),
        (4, "!!!! ????"),     # junk -> quality gate
        (5, SPANISH),         # -> language gate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_distill_survivors_and_stages(corpus):
    clean, stages = distill_corpus(corpus, count_stages=True)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {0, 3}
    # annotations present and sane; bodies untouched
    assert rows[0]["text"] == BASE
    assert rows[0]["ws_tokens"] > 50 and rows[0]["bpe_tokens"] > 50
    assert isinstance(rows[3]["fp64"], int)
    assert stages == {"input": 6, "quality": 5, "language": 4,
                      "exact_dedup": 3, "near_dup": 2, "output": 2}


def test_distill_config_gates(corpus):
    # all languages + no quality gate: only dedup applies
    clean, _ = distill_corpus(
        corpus, DistillConfig(langs=None, require_quality=False))
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids == {0, 3, 4, 5}  # 1 exact-dup, 2 near-dup still dropped

    # near-dup off: the one-word variant survives
    clean, _ = distill_corpus(corpus, DistillConfig(near_dup=False))
    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids == {0, 2, 3}


def test_distill_lazy_without_counts(corpus):
    clean, stages = distill_corpus(corpus)  # no count actions requested
    assert stages == {}
    assert clean.count() == 2


def test_distill_custom_id_col(spark):
    docs = spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, NEAR),
         (3, "the small map of a road and the old bridge is here")],
        "page_id long, text string")
    clean, _ = distill_corpus(docs, id_col="page_id")
    assert {r["page_id"] for r in clean.collect()} == {0, 3}


def test_distill_jaccard_verified_edges(corpus):
    """jaccard_verify recomputes exact shingle Jaccard over candidate
    members only; the one-word near-dup clears 0.8, so survivors are
    unchanged - and a sky-high threshold re-admits it."""
    clean, _ = distill_corpus(corpus, DistillConfig(jaccard_verify=0.8))
    assert {r["doc_id"] for r in clean.collect()} == {0, 3}
    clean, _ = distill_corpus(corpus, DistillConfig(jaccard_verify=0.999))
    assert {r["doc_id"] for r in clean.collect()} == {0, 2, 3}
