"""Training-data distillation: the operator family composed end-to-end.

The reference stops at "crawl -> index -> rank"; a pretraining corpus at
100 TB goes through a standard cleaning sequence before any of that, and
every step of it already exists in this repo as a tested operator. This
module is the composition:

  1. quality gate     quality_score(...).quality == 1     (pure Columns)
  2. language filter  lang_id(...).lang_pred in langs      (pure Columns)
  3. exact dedup      exact_dedup: md5-groupBy, min-id survivor per digest
  4. near-dup dedup   minhash_lsh_pairs -> connected_components ->
                      dedup_survivors (banded LSH, never all-pairs;
                      min-label fixpoint; id-only survivor join)
  5. annotate         token_counts + fingerprint on the survivors

Scale shape: every filter stage reduces to an ID KEEP-LIST joined back to
the corpus on doc_id - document bodies cross the wire once per stage at
most, and never through a groupBy key (exact dedup shuffles 16-byte
digests, near-dup shuffles banded bucket keys, survivor joins are
id-only). Stage ordering is deliberate: the cheap Column gates (1-2) cut
the corpus before the shuffle-bearing dedups (3-4), and exact dedup runs
before LSH so a 10^5-copy boilerplate cluster collapses in ONE agg
instead of flooding an LSH bucket.

Driven by tools/distill_corpus.py; invariants in tests/test_pipeline.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (LSH_BANDS, NUM_PERM, connected_components, dedup_survivors,
                    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs)
from .textstats import fingerprint, lang_id, quality_score, token_counts


@dataclass(frozen=True)
class DistillConfig:
    langs: tuple[str, ...] | None = ("en",)   # None = keep all languages
    require_quality: bool = True
    exact: bool = True
    near_dup: bool = True
    num_perm: int = NUM_PERM
    bands: int = LSH_BANDS
    # LSH emits CANDIDATE pairs (any shared band bucket) - a Jaccard-0.4
    # pair still collides in >=1 of 4 bands with ~23% probability.
    # min_bands >= 2 demands band agreement (steep precision gain);
    # jaccard_verify additionally recomputes EXACT shingle Jaccard over
    # the candidate-pair members only (a slim subset, never the corpus)
    # and keeps edges at/above the threshold
    min_bands: int = 2
    jaccard_verify: float | None = None


def distill_corpus(docs: DataFrame, config: DistillConfig = DistillConfig(),
                   id_col: str = "doc_id", text_col: str = "text",
                   count_stages: bool = False
                   ) -> tuple[DataFrame, dict[str, int]]:
    """(clean annotated corpus, per-stage row counts). The returned frame
    is the surviving docs with ws_tokens/bpe_tokens/fp64 columns added.
    count_stages=True runs one count() action per stage boundary for the
    report; leave False inside larger jobs to keep the plan lazy."""
    stages: dict[str, int] = {}
    cur = docs

    def note(name: str) -> None:
        # checkpoint at each counted boundary: without it every count()
        # (and the caller's final write) re-runs all prior stages - O(N
        # stages) corpus passes instead of one
        nonlocal cur
        if count_stages:
            cur = cur.localCheckpoint()
            stages[name] = cur.count()

    note("input")
    if config.require_quality:
        keep = (quality_score(cur, id_col, text_col)
                .where(F.col("quality") == 1)
                .select(F.col("doc_id").alias(id_col)))
        cur = cur.join(keep, id_col)
        note("quality")
    if config.langs is not None:
        keep = (lang_id(cur, id_col, text_col)
                .where(F.col("lang_pred").isin(*config.langs))
                .select(F.col("doc_id").alias(id_col)))
        cur = cur.join(keep, id_col)
        note("language")
    if config.exact:
        keep = (exact_dedup(cur, id_col, text_col)
                .select(F.col("doc_id").alias(id_col)))
        cur = cur.join(keep, id_col)
        note("exact_dedup")
    if config.near_dup:
        pairs = minhash_lsh_pairs(cur, id_col, text_col,
                                  num_perm=config.num_perm,
                                  bands=config.bands)
        if config.min_bands > 1:
            pairs = pairs.where(F.col("n_bands") >= config.min_bands)
        if config.jaccard_verify is not None:
            members = (pairs.select(F.col("doc_a").alias(id_col))
                       .union(pairs.select(F.col("doc_b").alias(id_col)))
                       .distinct())
            verified = ngram_jaccard_pairs(
                cur.join(members, id_col), id_col, text_col,
                threshold=config.jaccard_verify)
            pairs = pairs.join(verified.select("doc_a", "doc_b"),
                               ["doc_a", "doc_b"], "left_semi")
        comps = connected_components(
            pairs, cur.select(F.col(id_col).alias("doc_id")))
        cur = dedup_survivors(cur,
                              comps.withColumnRenamed("doc_id", id_col),
                              id_col)
        note("near_dup")
    ann = (token_counts(cur, id_col, text_col)
           .join(fingerprint(cur, id_col, text_col), "doc_id")
           .withColumnRenamed("doc_id", id_col))
    cur = cur.join(ann, id_col)
    note("output")
    return cur, stages
