"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting. All pure-Column (codegen)
with exact DuckDB oracles; the quality heuristic generalizes the reference's
is_useful_content gate (Serial Version/src/crawler.c:110-131).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import phash_col, tokens_simple_col

# tiny deterministic marker profiles (n-gram-heuristic language ID). The
# synthetic documents are word-soup, so this demonstrates the OPERATOR, not
# linguistics: scores are marker-token counts per language.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

# BPE-ish token pieces: letter runs, single digits, single punct marks.
# Plain character classes -> same semantics in Java regex (Spark) and RE2-
# style (DuckDB).
BPE_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax marker-count language with
    deterministic tie-break (higher count wins; ties -> lexicographic lang;
    zero markers -> 'und')."""
    toks = tokens_simple_col(F.lower(F.col(text_col)))

    def marker_count(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_count(markers)
              for lang, markers in LANG_MARKERS.items()}
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    return docs.select(F.col(id_col).alias("doc_id"),
                       pred.alias("lang_pred"),
                       best_score.cast("int").alias("lang_score"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  stopwords=("the", "a", "an", "in", "of")) -> DataFrame:
    """(doc_id, n_chars, n_tokens, alpha_ratio, space_ratio, stopword_ratio,
    quality): ratio heuristics in the style of is_useful_content
    (crawler.c:110-131) extended with a stopword ratio; quality is the
    conjunctive gate as 0/1."""
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    space = F.length(F.regexp_replace(t, "[^ \\t\\n\\r]", ""))
    toks = tokens_simple_col(F.lower(t))
    n_tokens = F.size(toks)
    stops = F.size(F.filter(toks, lambda x: x.isin(*stopwords)))
    alpha_ratio = F.round(alpha / F.greatest(n_chars, F.lit(1)), 6)
    space_ratio = F.round(space / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stops / F.greatest(n_tokens, F.lit(1)), 6)
    quality = ((n_chars >= 10) & (alpha_ratio > 0.4)
               & (space_ratio > 0.05) & (space_ratio < 0.3)).cast("int")
    return docs.select(
        F.col(id_col).alias("doc_id"), n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"), alpha_ratio.alias("alpha_ratio"),
        space_ratio.alias("space_ratio"), stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"))


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace token count + BPE-ish
    piece count via regexp_extract_all."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, "[ \\t\\n\\r]+"),
                         lambda x: F.length(x) > 0))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), 0))
    return docs.select(F.col(id_col).alias("doc_id"),
                       ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, fp64): portable 60-bit content fingerprint (md5-prefix).
    A rolling Karp-Rabin variant lives in multimodal.py as the pandas-UDF
    example; this Column form is the shuffle-friendly default."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       phash_col(F.col(text_col)).alias("fp64"))


def char_similarity_col(a, b):
    """R6 extra: gpu_text_similarity_kernel (Super Hybrid Version/src/
    cuda_kernels.cu:236-263) - positional char matches over the shorter
    string, sim = 2*matches / (len1+len2), 0 when both empty. The CUDA demo
    computes in float32; our contract is the double value rounded to 6
    (portable across engines)."""
    la, lb = F.length(a), F.length(b)
    mn = F.least(la, lb)
    matches = F.aggregate(
        F.sequence(F.lit(1), mn),
        F.lit(0).cast("long"),
        lambda s, i: s + F.when(a.substr(i, F.lit(1)) == b.substr(i, F.lit(1)),
                                1).otherwise(0))
    matches = F.when(mn > 0, matches).otherwise(F.lit(0))  # sequence(1,0) descends
    total = la + lb
    return F.when(total > 0,
                  F.round(2.0 * matches / total, 6)).otherwise(F.lit(0.0))


def string_match_positions_col(haystack, needle):
    """R6 extra: gpu_string_matching_kernel (cuda_kernels.cu:292-311) -
    1-based positions where `needle` matches inside `haystack` (every
    candidate position tested independently, the kernel's thread-per-pos
    shape as one array expression)."""
    lh, ln = F.length(haystack), F.length(needle)
    span = lh - ln + 1
    pos = F.when(
        span > 0,
        F.filter(F.sequence(F.lit(1), span),
                 lambda i: haystack.substr(i, ln) == needle)
    ).otherwise(F.array().cast("array<int>"))
    return pos
