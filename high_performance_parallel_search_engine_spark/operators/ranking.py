"""BM25 query ranking (Serial Version/src/ranking.c:27-91).

Plan shape: the tiny query-term table broadcasts into the postings join
(ranking.c's linear index scan R2 becomes a broadcast hash join); doc_stats
joins on doc_id; the score is one codegen'd column expression; scores ADD
across query terms via groupBy(doc_id).sum; top-k is TakeOrderedAndProject.
The MPI gather-top-2k merge (MPI Version/src/ranking.c:110-188) is what
orderBy().limit() already does distributed.

k1=1.5, b=0.75, idf=ln((N-df+0.5)/(df+0.5)+1) hard-coded as in
ranking.c:55-61 (config.ini's k1=1.2 is dead config - code wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.text import BM25_B, BM25_K1, DEFAULT_STOPWORDS, stem_serial


def query_terms(query: str, stopwords=DEFAULT_STOPWORDS, stem=stem_serial) -> list[str]:
    """ranking.c:37-49: whitespace split, lowercase, stopword filter, stem.
    Duplicate query terms are kept (each occurrence adds its score again)."""
    sw = set(stopwords)
    out = []
    for tok in query.split():
        tok = tok.lower()
        if tok in sw:
            continue
        out.append(stem(tok))
    return out


def bm25_score_col(tf, dl, avg_dl, idf, k1: float = BM25_K1, b: float = BM25_B):
    return idf * ((tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avg_dl)))


def rank_bm25(postings: DataFrame, doc_stats: DataFrame, query: str,
              total_docs: int | None = None, top_k: int = 10,
              stopwords=DEFAULT_STOPWORDS) -> DataFrame:
    """Returns (doc_id, score) for the top_k positive-score docs, ordered by
    (score desc, doc_id asc) - deterministic tie-break (the C qsort is
    unstable; ties are broken by doc_id in both our engine and the oracle).

    total_docs defaults to countDistinct(doc_id) of doc_stats; avg_dl is
    computed as in ranking.c:39-42 (sum dl / total_docs).
    """
    spark = postings.sparkSession
    if total_docs is None:
        total_docs = doc_stats.count()
    if total_docs == 0:
        return spark.createDataFrame([], "doc_id long, score double")
    avg_dl = (doc_stats.agg(F.sum("dl")).collect()[0][0] or 0) / total_docs

    terms = query_terms(query, stopwords)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    df_tbl = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.lit(float(total_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)

    scored = (
        postings
        .join(F.broadcast(qdf), "term")            # R2: query terms x index
        .join(F.broadcast(df_tbl), "term")
        .join(doc_stats, "doc_id")
        .withColumn("idf", idf)
        .withColumn("score_part", bm25_score_col(
            F.col("tf").cast("double"), F.col("dl").cast("double"),
            F.lit(float(avg_dl)), F.col("idf")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score_part").alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
