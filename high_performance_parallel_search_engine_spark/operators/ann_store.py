"""Persisted IVF layout: the embedding-side analog of the postings store.

operators/similarity.py's ivf_topk assigns the corpus per query job; at
10^10 vectors the assignment IS the layout decision, made once at save
time: vectors land in parquet partitioned by their coarse-centroid list
(`list_id=N/` directories), already quantized. A top-k probe then reads
ONLY the nprobe partitions its query hashes to - `PartitionFilters` in
the scan, the directory-pruning twin of the postings store's bucket
pruning - and scores exact quantized cosine within them. The centroid
matrix (n_lists x dim ints, a few KB) rides a JSON sidecar, so a fresh
session re-opens the store without the source corpus, and probe
selection is a tiny |Q| x n_lists Spark job over the broadcast matrix -
bit-identical to ivf_topk's, so results match the in-memory operator
exactly (parity-tested in tests/test_ann_store.py).

Sizing note (100 TB): n_lists plays B's role from the postings store -
size it so one inverted list is a few hundred MB (tens of thousands of
lists for 10^10 vectors); recall/nprobe trade-offs are unchanged from
ivf_topk since the math is the same.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import (_int_l2, _ivf_assign_full, int_dot, ivf_centroids,
                         quant_col)

MANIFEST_NAME = "_ivf_store.json"


def save_ivf_store(embeddings: DataFrame, path: str, n_lists: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int = 64, seed: int = 7,
                   centroids: list[list[int]] | None = None) -> None:
    """Write the corpus as centroid-partitioned quantized vectors plus the
    centroid sidecar. One assignment pass (broadcast centroids, min_by);
    the shuffle key is the slim (vec_id, v, list_id) projection - raw
    embeddings never move twice."""
    cents = centroids if centroids is not None \
        else ivf_centroids(n_lists, dim, seed)
    full = _ivf_assign_full(embeddings, n_lists, id_col, vec_col, dim,
                            seed, centroids)
    (full.select("vec_id", "v", "list_id")
     .write.mode("overwrite").partitionBy("list_id").parquet(path))
    meta = {"n_lists": n_lists, "dim": dim, "seed": seed,
            "centroids": cents}
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))


def open_ivf_store(spark: SparkSession, path: str
                   ) -> tuple[DataFrame, dict]:
    """(partitioned store df, sidecar meta) - vectors are pre-quantized."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        meta = json.load(f)
    return spark.read.parquet(path), meta


def ivf_store_topk(spark: SparkSession, path: str,
                   queries: list[tuple[int, list[float]]], k: int = 5,
                   nprobe: int = 4) -> DataFrame:
    """Top-k ANN over a saved store: (query_id, neighbor_id, cos, rk),
    identical semantics to similarity.ivf_topk (self-matches excluded,
    (cos desc, neighbor asc) ordering, cos rounded to 6) - but the corpus
    side reads only the probed `list_id=` partitions, and the query
    vectors arrive as values (no source corpus needed).

    Quantization and probe selection run as Spark expressions over the
    broadcast sidecar matrix - the same expressions the save-side
    assignment used - so store answers are bit-identical to the
    in-memory operator's."""
    store, meta = open_ivf_store(spark, path)
    cdf = F.broadcast(spark.createDataFrame(
        [(j, c) for j, c in enumerate(meta["centroids"])],
        "list_id int, cent array<bigint>"))
    q = spark.createDataFrame(queries, "query_id long, emb array<double>") \
        .select("query_id", quant_col(F.col("emb")).alias("qv"))
    probes = (q.crossJoin(cdf)
              .withColumn("_d", _int_l2(F.col("qv"), F.col("cent")))
              .withColumn("_r", F.row_number().over(
                  Window.partitionBy("query_id")
                  .orderBy(F.asc("_d"), F.asc("list_id"))))
              .where(F.col("_r") <= nprobe)
              .select("query_id", "qv", "list_id"))
    # the probed list ids must be literals for partition pruning: |Q| x
    # nprobe rows cross the driver, never vectors
    probe_ids = sorted({r["list_id"] for r in
                        probes.select("list_id").distinct().collect()})
    pruned = (store.where(F.col("list_id").isin(probe_ids))
              .select(F.col("vec_id").alias("neighbor_id"),
                      F.col("v").alias("cv"), "list_id"))
    dot = int_dot(F.col("qv"), F.col("cv")).cast("double")
    nq = F.sqrt(int_dot(F.col("qv"), F.col("qv")).cast("double"))
    nc = F.sqrt(int_dot(F.col("cv"), F.col("cv")).cast("double"))
    scored = (F.broadcast(probes).join(pruned, "list_id")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(dot / (nq * nc), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cos", "rk"))
