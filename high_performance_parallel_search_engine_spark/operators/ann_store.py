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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (_ivf_assign_full, ivf_centroids, probe_lists,
                         quant_col, score_probed_topk)

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
                   nprobe: int = 4,
                   exclude_matching_ids: bool = True) -> DataFrame:
    """Top-k ANN over a saved store: (query_id, neighbor_id, cos, rk) -
    the corpus side reads only the probed `list_id=` partitions, and the
    query vectors arrive as values (no source corpus needed).

    Probe selection and scoring are similarity.probe_lists /
    score_probed_topk - the SAME code ivf_topk runs, which is what makes
    store answers bit-identical to the in-memory operator (not two
    copies that happen to agree).

    exclude_matching_ids: ivf_topk's self-match exclusion compares
    query_id against stored vec_ids. Keep it True when your query ids
    ARE corpus ids (parity/re-ranking); set False when query ids are
    arbitrary caller labels, or a label colliding with a real vec_id
    would silently drop that true neighbor."""
    store, meta = open_ivf_store(spark, path)
    cdf = F.broadcast(spark.createDataFrame(
        [(j, c) for j, c in enumerate(meta["centroids"])],
        "list_id int, cent array<bigint>"))
    q = spark.createDataFrame(queries, "query_id long, emb array<double>") \
        .select("query_id", quant_col(F.col("emb")).alias("qv"))
    probes = probe_lists(q, cdf, nprobe)
    # the probed list ids must be literals for partition pruning: |Q| x
    # nprobe rows cross the driver, never vectors
    probe_ids = sorted({r["list_id"] for r in
                        probes.select("list_id").distinct().collect()})
    pruned = (store.where(F.col("list_id").isin(probe_ids))
              .select(F.col("vec_id").alias("neighbor_id"),
                      F.col("v").alias("cv"), "list_id"))
    return score_probed_topk(probes, pruned, k,
                             exclude_matching_ids=exclude_matching_ids)
