"""Persisted IVF ANN store (operators/ann_store.py).

Invariants:
- store answers are BIT-IDENTICAL to similarity.ivf_topk with the same
  centroids/nprobe (same quantization + probe expressions),
- the probe scan reads only the probed list_id= partitions
  (PartitionFilters in the physical plan - the ANN twin of the postings
  store's bucket pruning),
- the store is self-contained: queried with vector VALUES, no source
  corpus, in a session that never saw the embeddings table.
"""

import os

from pyspark.sql import functions as F

from high_performance_parallel_search_engine_spark.operators.ann_store import (
    MANIFEST_NAME, ivf_store_topk, open_ivf_store, save_ivf_store)
from high_performance_parallel_search_engine_spark.operators.similarity import (
    ivf_topk)
from high_performance_parallel_search_engine_spark.plans.lineage import (
    explain_text)

SF = "/root/testdata/sf0.01"
N_LISTS, NPROBE, K = 8, 3, 5
QIDS = [3, 17, 42, 99]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_store_topk_matches_ivf_topk_and_prunes(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    save_ivf_store(emb, path, n_lists=N_LISTS)
    assert os.path.isfile(os.path.join(path, MANIFEST_NAME))
    # partition layout on disk
    parts = [d for d in os.listdir(path) if d.startswith("list_id=")]
    assert 1 < len(parts) <= N_LISTS

    want = ivf_topk(emb, QIDS, k=K, n_lists=N_LISTS, nprobe=NPROBE)
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]])
               for r in emb.where(F.col("vec_id").isin(QIDS)).collect()]
    got = ivf_store_topk(spark, path, queries, k=K, nprobe=NPROBE)
    assert _rows(got) == _rows(want) and len(_rows(got)) == K * len(QIDS)

    # the probed scan prunes partitions at planning time
    plan = explain_text(got, "formatted")
    assert "PartitionFilters" in plan and "list_id" in plan

    # store round-trip: quantized vectors and sidecar reload
    store, meta = open_ivf_store(spark, path)
    assert meta["n_lists"] == N_LISTS and len(meta["centroids"]) == N_LISTS
    assert store.count() == emb.count()


def test_store_serves_without_source_corpus(spark, tmp_path):
    """Register nothing, read nothing but the store directory: queries by
    VALUE return well-formed neighbors (the serving-tier shape)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    path = str(tmp_path / "ivf2")
    save_ivf_store(emb, path, n_lists=N_LISTS)
    vec = [float(x) for x in
           emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
    got = ivf_store_topk(spark, path, [(700_000, vec)], k=3, nprobe=NPROBE)
    rows = got.collect()
    assert len(rows) == 3
    # the duplicate of vec_id 7's own vector must rank first with cos 1.0
    assert rows[0]["neighbor_id"] == 7 and rows[0]["cos"] == 1.0
