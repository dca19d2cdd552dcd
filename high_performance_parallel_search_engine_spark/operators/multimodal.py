"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partitioning) is real and tested; the actual codec work is STUBBED behind
clearly-marked seams (no image/audio libraries in this container): decode
raises NotImplementedError unless `fake=True`, which substitutes a
deterministic fake feature extractor so the pipeline shape is exercisable
end-to-end.

Also hosts the rolling-hash (Karp-Rabin) fingerprint as the canonical
pandas-UDF example (imperative per-byte loop -> Arrow batched).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # 'image' | 'audio' | 'video'
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # typed metadata columns
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def synth_media_df(spark, docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (payload = utf-8 bytes of the text; metadata derived from lengths) -
    exercises binary columns without external data."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(text_col) % 1920).cast("int").alias("width"),
        (F.length(text_col) % 1080).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
    )


def _decode_stub(payload: bytes, kind: str, fake: bool) -> list[float]:
    """THE CODEC SEAM. Real deployments plug pillow/torchaudio/pyav here.
    `fake=True` produces a deterministic 8-dim feature from byte statistics
    so tests can assert the full distributed pipeline shape."""
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in")
    n = max(len(payload), 1)
    buckets = [0] * 8
    for i, b in enumerate(payload):
        buckets[i % 8] += b
    return [round(x / n, 6) for x in buckets]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: iterator-of-batches keeps memory
    bounded regardless of payload sizes (the Arrow batch size is tuned by
    spark.sql.execution.arrow.maxRecordsPerBatch; media rows are fat, so the
    pipeline repartitions by media_id first to spread decode cost evenly)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p or b"")),
                # portable 60-bit digest (same PHASH family as dedup.py:
                # first 15 hex chars of md5) so the column is oracle-checkable
                "checksum": pdf["payload"].map(
                    lambda p: int(hashlib.md5(bytes(p or b""))
                                  .hexdigest()[:15], 16)),
                "feature": [
                    _decode_stub(bytes(p or b""), k, fake)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ],
            }
            yield pd.DataFrame(out)

    spread = media.repartition("media_id")
    return spread.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def _resize_stub(payload: bytes, w: int, h: int, fake: bool) -> bytes:
    """CODEC SEAM: real deployments plug pillow here. Fake mode returns a
    deterministic (w*h)-bounded byte slice so shapes are testable."""
    if not fake:
        raise NotImplementedError("image resize requires pillow")
    return bytes(payload[: max(min(w * h, len(payload)), 1)])


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = True) -> DataFrame:
    """Batch image resize over binary payloads (mapInPandas; Arrow batch
    shape identical to the real codec path)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": [
                    _resize_stub(bytes(p or b""), width, height, fake)
                    for p in pdf["payload"]],
                "width": width, "height": height,
            })

    return media.repartition("media_id").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (flatMap
    shape - rows expand). Fake mode slices the payload per frame index."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError("frame sampling requires pyav")
                n = max(int(dur or 0) // every_ms, 1)
                b = bytes(payload or b"\0")
                for k in range(min(n, 16)):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame"].append(b[k % len(b):][:32] or b"\0")
            yield pd.DataFrame(out)

    return media.repartition("media_id").mapInPandas(run, schema=FRAME_SCHEMA)


ROLLING_FP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("rolling_fp", LongType()),
])


def rolling_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        base: int = 257, mod: int = (1 << 61) - 1) -> DataFrame:
    """Karp-Rabin rolling hash over utf-8 bytes - the imperative per-byte
    loop as a pandas UDF (no SQL oracle; rows-only check)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for t in pdf[text_col]:
                h = 0
                for b in (t or "").encode("utf-8"):
                    h = (h * base + b) % mod
                fps.append(h)
            yield pd.DataFrame({"doc_id": pdf[id_col], "rolling_fp": fps})

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=ROLLING_FP_SCHEMA)
