"""Custom stateful streaming operator: per-host crawl accounting with
applyInPandasWithState.

The batch engine enforces politeness per round; the streaming view needs
state ACROSS micro-batches: cumulative fetches/bytes per host and an
over-budget flag that persists. GroupState holds (fetches, bytes) per host;
each micro-batch folds its pages in and emits the running totals - the
streaming analog of the reference's per-domain accounting
(MAX_URLS_PER_DOMAIN, Serial Version/config.ini:12) that the C code
documents but never enforces.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, BooleanType, LongType, StringType, StructField, StructType,
)

from ..functions.urlsql import host_col

STATE_SCHEMA = StructType([
    StructField("fetches", LongType()),
    StructField("bytes", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("total_fetches", LongType()),
    StructField("total_bytes", LongType()),
    StructField("over_budget", BooleanType()),
])


def host_budget_tracker(pages_stream: DataFrame,
                        budget: int = 1000) -> DataFrame:
    """Streaming per-host cumulative fetch/byte counters with persistent
    GroupState; emits one row per (host, micro-batch) with running totals
    and the over-budget flag."""

    def track(key: Tuple[str], batches: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        fetches, nbytes = state.get if state.exists else (0, 0)
        for pdf in batches:
            fetches += len(pdf)
            nbytes += int(pdf["n_bytes"].sum())
        state.update((fetches, nbytes))
        yield pd.DataFrame({
            "host": [key[0]],
            "total_fetches": [fetches],
            "total_bytes": [nbytes],
            "over_budget": [fetches > budget],
        })

    per_host = pages_stream.select(
        host_col(F.col("url")).alias("host"),
        F.length("html").alias("n_bytes"))
    return per_host.groupBy("host").applyInPandasWithState(
        track, outputStructType=OUTPUT_SCHEMA, stateStructType=STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)


SEEN_OUT_SCHEMA = StructType([
    StructField("url", StringType()),
])

SEEN_STATE_SCHEMA = StructType([
    StructField("seen", BinaryType()),  # packed 16-byte records (see below)
])


def _load_seen(state: GroupState) -> tuple[bytes, set]:
    """(blob, set of 16-byte records) from a tracker's packed state -
    shared by url_seen_tracker and content_seen_tracker so the state
    encoding cannot drift between them."""
    (blob,) = state.get if state.exists else (b"",)
    blob = bytes(blob or b"")
    return blob, {blob[i:i + 16] for i in range(0, len(blob), 16)}


def _save_seen(state: GroupState, blob: bytes, new: list) -> None:
    """Append-only state write, SKIPPED when nothing new arrived - a
    steady stream of duplicates must not rewrite each shard's whole blob
    into the state store every batch."""
    if new:
        state.update((blob + b"".join(new),))


def _url_key(url: str, h: int) -> bytes:
    """16-byte state record: the shard-routing xxhash64 (8 bytes) + an
    INDEPENDENT 8-byte blake2b of the url. A false drop now needs two
    distinct urls to collide in BOTH 64-bit hashes (~2^-128 per pair) -
    at the 10^10-URL design point the expected false drops are ~10^-18,
    vs the handful expected from the bare-xxhash64 encoding this replaces.
    (The batch path, seen_anti_join, joins on (hash, url) exactly and
    remains the authoritative zero-false-drop form.)"""
    import hashlib

    return (h & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "big") + hashlib.blake2b(
        url.encode("utf-8", "surrogatepass"), digest_size=8).digest()


def url_seen_tracker(urls_stream: DataFrame,
                     n_shards: int = 64) -> DataFrame:
    """Streaming URL-seen dedup with state ACROSS micro-batches: the
    first occurrence of each url (ever) passes, repeats are dropped - the
    streaming analog of the batch anti-join (crawler.c:447-484 semantics).

    GroupState is keyed by xxhash64(url) % n_shards, so the seen-set shards
    across the cluster instead of one giant state blob; each group's state
    is its shard's packed binary blob of fixed 16-byte url keys (no csv,
    no per-entry encoding overhead). At 10^10 urls, raise n_shards so each
    shard's state stays executor-memory-sized - state size is the same
    16 bytes/url either way, just sliced finer."""

    def track(key: Tuple[int], batches: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        blob, seen = _load_seen(state)
        fresh = []
        new_keys = []
        for pdf in batches:
            for url, h in zip(pdf["url"], pdf["_h"]):
                k = _url_key(url, int(h))
                if k not in seen:
                    seen.add(k)
                    new_keys.append(k)
                    fresh.append(url)
        _save_seen(state, blob, new_keys)
        yield pd.DataFrame({"url": fresh})

    keyed = urls_stream.select(
        "url", F.xxhash64("url").alias("_h"),
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int").alias("_shard"))
    return keyed.groupBy("_shard").applyInPandasWithState(
        track, outputStructType=SEEN_OUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)


CONTENT_OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
])

CONTENT_STATE_SCHEMA = StructType([
    StructField("seen", BinaryType()),  # packed 16-byte md5 digests
])


def content_seen_tracker(docs_stream: DataFrame,
                         n_shards: int = 64) -> DataFrame:
    """Streaming exact-content dedup with state ACROSS micro-batches: the
    FIRST document carrying each md5(text) digest passes, every later
    copy is dropped - the streaming form of operators.dedup.exact_dedup,
    keyed by the SAME digest, so batch and streaming agree on what "exact
    duplicate" means. Unlike the url tracker's derived keys, the state
    record IS the full 16-byte content digest - no second hash, no false
    drops beyond md5 collision itself.

    Within one micro-batch the min-doc_id copy wins (rows fold in doc_id
    order), matching exact_dedup's min-id survivor rule; across batches
    arrival order decides, which is exactly the semantics a continuous
    ingest wants (the copy you already emitted IS the survivor). State
    shards by a hash of the digest: 16 bytes/unique-document, sliced
    across n_shards groups - raise n_shards at 10^10 docs so each
    shard's blob stays executor-sized."""

    def track(key: Tuple[int], batches: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        blob, seen = _load_seen(state)
        # concatenate the Arrow chunks FIRST: a shard group larger than
        # maxRecordsPerBatch arrives as several chunks, and a per-chunk
        # sort would let an earlier chunk's copy beat a lower doc_id in a
        # later one - breaking the min-id survivor rule
        chunks = list(batches)
        fresh, new = [], []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values("doc_id")
            for did, dig in zip(pdf["doc_id"], pdf["_digest"]):
                d = bytes(dig)
                if d not in seen:
                    seen.add(d)
                    new.append(d)
                    fresh.append(int(did))
        _save_seen(state, blob, new)
        yield pd.DataFrame({"doc_id": fresh})

    # null text mirrors exact_dedup: md5(NULL) is NULL there, so every
    # null-text doc lands in ONE group - here a sentinel record no real
    # md5 collides with. _shard derives from the already-computed digest
    # (two-step select), so the body is hashed exactly once per row
    keyed = (docs_stream.select(
                 "doc_id",
                 F.when(F.col("text").isNull(), F.lit(b"\x00" * 16))
                 .otherwise(F.unhex(F.md5("text"))).alias("_digest"))
             .select("doc_id", "_digest",
                     F.pmod(F.xxhash64("_digest"), F.lit(n_shards))
                     .cast("int").alias("_shard")))
    return keyed.groupBy("_shard").applyInPandasWithState(
        track, outputStructType=CONTENT_OUT_SCHEMA,
        stateStructType=CONTENT_STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
