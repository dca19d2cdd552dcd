"""Streaming index maintenance: fold arriving document snapshots into the
persistent postings index incrementally.

The reference rebuilds its entire index after every crawl
(Serial Version/src/main.c:165 -> build_index over the whole dataset dir);
at 10^10 documents a full re-tokenize per crawl round is the one cost that
can never be paid. This module is the continuous form of
operators.index.merge_postings (the O(delta) incremental merge, gate
`postings_incremental`): crawl round snapshots land as files, Structured
Streaming delivers them as micro-batches, and each batch folds into a new
index VERSION - only the delta crosses the tokenizer.

Exactly-once effect from at-least-once machinery: foreachBatch may replay a
batch after a failure, so the sink keeps a batch log inside the index
manifest - a replayed batch_id is a no-op (checked before any write). The
manifest swap is atomic (tmp + os.replace), so a reader either sees the old
complete version or the new complete version, never a partial one; versions
are immutable directories, and retention keeps the last `keep_versions` so
an in-flight reader of the previous version survives one swap.

Write amplification (`compact_every`): with the default (1) every batch
rewrites the full merged postings - fine for tests and small indices, but
at 10^10 docs that makes maintenance I/O O(index) per batch even though
tokenization is O(delta). `compact_every=K` switches to the LSM shape
Lucene-style indexes use: each batch writes ONLY its own postings as an
immutable delta segment (O(delta) bytes), and every K batches a compaction
folds base+segments into a new base version. Readers get latest-segment-
wins-per-doc over base+deltas (`read_current_postings` builds the view);
retired segments outlive one more compaction so an in-flight reader of the
previous manifest survives the swap, mirroring the base retention rule.

Ordering contract: the file source delivers files in arrival order, so a
document re-crawled in a LATER snapshot file lands in the same or a later
micro-batch and REPLACES its old postings (merge_postings semantics). Inside
one batch the latest (warc_ts, text) struct wins - a deterministic
lexicographic max, so a replayed batch folds identically.

On a real cluster the same code runs with a continuous trigger over an
object-store landing prefix; the local tests use trigger(availableNow) for
bounded runs. The written version directories are plain parquet - feed one
to operators.index_store.save_postings_bucketed to publish a term-bucketed
queryable snapshot.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index import build_postings, merge_postings
from ..operators.index_store import (DEFAULT_BUCKETS, DOC_STATS_DIR,  # noqa: F401 (re-export)
                                     MANIFEST_NAME as STORE_MANIFEST_NAME,
                                     open_store, publish_store,
                                     register_postings_store,
                                     resolve_store_dir)

DOCS_STREAM_SCHEMA = "doc_id long, text string, warc_ts timestamp"
POSTINGS_SCHEMA = "term string, doc_id long, tf long"
MANIFEST_NAME = "manifest.json"
# per-segment doc-id key set (tombstones): written INSIDE the segment dir
# under an underscore name so a plain read of the segment sees only
# postings; a re-crawl that tokenizes to ZERO postings still supersedes
# the doc's old postings because its id is in the key set
SEGMENT_DOCS_DIR = "_docs"
_DEFAULT_STREAM = "default"
# the columns of a crawl round's pages.parquet snapshot that the index
# cares about (operators/crawl.py writes them per round; `seq` is the
# crawl's global deterministic sequence - stable across resume/rewind, so
# it IS the doc_id, exactly what the CLI's post-crawl indexing uses)
CRAWL_PAGES_STREAM_SCHEMA = ("url string, round string, seq long, "
                             "depth int, parent_url string, host string, "
                             "text string, warc_ts timestamp, lang string, "
                             "lineage_partition int")


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(DOCS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def crawl_docs_stream(spark: SparkSession, workdir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """The crawl's OWN round snapshots as the maintenance stream's input:
    watch `workdir/round=*/pages.parquet` (each committed round appends
    one) and project pages onto the docs schema. No copy step between
    crawling and indexing - the round snapshot IS the landing prefix."""
    raw = (spark.readStream.schema(CRAWL_PAGES_STREAM_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(os.path.join(workdir, "round=*", "pages.parquet")))
    return raw.select(F.col("seq").alias("doc_id"), "text", "warc_ts")


def latest_doc_versions(batch_df: DataFrame) -> DataFrame:
    """One row per doc_id: the lexicographic max of (warc_ts, text) -
    deterministic even on warc_ts ties, so replays fold identically."""
    return (batch_df
            .groupBy("doc_id")
            .agg(F.max(F.struct("warc_ts", "text")).alias("v"))
            .select("doc_id", F.col("v.text").alias("text")))


def _manifest_path(index_root: str) -> str:
    return os.path.join(index_root, MANIFEST_NAME)


def read_manifest(index_root: str) -> dict:
    p = _manifest_path(index_root)
    if not os.path.exists(p):
        return {"version": 0, "applied": {}, "deltas": [],
                "retired_deltas": [], "delta_seq": 0, "base_version": 0}
    with open(p) as f:
        man = json.load(f)
    # manifests written before delta segments existed: their v-dir IS the
    # (only) base and they carry no segments
    man.setdefault("deltas", [])
    man.setdefault("retired_deltas", [])
    man.setdefault("delta_seq", 0)
    man.setdefault("base_version", man["version"])
    # pre-round-5b manifests kept every applied batch id in a list; the
    # bounded form keeps max applied id PER STREAM (batch ids are
    # monotonic per checkpoint, so `<= max` IS the replay test, and the
    # manifest stops growing with batch count)
    if "applied" not in man:
        legacy = man.pop("applied_batches", [])
        man["applied"] = {_DEFAULT_STREAM: max(legacy)} if legacy else {}
    return man


def _write_manifest(index_root: str, man: dict) -> None:
    os.makedirs(index_root, exist_ok=True)
    tmp = _manifest_path(index_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, _manifest_path(index_root))


def _version_dir(index_root: str, version: int) -> str:
    return os.path.join(index_root, f"v{version:06d}")


def read_current_postings(spark: SparkSession,
                          index_root: str) -> tuple[DataFrame, int]:
    """(postings, version) of the current index; (empty, 0) before any
    batch has been applied. With delta segments outstanding the returned
    plan is the merged VIEW: base minus superseded docs, plus latest-
    segment-wins rows over the deltas - the segment side is |deltas|-
    sized, so the extra work is one slim agg + anti-join, never a second
    base scan."""
    man = read_manifest(index_root)
    if man["version"] == 0:
        return spark.createDataFrame([], POSTINGS_SCHEMA), 0
    if man["base_version"] > 0:
        base = spark.read.parquet(
            _version_dir(index_root, man["base_version"]))
    else:
        base = spark.createDataFrame([], POSTINGS_SCHEMA)
    if not man["deltas"]:
        return base, man["version"]
    segs = keys = None
    for i, name in enumerate(man["deltas"]):
        d = (spark.read.parquet(os.path.join(index_root, name))
             .withColumn("seg", F.lit(i)))
        # supersession comes from the segment's KEY SET, not its posting
        # rows: a doc revised to zero tokens has keys but no rows
        k = (spark.read.parquet(
                os.path.join(index_root, name, SEGMENT_DOCS_DIR))
             .withColumn("seg", F.lit(i)))
        segs = d if segs is None else segs.unionByName(d)
        keys = k if keys is None else keys.unionByName(k)
    latest = keys.groupBy("doc_id").agg(F.max("seg").alias("seg"))
    winners = (segs.join(latest, ["doc_id", "seg"])
               .select("term", "doc_id", "tf"))
    kept = (base.join(keys.select("doc_id").distinct(), "doc_id",
                      "left_anti")
            .select("term", "doc_id", "tf"))
    return kept.unionByName(winners), man["version"]


def _prune_bases(index_root: str, keep_versions: int) -> None:
    """Keep the newest keep_versions base dirs (version NUMBERS are sparse
    in delta mode, so retention counts existing bases, not numbers)."""
    bases = sorted(d for d in os.listdir(index_root)
                   if d.startswith("v") and len(d) == 7)
    for name in bases[:-max(keep_versions, 1)]:
        shutil.rmtree(os.path.join(index_root, name), ignore_errors=True)


def apply_index_delta(index_root: str, batch_df: DataFrame, batch_id: int,
                      keep_versions: int = 2, compact_every: int = 1,
                      stream_id: str | None = None) -> int:
    """foreachBatch body: fold one micro-batch of documents into the
    index. Idempotent on (stream_id, batch_id): batch ids restart at 0
    under a NEW checkpoint with a different file-to-batch assignment, so
    replay detection must be per-stream - the maintenance starters pass
    the checkpoint path. The log keeps only the max applied id per
    stream (ids are monotonic per checkpoint), so the manifest stays
    O(#streams), not O(#batches). Returns the current version after the
    call. Single-writer by contract (one maintenance stream per
    index_root - same as any streaming sink).

    compact_every=1 (default): every batch writes a full merged base.
    compact_every=K: batches write O(delta) segment files; every Kth
    batch compacts base+segments into a new base (module docstring)."""
    spark = batch_df.sparkSession
    man = read_manifest(index_root)
    skey = stream_id or _DEFAULT_STREAM
    if batch_id <= man["applied"].get(skey, -1):
        return man["version"]  # replayed batch after a failure: no-op
    delta = latest_doc_versions(batch_df)
    new_version = man["version"] + 1
    applied = {**man["applied"], skey: batch_id}
    if len(man["deltas"]) + 1 >= max(compact_every, 1):
        old, _ = read_current_postings(spark, index_root)
        # canonical column order: merge_postings' anti-join reorders
        merged = merge_postings(old, delta).select("term", "doc_id", "tf")
        merged.write.mode("overwrite").parquet(
            _version_dir(index_root, new_version))
        doomed = man["retired_deltas"]
        _write_manifest(index_root, {
            **man, "version": new_version, "base_version": new_version,
            "applied": applied,
            "deltas": [], "retired_deltas": man["deltas"]})
        # retention AFTER the swap: the outgoing segments stay one more
        # compaction (a reader of the previous manifest may hold them);
        # segments retired at the PREVIOUS compaction go now
        for name in doomed:
            shutil.rmtree(os.path.join(index_root, name),
                          ignore_errors=True)
        _prune_bases(index_root, keep_versions)
    else:
        name = f"d{man['delta_seq']:06d}"
        (build_postings(delta).select("term", "doc_id", "tf")
         .write.mode("overwrite")
         .parquet(os.path.join(index_root, name)))
        # the key set AFTER the postings (both O(delta)): a segment is
        # only referenced by a manifest written after both exist
        (delta.select("doc_id").distinct()
         .write.mode("overwrite")
         .parquet(os.path.join(index_root, name, SEGMENT_DOCS_DIR)))
        _write_manifest(index_root, {
            **man, "version": new_version, "applied": applied,
            "deltas": man["deltas"] + [name],
            "delta_seq": man["delta_seq"] + 1})
    return new_version


def publish_current_index(spark: SparkSession, index_root: str,
                          store_path: str, table: str = "postings_store",
                          buckets: int = DEFAULT_BUCKETS,
                          keep_publishes: int = 2) -> tuple[DataFrame, int]:
    """Publish the CURRENT streaming index version as a self-contained
    queryable snapshot: the postings become a term-bucketed store
    (operators.index_store - BM25 queries then read only the buckets their
    candidate terms hash to) and the BM25 doc stats (dl = sum(tf) per doc,
    exactly build_doc_stats' value) are derived in one slim pass and
    written inside the store directory. The store sidecar records which
    index version it was published from, so `store_is_stale` can compare
    against the live manifest without touching data files.

    store_path is a versioned ROOT: each publish lands in an immutable
    pv%06d subdirectory and the CURRENT pointer file swings atomically
    (tmp + rename) after everything in it is written - a serving process
    scanning the previous publish never has files deleted under it (the
    last keep_publishes dirs are retained; readers resolve CURRENT once
    per open via open_store/open_published_index). Returns
    (store table, published version)."""
    postings, version = read_current_postings(spark, index_root)
    if version == 0:
        raise ValueError(f"no index version to publish under {index_root}")
    pub = f"pv{version:06d}"
    cur_file = os.path.join(store_path, "CURRENT")
    if (os.path.isfile(os.path.join(store_path, STORE_MANIFEST_NAME))
            and not os.path.isfile(cur_file)):
        raise ValueError(
            f"{store_path} holds a plain (unversioned) store; publish to "
            "a fresh root - or keep serving the plain dir via open_store")
    if os.path.isfile(cur_file):
        with open(cur_file) as f:
            if f.read().strip() == pub:
                # this index version is already the live publish: NEVER
                # rewrite an immutable pv dir under its readers
                return (register_postings_store(
                    spark, os.path.join(store_path, pub), table=table),
                    version)
    tbl = publish_store(postings, os.path.join(store_path, pub),
                        table=table, buckets=buckets,
                        extra_meta={"index_version": version})
    tmp = cur_file + ".tmp"
    with open(tmp, "w") as f:
        f.write(pub)
    os.replace(tmp, cur_file)
    # retention: the live publish is always kept (a rebuilt index can
    # legitimately publish a LOWER version than existing dirs), plus the
    # lexicographically-newest keep_publishes-1 others; name-guarded so a
    # stray pv* entry is never touched
    others = sorted(d for d in os.listdir(store_path)
                    if re.fullmatch(r"pv\d{6}", d) and d != pub)
    keep_others = max(keep_publishes, 1) - 1
    doomed = others[:-keep_others] if keep_others else others
    for name in doomed:
        shutil.rmtree(os.path.join(store_path, name), ignore_errors=True)
    return tbl, version


def open_published_index(spark: SparkSession, store_path: str,
                         table: str | None = None
                         ) -> tuple[DataFrame, DataFrame, int]:
    """Query-side entry: (postings store table, doc_stats, version) from a
    published store directory - a fresh session/catalog re-attaches via
    the sidecar DDL, ready for rank_bm25(tbl, stats, query). CURRENT is
    resolved exactly ONCE so table, stats and version always come from
    the same publish even if a republish swings the pointer mid-call."""
    resolved = resolve_store_dir(store_path)
    tbl, stats, _ = open_store(spark, resolved, table=table)
    return tbl, stats, published_index_version(resolved)


def published_index_version(store_path: str) -> int:
    """The index version a store was published from (0 if the sidecar
    predates version tracking). Accepts a plain store dir or a versioned
    root (resolved through CURRENT)."""
    with open(os.path.join(resolve_store_dir(store_path),
                           STORE_MANIFEST_NAME)) as f:
        return json.load(f).get("index_version", 0)


def store_is_stale(index_root: str, store_path: str) -> bool:
    """True when the live streaming index has advanced past the published
    snapshot - the republish trigger for a serving tier."""
    return read_manifest(index_root)["version"] > \
        published_index_version(store_path)


def _start_maintenance(stream: DataFrame, index_root: str, checkpoint: str,
                       keep_versions: int, compact_every: int):
    """availableNow drains what exists and stops (the bounded/test form);
    swap the trigger for a continuous deployment."""
    sid = os.path.abspath(checkpoint)
    return (stream.writeStream
            .foreachBatch(lambda df, bid: apply_index_delta(
                index_root, df, bid, keep_versions=keep_versions,
                compact_every=compact_every, stream_id=sid))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def maintain_index_stream(spark: SparkSession, docs_path: str,
                          index_root: str, checkpoint: str,
                          max_files_per_trigger: int = 4,
                          keep_versions: int = 2,
                          compact_every: int = 1):
    """Start the maintenance stream: docs snapshots at docs_path ->
    versioned postings under index_root."""
    return _start_maintenance(
        read_docs_stream(spark, docs_path, max_files_per_trigger),
        index_root, checkpoint, keep_versions, compact_every)


def maintain_index_from_crawl(spark: SparkSession, workdir: str,
                              index_root: str, checkpoint: str,
                              max_files_per_trigger: int = 4,
                              keep_versions: int = 2,
                              compact_every: int = 1):
    """Continuous indexing of a crawl: fold each committed round's pages
    snapshot into the versioned index as it lands. Rerunnable between (or
    during) crawl sessions - the stream checkpoint remembers which
    snapshot files are already folded, so a drain after N more rounds
    costs O(those rounds).

    Append-only contract: the round snapshots must only ever GROW. A
    rewind (`run_crawl(resume_from=r)` deletes rounds > r) or an
    overwrite crawl deletes snapshot files whose documents have no
    tombstone here - the derived index would keep serving them. After a
    rewind/overwrite, rebuild: wipe index_root AND this stream's
    checkpoint, then drain again."""
    return _start_maintenance(
        crawl_docs_stream(spark, workdir, max_files_per_trigger),
        index_root, checkpoint, keep_versions, compact_every)
