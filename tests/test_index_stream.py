"""Streaming incremental index maintenance (streaming/index_stream.py).

Invariants:
- draining N snapshot files yields postings identical to a full rebuild
  over the latest version of every document (merge == rebuild, the
  streaming form of the postings_incremental gate),
- a re-crawled doc in a later snapshot REPLACES its old postings,
- restarting the stream on the same checkpoint with no new files applies
  nothing; new files fold in incrementally,
- a replayed batch_id is a no-op (exactly-once effect over foreachBatch's
  at-least-once replay),
- retention keeps only the last keep_versions immutable version dirs.
"""

import os
from datetime import datetime

import pytest

from high_performance_parallel_search_engine_spark.operators.index import (
    build_index_tables, build_postings)
from high_performance_parallel_search_engine_spark.operators.index_store import (
    selected_buckets)
from high_performance_parallel_search_engine_spark.operators.ranking import rank_bm25
from high_performance_parallel_search_engine_spark.streaming.index_stream import (
    CRAWL_PAGES_STREAM_SCHEMA, apply_index_delta, maintain_index_from_crawl,
    maintain_index_stream, open_published_index, publish_current_index,
    published_index_version, read_current_postings, read_manifest,
    store_is_stale)

TS0 = datetime(2026, 1, 1, 0, 0, 0)
TS1 = datetime(2026, 1, 2, 0, 0, 0)
TS2 = datetime(2026, 1, 3, 0, 0, 0)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, warc_ts timestamp")


def _snap(spark, docs_dir, name, rows):
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(
        os.path.join(docs_dir, name))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain(spark, docs_dir, index_root, ckpt):
    q = maintain_index_stream(spark, docs_dir + "/*", index_root, ckpt,
                              max_files_per_trigger=1)
    q.awaitTermination(120)
    return q


def test_stream_merge_equals_full_rebuild_with_replacement(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    index_root = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    _snap(spark, docs_dir, "snap0", [
        (1, "alpha bravo alpha", TS0),
        (2, "charlie delta", TS0),
    ])
    _snap(spark, docs_dir, "snap1", [
        (3, "echo foxtrot echo echo", TS1),
        (2, "charlie REVISED golf", TS1),   # re-crawl: must replace
    ])
    _drain(spark, docs_dir, index_root, ckpt)

    postings, version = read_current_postings(spark, index_root)
    latest = _docs(spark, [
        (1, "alpha bravo alpha", TS0),
        (2, "charlie REVISED golf", TS1),
        (3, "echo foxtrot echo echo", TS1),
    ])
    assert _rows(postings) == _rows(build_postings(latest))
    assert version >= 2  # one version per non-empty micro-batch
    man = read_manifest(index_root)
    # replay log is bounded: max applied id for this checkpoint's stream,
    # not a per-batch list
    assert man["applied"] == {os.path.abspath(ckpt): version - 1}

    # restart on the same checkpoint with no new files: nothing applied
    _drain(spark, docs_dir, index_root, ckpt)
    assert read_manifest(index_root)["version"] == version

    # a new snapshot folds in incrementally after the restart
    _snap(spark, docs_dir, "snap2", [(4, "hotel india", TS2)])
    _drain(spark, docs_dir, index_root, ckpt)
    postings2, version2 = read_current_postings(spark, index_root)
    assert version2 == version + 1
    latest2 = latest.unionByName(_docs(spark, [(4, "hotel india", TS2)]))
    assert _rows(postings2) == _rows(build_postings(latest2))


def test_replayed_batch_is_noop(spark, tmp_path):
    index_root = str(tmp_path / "index")
    b0 = _docs(spark, [(1, "alpha bravo", TS0)])
    v1 = apply_index_delta(index_root, b0, batch_id=0)
    assert v1 == 1
    before = _rows(read_current_postings(spark, index_root)[0])
    # at-least-once replay of the SAME batch id: no new version, no change
    assert apply_index_delta(index_root, b0, batch_id=0) == 1
    assert _rows(read_current_postings(spark, index_root)[0]) == before


def test_within_batch_latest_version_wins_deterministically(spark, tmp_path):
    index_root = str(tmp_path / "index")
    b = _docs(spark, [
        (1, "old text", TS0),
        (1, "new text", TS1),   # later warc_ts wins inside one batch
    ])
    apply_index_delta(index_root, b, batch_id=0)
    postings, _ = read_current_postings(spark, index_root)
    assert _rows(postings) == _rows(
        build_postings(_docs(spark, [(1, "new text", TS1)])))


def test_publish_serves_bm25_from_fresh_catalog_with_pruning(spark,
                                                             tmp_path):
    """The full serving chain: snapshots -> maintenance stream -> publish
    as a term-bucketed store -> a wiped catalog re-attaches it -> BM25 over
    (store, published doc_stats) is bit-identical to a full rebuild over
    the latest docs, and the query scan reads only the candidate-term
    buckets. Plus the staleness contract that drives republishing."""
    docs_dir = str(tmp_path / "docs")
    index_root = str(tmp_path / "index")
    store_path = str(tmp_path / "store")
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    rows0 = [(i, " ".join(words[(i + k * k) % len(words)]
                          for k in range(8)), TS0) for i in range(20)]
    rows1 = [(i, " ".join(words[(i + k) % len(words)]
                          for k in range(8)), TS1) for i in range(15, 30)]
    _snap(spark, docs_dir, "snap0", rows0)
    _snap(spark, docs_dir, "snap1", rows1)   # docs 15-19 re-crawled
    _drain(spark, docs_dir, index_root, str(tmp_path / "ckpt"))

    with pytest.raises(ValueError):
        publish_current_index(spark, str(tmp_path / "empty"), store_path)

    tbl, ver = publish_current_index(spark, index_root, store_path,
                                     table="t_pub_store", buckets=16)
    assert ver == read_manifest(index_root)["version"]
    assert published_index_version(store_path) == ver
    assert not store_is_stale(index_root, store_path)

    # a wiped catalog re-attaches the published directory
    spark.sql("DROP TABLE t_pub_store")
    store, stats, ver2 = open_published_index(spark, store_path)
    assert ver2 == ver

    latest = _docs(spark, dict((r[0], r) for r in rows0 + rows1).values())
    ref_postings, ref_stats = build_index_tables(latest)
    assert _rows(stats) == _rows(ref_stats)
    got = rank_bm25(store, stats, "alpha echo lima", top_k=10)
    want = rank_bm25(ref_postings, ref_stats, "alpha echo lima", top_k=10)
    assert _rows(got) == _rows(want)
    sel = selected_buckets(got)
    assert sel is not None and sel[0] < sel[1] == 16

    # a new snapshot advances the live index past the published store
    _snap(spark, docs_dir, "snap2", [(99, "mike november", TS2)])
    _drain(spark, docs_dir, index_root, str(tmp_path / "ckpt"))
    assert store_is_stale(index_root, store_path)
    _, ver3 = publish_current_index(spark, index_root, store_path,
                                    table="t_pub_store", buckets=16)
    assert ver3 == ver + 1 and not store_is_stale(index_root, store_path)
    # versioned layout: republish lands in a NEW immutable pv dir and the
    # CURRENT pointer swings; the previous publish survives the swap so a
    # serving process scanning it never has files deleted underneath
    pubs = sorted(d for d in os.listdir(store_path) if d.startswith("pv"))
    assert pubs == [f"pv{ver:06d}", f"pv{ver3:06d}"]
    with open(os.path.join(store_path, "CURRENT")) as f:
        assert f.read().strip() == f"pv{ver3:06d}"
    store2, _, ver4 = open_published_index(spark, store_path)
    assert ver4 == ver3  # reader resolves CURRENT to the new publish


def test_maintain_index_from_crawl_workdir(spark, tmp_path):
    """Continuous indexing straight off a real crawl's round snapshots:
    the drained index equals a full rebuild over every crawled page
    (doc_id = the crawl's global seq), and a later-landing round folds in
    as exactly one new version (O(delta), checkpoint remembers the rest)."""
    from pyspark.sql import functions as F

    from high_performance_parallel_search_engine_spark.operators.crawl import (
        CrawlConfig, run_crawl)
    from high_performance_parallel_search_engine_spark.sources.synth import (
        build_corpus_df)

    pages = build_corpus_df(spark).select("url", "warc_ts", "html", "lang")
    wd = str(tmp_path / "wd")
    state = run_crawl(spark, pages, ["https://host0.example.com/p/0"], wd,
                      CrawlConfig(max_depth=3, max_pages=15))
    assert state.pages_crawled > 0
    index_root, ckpt = str(tmp_path / "ix"), str(tmp_path / "ck")
    maintain_index_from_crawl(spark, wd, index_root, ckpt) \
        .awaitTermination(120)

    crawled = (spark.read.parquet(f"{wd}/round=*/pages.parquet")
               .select(F.col("seq").alias("doc_id"), "text"))
    postings, ver = read_current_postings(spark, index_root)
    assert _rows(postings) == _rows(build_postings(crawled))

    # the next crawl session commits one more round snapshot: the rerun
    # folds ONLY it (one new file -> exactly one new version)
    extra_row = [("https://hostx.example.com/p/x", "00099", 10_000, 1,
                  None, "hostx.example.com", "quantum zebra quantum",
                  TS2, "en", 0)]
    spark.createDataFrame(extra_row, CRAWL_PAGES_STREAM_SCHEMA) \
        .coalesce(1).write.parquet(f"{wd}/round=00099/pages.parquet")
    maintain_index_from_crawl(spark, wd, index_root, ckpt) \
        .awaitTermination(120)
    postings2, ver2 = read_current_postings(spark, index_root)
    assert ver2 == ver + 1
    latest = crawled.unionByName(spark.createDataFrame(
        [(10_000, "quantum zebra quantum")], "doc_id long, text string"))
    assert _rows(postings2) == _rows(build_postings(latest))


def _dir_bytes(path):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs)


def test_delta_segments_equal_compaction(spark, tmp_path):
    """LSM mode (compact_every=K) and full-rewrite mode (=1) read
    identically, including a doc revised across TWO delta segments
    (latest segment wins) and one revised inside a batch."""
    batches = [
        [(1, "alpha bravo", TS0), (2, "charlie", TS0)],
        [(2, "charlie REVISED", TS1), (3, "delta echo", TS1)],
        [(1, "alpha FINAL", TS2), (1, "alpha OLD", TS1), (4, "fox", TS2)],
    ]
    roots = {"lsm": str(tmp_path / "lsm"), "full": str(tmp_path / "full")}
    for i, rows in enumerate(batches):
        apply_index_delta(roots["lsm"], _docs(spark, rows), batch_id=i,
                          compact_every=10)
        apply_index_delta(roots["full"], _docs(spark, rows), batch_id=i)
    latest = _docs(spark, [(1, "alpha FINAL", TS2),
                           (2, "charlie REVISED", TS1),
                           (3, "delta echo", TS1), (4, "fox", TS2)])
    want = _rows(build_postings(latest))
    for root in roots.values():
        postings, ver = read_current_postings(spark, root)
        assert _rows(postings) == want and ver == 3
    man = read_manifest(roots["lsm"])
    assert man["deltas"] == ["d000000", "d000001", "d000002"]
    assert man["base_version"] == 0  # never compacted
    assert not any(d.startswith("v") for d in os.listdir(roots["lsm"]))


def test_delta_mode_writes_o_delta_bytes(spark, tmp_path):
    """The LSM point: a small batch after a big one writes bytes
    proportional to ITS delta, while full-rewrite mode rewrites the whole
    merged index for the same small batch."""
    big = [(i, " ".join(f"tok{i}x{j}" for j in range(40)), TS0)
           for i in range(300)]
    small = [(9001, "tiny doc", TS1), (9002, "tinier", TS1)]
    lsm, full = str(tmp_path / "lsm"), str(tmp_path / "full")
    for root, ce in ((lsm, 10), (full, 1)):
        apply_index_delta(root, _docs(spark, big), 0, compact_every=ce)
        apply_index_delta(root, _docs(spark, small), 1, compact_every=ce)
    d0 = _dir_bytes(os.path.join(lsm, "d000000"))
    d1 = _dir_bytes(os.path.join(lsm, "d000001"))
    assert d1 < d0 * 0.2, f"segment for 2 docs cost {d1}B vs {d0}B"
    v2 = _dir_bytes(os.path.join(full, "v000002"))
    assert v2 > d0 * 0.5  # full mode re-paid ~the whole index for 2 docs
    # both layouts still read identically
    a, _ = read_current_postings(spark, lsm)
    b, _ = read_current_postings(spark, full)
    assert _rows(a) == _rows(b)


def test_compaction_folds_segments_and_retires(spark, tmp_path):
    """compact_every=2 lifecycle: segment, compact, segment, compact —
    retired segments survive exactly one further compaction (in-flight
    readers of the previous manifest), old bases pruned by count."""
    root = str(tmp_path / "ix")
    rows = [[(i, f"word{i} common", TS0)] for i in range(4)]
    apply_index_delta(root, _docs(spark, rows[0]), 0, compact_every=2,
                      keep_versions=1)
    man = read_manifest(root)
    assert man["deltas"] == ["d000000"] and man["base_version"] == 0
    apply_index_delta(root, _docs(spark, rows[1]), 1, compact_every=2,
                      keep_versions=1)
    man = read_manifest(root)
    assert man["base_version"] == 2 and man["deltas"] == []
    assert man["retired_deltas"] == ["d000000"]
    assert os.path.isdir(os.path.join(root, "d000000"))  # one-swap grace
    apply_index_delta(root, _docs(spark, rows[2]), 2, compact_every=2,
                      keep_versions=1)
    assert read_manifest(root)["deltas"] == ["d000001"]
    apply_index_delta(root, _docs(spark, rows[3]), 3, compact_every=2,
                      keep_versions=1)
    man = read_manifest(root)
    assert man["base_version"] == 4
    assert man["retired_deltas"] == ["d000001"]
    assert not os.path.isdir(os.path.join(root, "d000000"))  # now gone
    assert not os.path.isdir(os.path.join(root, "v000002"))  # keep 1 base
    postings, ver = read_current_postings(spark, root)
    assert ver == 4
    assert _rows(postings) == _rows(build_postings(_docs(
        spark, [r for b in rows for r in b])))


def test_lsm_zero_token_recrawl_supersedes(spark, tmp_path):
    """A re-crawl that tokenizes to ZERO postings (empty / all-stopword
    text) must still delete the doc's old postings in LSM mode - the
    segment's key set, not its posting rows, drives supersession. Also
    survives compaction (the tombstone must not resurrect the doc)."""
    lsm, full = str(tmp_path / "lsm"), str(tmp_path / "full")
    batches = [
        [(1, "alpha bravo", TS0), (2, "charlie", TS0)],
        [(1, "", TS1)],   # empty re-crawl -> zero postings
    ]
    for i, rows in enumerate(batches):
        apply_index_delta(lsm, _docs(spark, rows), i, compact_every=10)
        apply_index_delta(full, _docs(spark, rows), i)
    want = _rows(build_postings(_docs(spark, [(2, "charlie", TS0)])))
    for root in (lsm, full):
        postings, _ = read_current_postings(spark, root)
        assert _rows(postings) == want, root
    # compaction bakes the tombstone in, not the stale postings
    apply_index_delta(lsm, _docs(spark, [(3, "delta", TS2)]), 2,
                      compact_every=1)
    postings, _ = read_current_postings(spark, lsm)
    assert _rows(postings) == _rows(build_postings(_docs(
        spark, [(2, "charlie", TS0), (3, "delta", TS2)])))


def test_fresh_checkpoint_over_existing_index_reapplies(spark, tmp_path):
    """Batch ids restart at 0 under a new checkpoint, so replay detection
    is per-stream: a rerun with a NEW checkpoint over an existing
    index_root must fold its batches (replace semantics keep the result
    identical), never skip them as replays of the old stream's ids."""
    docs_dir = str(tmp_path / "docs")
    index_root = str(tmp_path / "ix")
    _snap(spark, docs_dir, "s0", [(1, "alpha bravo", TS0)])
    _drain(spark, docs_dir, index_root, str(tmp_path / "ck1"))
    v1 = read_manifest(index_root)["version"]

    # checkpoint lost/recreated: same files re-deliver as batch 0 PLUS a
    # new file - under the old ids batch 0 would be "already applied"
    _snap(spark, docs_dir, "s1", [(2, "charlie", TS1)])
    _drain(spark, docs_dir, index_root, str(tmp_path / "ck2"))
    man = read_manifest(index_root)
    assert man["version"] > v1
    assert len(man["applied"]) == 2  # both streams tracked independently
    postings, _ = read_current_postings(spark, index_root)
    assert _rows(postings) == _rows(build_postings(_docs(
        spark, [(1, "alpha bravo", TS0), (2, "charlie", TS1)])))


def test_stream_drain_in_lsm_mode_equals_rebuild(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    _snap(spark, docs_dir, "s0", [(1, "alpha bravo", TS0)])
    _snap(spark, docs_dir, "s1", [(1, "alpha REVISED", TS1),
                                  (2, "charlie", TS1)])
    q = maintain_index_stream(spark, docs_dir + "/*",
                              str(tmp_path / "ix"), str(tmp_path / "ck"),
                              max_files_per_trigger=1, compact_every=100)
    q.awaitTermination(120)
    postings, _ = read_current_postings(spark, str(tmp_path / "ix"))
    assert _rows(postings) == _rows(build_postings(_docs(
        spark, [(1, "alpha REVISED", TS1), (2, "charlie", TS1)])))


def test_publish_idempotent_and_rebuild_safe(spark, tmp_path):
    """Same-version republish is a no-op (an immutable pv dir is never
    rewritten under readers), and the rebuild workflow - wipe index_root,
    re-drain, publish a LOWER version - keeps the new publish as CURRENT
    instead of retention-deleting it."""
    import shutil as _sh

    root, store = str(tmp_path / "ix"), str(tmp_path / "store")
    apply_index_delta(root, _docs(spark, [(1, "alpha", TS0)]), 0)
    apply_index_delta(root, _docs(spark, [(2, "bravo", TS1)]), 1)
    _, v = publish_current_index(spark, root, store, table="t_pub2",
                                 buckets=8)
    assert v == 2
    marker = os.path.join(store, "pv000002", "_bucketed_store.json")
    mtime = os.path.getmtime(marker)
    _, v2 = publish_current_index(spark, root, store, table="t_pub2",
                                  buckets=8)
    assert v2 == 2 and os.path.getmtime(marker) == mtime  # untouched

    _sh.rmtree(root)  # operator rebuilds the index from scratch
    apply_index_delta(root, _docs(spark, [(3, "charlie", TS2)]), 0)
    _, v3 = publish_current_index(spark, root, store, table="t_pub2",
                                  buckets=8)
    assert v3 == 1
    with open(os.path.join(store, "CURRENT")) as f:
        assert f.read().strip() == "pv000001"  # NOT retention-deleted
    assert os.path.isdir(os.path.join(store, "pv000002"))  # kept sibling
    tbl, _, ver = open_published_index(spark, store, table="t_pub2")
    assert ver == 1
    assert _rows(tbl) == _rows(build_postings(_docs(
        spark, [(3, "charlie", TS2)])))


def test_publish_refuses_plain_store_root(spark, tmp_path):
    """Publishing into a directory that already holds a PLAIN store would
    orphan the old files under a mixed layout - refused explicitly."""
    from high_performance_parallel_search_engine_spark.operators.index_store import (
        publish_store)

    root = str(tmp_path / "ix")
    apply_index_delta(root, _docs(spark, [(1, "alpha", TS0)]), 0)
    postings, _ = read_current_postings(spark, root)
    plain = str(tmp_path / "plain")
    publish_store(postings, plain, table="t_plain_guard", buckets=4)
    with pytest.raises(ValueError, match="unversioned"):
        publish_current_index(spark, root, plain, table="t_plain_guard")


def test_retention_keeps_last_versions(spark, tmp_path):
    index_root = str(tmp_path / "index")
    for i in range(4):
        apply_index_delta(
            index_root, _docs(spark, [(i, f"term{i}", TS0)]), batch_id=i,
            keep_versions=2)
    assert read_manifest(index_root)["version"] == 4
    kept = sorted(d for d in os.listdir(index_root) if d.startswith("v"))
    assert kept == ["v000003", "v000004"]
    # current index still holds ALL four docs (versions are cumulative)
    postings, _ = read_current_postings(spark, index_root)
    assert postings.select("doc_id").distinct().count() == 4
