"""Structured Streaming extraction: file source → kernel → parquet sink."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_extraction_drains_and_checkpoints(spark, tmp_path):
    from defuddle_spark.spark.pages import pages_only, synthesize_pages
    from defuddle_spark.spark.streaming import extract_pages_stream

    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_only(synthesize_pages(spark, SF)).limit(120)
    pages.write.parquet(in_dir)

    q = extract_pages_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    assert out.count() == 120
    assert out.filter(F.col("error").isNotNull()).count() == 0
    assert "extracted_text" in out.columns

    # restart with no new data: checkpoint prevents reprocessing
    q2 = extract_pages_stream(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 120


def _events_with_flush(spark, n=2000):
    """Events subset + one flush event far past the horizon so the
    watermark closes every real window during the availableNow drain
    (the no-data micro-batch then emits the finalized state)."""
    from defuddle_spark.spark.streaming import EVENTS_SCHEMA
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .orderBy("event_id").limit(n))
    import datetime
    max_ts = ev.agg(F.max("ts")).first()[0]
    flush = spark.createDataFrame(
        [(10**9, max_ts + datetime.timedelta(days=30), -1, "__flush__",
          0.0, "{}")], EVENTS_SCHEMA)
    return ev, ev.unionByName(flush)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from defuddle_spark.spark.streaming import windowed_counts_stream
    ev, with_flush = _events_with_flush(spark)
    in_dir = str(tmp_path / "ev")
    with_flush.write.parquet(in_dir)

    q = windowed_counts_stream(spark, in_dir, str(tmp_path / "out"),
                               str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    out = (spark.read.parquet(str(tmp_path / "out"))
           .filter(F.col("event_type") != "__flush__"))
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.avg("value"), 6).alias("avg_value"),
                  F.approx_count_distinct("user_id").alias("n_users_approx"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n_events", "avg_value", "n_users_approx"))
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert len(want) > 10
    assert got == want


def test_streaming_sessions_match_batch(spark, tmp_path):
    from defuddle_spark.spark.streaming import sessionize_stream
    ev, with_flush = _events_with_flush(spark)
    in_dir = str(tmp_path / "ev")
    with_flush.write.parquet(in_dir)

    q = sessionize_stream(spark, in_dir, str(tmp_path / "out"),
                          str(tmp_path / "ckpt"), gap_minutes=30)
    q.awaitTermination(300)

    out = (spark.read.parquet(str(tmp_path / "out"))
           .filter(F.col("user_id") >= 0))
    batch = (ev.groupBy("user_id",
                        F.session_window("ts", "30 minutes").alias("sw"))
             .agg(F.count("*").alias("session_events"))
             .select("user_id", F.col("sw.start").alias("session_start"),
                     "session_events"))
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert len(want) > 10
    assert got == want


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """One availableNow drain over the doubled corpus must emit exactly
    the batch dedup_exact representative set."""
    from defuddle_spark.ops.dedup import dedup_exact
    from defuddle_spark.spark.streaming import dedup_exact_stream

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    in_dir = str(tmp_path / "docs")
    doubled.write.parquet(in_dir)

    q = dedup_exact_stream(spark, in_dir, str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    got = {r["doc_id"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {r["doc_id"] for r in dedup_exact(doubled).collect()}
    assert got == want
    assert max(got) < 10000  # every +10000 copy suppressed


def test_streaming_dedup_suppresses_across_batches(spark, tmp_path):
    """Cross-micro-batch suppression: a duplicate arriving in a LATER
    batch (separate input file, maxFilesPerTrigger=1) must emit nothing
    — the state store, not the in-batch groupBy, carries the memory."""
    import pandas as pd
    from defuddle_spark.spark.streaming import dedup_exact_stream

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["alpha text", "beta text"]}) \
        .to_parquet(in_dir / "batch1.parquet")
    q = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True,
                           max_files_per_trigger=1)
    q.awaitTermination(300)
    # second file: one dup of doc 1 (higher id) + one new doc
    pd.DataFrame({"doc_id": [7, 3], "text": ["alpha text", "gamma text"]}) \
        .to_parquet(in_dir / "batch2.parquet")
    q2 = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                            str(tmp_path / "ckpt"), available_now=True,
                            max_files_per_trigger=1)
    q2.awaitTermination(300)

    got = {r["doc_id"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {1, 2, 3}  # doc 7 (late dup of 1) suppressed by state


def test_streaming_minhash_lsh_matches_batch_candidates(spark, tmp_path):
    """One availableNow drain over the doubled corpus: the distinct
    streamed pair set must equal the batch LSH candidate set (no bucket
    near the cap in this corpus, so the saturation divergence is moot)."""
    from defuddle_spark.ops.dedup import minhash_lsh_candidates
    from defuddle_spark.spark.streaming import minhash_lsh_stream

    # deterministic subset (limit() may pick different rows per action);
    # the MATERIALIZED input parquet is the single source for both sides
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < 150))
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    in_dir = str(tmp_path / "docs")
    doubled.write.parquet(in_dir)
    staged = spark.read.parquet(in_dir)

    q = minhash_lsh_stream(spark, in_dir, str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    got = {(r["id_a"], r["id_b"]) for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {(r["id_a"], r["id_b"]) for r in
            minhash_lsh_candidates(staged, log_dropped=False).collect()}
    assert got == want
    assert all((i, i + 10000) in got
               for i in {r["doc_id"] for r in docs.collect()})


def test_streaming_minhash_pairs_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch pairs against the
    state-stored earlier member."""
    import pandas as pd
    from defuddle_spark.spark.streaming import minhash_lsh_stream

    t = ("the quick brown fox jumps over the lazy dog near the river "
         "bank and beyond the far hills")
    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    pd.DataFrame({"doc_id": [1], "text": [t]}) \
        .to_parquet(in_dir / "b1.parquet")
    q = minhash_lsh_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True,
                           max_files_per_trigger=1)
    q.awaitTermination(300)
    pd.DataFrame({"doc_id": [2], "text": [t]}) \
        .to_parquet(in_dir / "b2.parquet")
    q2 = minhash_lsh_stream(spark, str(in_dir), str(tmp_path / "out"),
                            str(tmp_path / "ckpt"), available_now=True,
                            max_files_per_trigger=1)
    q2.awaitTermination(300)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}  # paired across batches, once per band -> distinct
    assert out.count() == 16  # all 16 bands collide for identical texts


def test_streaming_dedup_state_metric_one_row_per_hash(spark, tmp_path):
    """The state-sizing claim in the docstring, measured: after a drain,
    the state store holds exactly one row per distinct content hash."""
    from defuddle_spark.spark.streaming import dedup_exact_stream

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < 200))
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    in_dir = str(tmp_path / "docs")
    doubled.write.parquet(in_dir)

    q = dedup_exact_stream(spark, in_dir, str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    n_hashes = doubled.select("text").distinct().count()
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_hashes
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert state_rows == n_hashes


def test_streaming_dedup_state_ttl_evicts_and_reemits(spark, tmp_path):
    """state_ttl_ms bounds state at the cost of re-emitting duplicates
    that arrive after eviction: a hash unseen for the TTL is removed on
    a later micro-batch, so a later duplicate emits again. TTL mode runs
    as a CONTINUOUS query (availableNow+timeouts never self-terminates —
    the operator refuses that combination, also asserted here)."""
    import time

    import pandas as pd
    import pytest
    from defuddle_spark.spark.streaming import dedup_exact_stream

    in_dir = tmp_path / "docs"
    in_dir.mkdir()

    with pytest.raises(ValueError, match="available_now=False"):
        dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=True,
                           state_ttl_ms=1)

    def sink_ids():
        try:
            return sorted(r["doc_id"] for r in
                          spark.read.parquet(str(tmp_path / "out")).collect())
        except Exception:
            return []

    def wait_for(expect, deadline=120):
        # processAllAvailable never settles while TTL timer batches
        # re-arm, so drive the assertions by polling the sink
        end = time.time() + deadline
        while time.time() < end:
            got = sink_ids()
            if got == expect:
                return got
            time.sleep(0.5)
        return sink_ids()

    def wait_state_empty(deadline=120):
        # deterministic eviction gate: the timer batch that evicts
        # reports numRowsTotal back at 0 — no wall-clock guessing
        end = time.time() + deadline
        while time.time() < end:
            p = q.lastProgress
            so = (p or {}).get("stateOperators") or []
            if so and so[0].get("numRowsTotal") == 0:
                return
            time.sleep(0.5)
        raise AssertionError("state never drained")

    pd.DataFrame({"doc_id": [1], "text": ["alpha text"]}) \
        .to_parquet(in_dir / "b1.parquet")
    q = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=False,
                           max_files_per_trigger=1, state_ttl_ms=2000)
    try:
        assert wait_for([1]) == [1]      # (alpha, 1) emitted, timer armed
        wait_state_empty()               # timer batch fires -> alpha evicted
        pd.DataFrame({"doc_id": [9], "text": ["alpha text"]}) \
            .to_parquet(in_dir / "b3.parquet")
        # alpha unseen by state: RE-emitted after eviction
        assert wait_for([1, 9]) == [1, 9]
    finally:
        q.stop()


def test_streaming_dedup_state_ttl_refresh_suppresses(spark, tmp_path):
    """The sliding-refresh path (setTimeoutDuration on an EXISTING,
    un-updated state row) runs without executor error and keeps the
    duplicate suppressed. A long TTL isolates refresh from eviction —
    the eviction leg has its own deterministic test above."""
    import time

    import pandas as pd
    from defuddle_spark.spark.streaming import dedup_exact_stream

    in_dir = tmp_path / "docs"
    in_dir.mkdir()

    def sink_ids():
        try:
            return sorted(r["doc_id"] for r in
                          spark.read.parquet(str(tmp_path / "out")).collect())
        except Exception:
            return []

    pd.DataFrame({"doc_id": [1], "text": ["alpha text"]}) \
        .to_parquet(in_dir / "b1.parquet")
    q = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=False,
                           max_files_per_trigger=1, state_ttl_ms=300_000)
    try:
        end = time.time() + 120
        while time.time() < end and sink_ids() != [1]:
            time.sleep(0.5)
        assert sink_ids() == [1]
        pd.DataFrame({"doc_id": [6], "text": ["alpha text"]}) \
            .to_parquet(in_dir / "b2.parquet")
        # wait until the duplicate's data batch committed, then confirm
        # it stayed suppressed (a failing setTimeoutDuration would kill
        # the query and the batch would never commit)
        end = time.time() + 120
        seen = False
        while time.time() < end and not seen:
            for p in q.recentProgress:
                if p["batchId"] > 0 and p.get("numInputRows", 0) > 0:
                    seen = True
            time.sleep(0.5)
        assert seen, "duplicate batch never committed"
        time.sleep(1)
        assert sink_ids() == [1]         # suppressed, state refreshed
    finally:
        q.stop()


def test_streaming_minhash_state_ttl_evicts_bucket(spark, tmp_path):
    """A cold LSH bucket is evicted wholesale after the TTL: a later
    identical doc pairs against nothing (no pre-eviction members)."""
    import time

    import pandas as pd
    from defuddle_spark.spark.streaming import minhash_lsh_stream

    t = ("the quick brown fox jumps over the lazy dog near the river "
         "bank and beyond the far hills")
    in_dir = tmp_path / "docs"
    in_dir.mkdir()

    pd.DataFrame({"doc_id": [1], "text": [t]}).to_parquet(in_dir / "b1.parquet")
    q = minhash_lsh_stream(spark, str(in_dir), str(tmp_path / "out"),
                           str(tmp_path / "ckpt"), available_now=False,
                           max_files_per_trigger=1, state_ttl_ms=1000)
    def wait_data_batch(after_batch_id, deadline=120):
        # wait for a batch AFTER the given id that actually read rows
        # (timer batches churn with numInputRows=0 in between)
        end = time.time() + deadline
        while time.time() < end:
            for p in q.recentProgress:
                if p["batchId"] > after_batch_id and \
                        p.get("numInputRows", 0) > 0:
                    return p["batchId"]
            time.sleep(0.5)
        raise AssertionError("data batch never committed")

    def wait_state_rows(pred, what, deadline=120):
        # poll the state-row metric instead of sleeping a fixed interval
        # (ADVICE r5: on a loaded box a wall-clock gap may precede the
        # eviction batch and the test flakes)
        end = time.time() + deadline
        while time.time() < end:
            p = q.lastProgress
            so = (p or {}).get("stateOperators") or []
            if so and pred(so[0].get("numRowsTotal")):
                return
            time.sleep(0.5)
        raise AssertionError(f"state never {what}")

    try:
        bid = wait_data_batch(-1)    # doc 1 ingested, buckets populated
        # deterministic eviction gate: the timer batch reports 0 rows
        wait_state_rows(lambda n: n == 0, "drained")
        pd.DataFrame({"doc_id": [2], "text": [t]}) \
            .to_parquet(in_dir / "b2.parquet")
        wait_data_batch(bid)         # doc 2 lands in (now empty) buckets
        # doc 2's buckets registered in state => its batch fully committed
        wait_state_rows(lambda n: n and n > 0, "repopulated")
    finally:
        q.stop()

    try:
        got = {(r["id_a"], r["id_b"]) for r in
               spark.read.parquet(str(tmp_path / "out")).collect()}
    except Exception:
        got = set()              # sink may hold no files at all
    assert got == set()          # eviction: no cross-TTL pairing


def test_state_ttl_arg_guard():
    """Broken TTL configs are refused eagerly, not as opaque
    executor-side StreamingQueryExceptions."""
    import pytest
    from pyspark.sql.streaming.state import GroupStateTimeout

    from defuddle_spark.spark.streaming import _ttl_timeout_conf

    assert _ttl_timeout_conf(None, True) == GroupStateTimeout.NoTimeout
    assert _ttl_timeout_conf(1000, False) == \
        GroupStateTimeout.ProcessingTimeTimeout
    with pytest.raises(ValueError, match="positive"):
        _ttl_timeout_conf(0, False)
    with pytest.raises(ValueError, match="positive"):
        _ttl_timeout_conf(-5, False)
    with pytest.raises(ValueError, match="available_now=False"):
        _ttl_timeout_conf(1000, True)


# --------------------------------------------------------------------------
# event-time (watermark) eviction dedup — the availableNow-capable sibling
# of the processing-time TTL mode (round 6, VERDICT r5 #2)
# --------------------------------------------------------------------------

_T0 = 1_700_000_000  # epoch seconds; absolute value irrelevant, gaps matter


def _stage_ts(path, doc_ids, texts, ts_s, mtime):
    """One parquet file of (doc_id, text, ts) with a pinned mtime — the
    file source orders by modification time, so increasing mtimes make the
    batch order deterministic under maxFilesPerTrigger=1."""
    import os

    import pandas as pd
    pd.DataFrame({
        "doc_id": pd.Series(doc_ids, dtype="int64"),
        "text": texts,
        "ts": pd.to_datetime([t * 1_000_000_000 for t in ts_s]),
    }).to_parquet(path, coerce_timestamps="us")  # Spark reads µs, not ns
    os.utime(path, (mtime, mtime))


def test_streaming_dedup_watermark_reemits_after_eviction(spark, tmp_path):
    """A duplicate arriving after the watermark passed its hash's expiry
    re-emits; in-batch and in-window duplicates stay suppressed. Runs as
    ONE availableNow drain (the whole point of event-time eviction: no
    wall-clock timers, so the batch mode self-terminates)."""
    from defuddle_spark.spark.streaming import dedup_exact_stream_watermark

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    # batch 1: two docs + an in-batch dup of alpha (suppressed, min emits)
    _stage_ts(in_dir / "b0.parquet", [1, 2, 8],
              ["alpha text", "beta text", "alpha text"],
              [_T0, _T0, _T0], 1000)
    # batch 2: watermark advancer far past alpha/beta's 1h window
    _stage_ts(in_dir / "b1.parquet", [50], ["gamma text"],
              [_T0 + 100_000], 2000)
    # batch 3: dup of alpha — its state was evictable (expiry < watermark)
    _stage_ts(in_dir / "b2.parquet", [7], ["alpha text"],
              [_T0 + 100_010], 3000)

    q = dedup_exact_stream_watermark(
        spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        dedup_window_ms=3_600_000, available_now=True,
        max_files_per_trigger=1)
    assert q.awaitTermination(300)

    got = {(r["text_md5"], r["doc_id"])
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    ids = {d for _, d in got}
    assert ids == {1, 2, 50, 7}  # 8 suppressed in-batch; 7 re-emitted


def test_streaming_dedup_watermark_times_out_quiet_keys(spark, tmp_path):
    """A hash that never sees data again is evicted by its EventTimeTimeout
    once the watermark passes its expiry — state stays bounded by the live
    window, not corpus size."""
    from defuddle_spark.spark.streaming import dedup_exact_stream_watermark

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    _stage_ts(in_dir / "b0.parquet", [1], ["alpha text"], [_T0], 1000)
    _stage_ts(in_dir / "b1.parquet", [2], ["beta text"],
              [_T0 + 100_000], 2000)
    _stage_ts(in_dir / "b2.parquet", [3], ["gamma text"],
              [_T0 + 200_000], 3000)

    q = dedup_exact_stream_watermark(
        spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        dedup_window_ms=3_600_000, available_now=True,
        max_files_per_trigger=1)
    assert q.awaitTermination(300)

    ids = {r["doc_id"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert ids == {1, 2, 3}
    # alpha (and possibly beta, if a trailing batch advanced the watermark
    # once more) evicted; gamma still live — never all three retained
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert state_rows <= 2


def test_streaming_dedup_watermark_slides_expiry(spark, tmp_path):
    """Sliding semantics (matching the TTL op): a suppressed sighting
    refreshes the hash's expiry, so a third sighting inside the REFRESHED
    window is still suppressed even though the first-occurrence window
    has long passed the watermark."""
    from defuddle_spark.spark.streaming import dedup_exact_stream_watermark

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    _stage_ts(in_dir / "b0.parquet", [1], ["alpha text"], [_T0], 1000)
    # dup at +5000s: watermark (T0-1s) hasn't passed the expiry (T0+3600s)
    # -> suppressed, expiry slides to T0+8600s
    _stage_ts(in_dir / "b1.parquet", [9, 60],
              ["alpha text", "delta text"],
              [_T0 + 5_000, _T0 + 5_000], 2000)
    # dup at +6000s: watermark is now T0+4999s — PAST the first-occurrence
    # expiry but inside the slid window -> still suppressed
    _stage_ts(in_dir / "b2.parquet", [11], ["alpha text"],
              [_T0 + 6_000], 3000)

    q = dedup_exact_stream_watermark(
        spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        dedup_window_ms=3_600_000, available_now=True,
        max_files_per_trigger=1)
    assert q.awaitTermination(300)

    ids = {r["doc_id"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert ids == {1, 60}


def test_dedup_watermark_window_guard():
    import pytest

    from defuddle_spark.spark.streaming import dedup_exact_stream_watermark
    with pytest.raises(ValueError, match="dedup_window_ms"):
        dedup_exact_stream_watermark(None, "in", "out", "ckpt",
                                     dedup_window_ms=0)


def test_max_files_per_trigger_zero_rejected():
    """An explicit 0 must fail eagerly, not silently mean 'no limit' —
    in the watermark-dedup op a one-batch drain means the watermark
    never advances between staged files and eviction never runs."""
    import pytest

    from defuddle_spark.spark.streaming import _with_files_per_trigger
    assert _with_files_per_trigger("reader-sentinel", None) == "reader-sentinel"
    for bad in (0, -1):
        with pytest.raises(ValueError, match="must be positive"):
            _with_files_per_trigger("reader-sentinel", bad)


def test_rocksdb_state_store_conf_and_run(spark, tmp_path):
    """The crawl-scale state-store setup the dedup docstrings point at
    must not drift AND must actually work: ROCKSDB_STATE_CONF lands via
    the get_spark flag (shape pin), and a cross-batch stateful dedup
    runs for real under the RocksDB provider (Spark 4 bundles
    rocksdbjni) — the checkpoint's state dir then carries RocksDB zip
    snapshots/changelogs instead of HDFSBackedStateStore .delta files."""
    import os

    import pandas as pd

    from defuddle_spark.spark.session import ROCKSDB_STATE_CONF
    from defuddle_spark.spark.streaming import dedup_exact_stream

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    assert provider_key in ROCKSDB_STATE_CONF
    assert ROCKSDB_STATE_CONF[provider_key].endswith(
        "RocksDBStateStoreProvider")
    changelog_key = ("spark.sql.streaming.stateStore.rocksdb."
                     "changelogCheckpointing.enabled")
    assert ROCKSDB_STATE_CONF[changelog_key] == "true"

    # the provider is read at query start, so the shared session can be
    # switched per-checkpoint at runtime (and restored)
    old = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        in_dir = tmp_path / "docs"
        in_dir.mkdir()
        ckpt = str(tmp_path / "ckpt")
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["alpha text", "beta text"]}) \
            .to_parquet(in_dir / "batch1.parquet")
        q = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                               ckpt, available_now=True)
        q.awaitTermination(300)
        pd.DataFrame({"doc_id": [7, 3],
                      "text": ["alpha text", "gamma text"]}) \
            .to_parquet(in_dir / "batch2.parquet")
        q2 = dedup_exact_stream(spark, str(in_dir), str(tmp_path / "out"),
                                ckpt, available_now=True)
        q2.awaitTermination(300)

        got = {r["doc_id"] for r in
               spark.read.parquet(str(tmp_path / "out")).collect()}
        assert got == {1, 2, 3}  # same semantics as the default provider

        state_files = []
        for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
            state_files.extend(files)
        assert any(f.endswith(".zip") or f.endswith(".changelog")
                   for f in state_files), state_files
        assert not any(f.endswith(".delta") for f in state_files)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_get_spark_rocksdb_flag_shapes_builder():
    """get_spark(rocksdb_state_store=True) must feed every
    ROCKSDB_STATE_CONF entry into the builder — pinned via the builder
    config dict rather than a live session (getOrCreate would reuse the
    suite's session and silently skip the conf)."""
    from pyspark.sql import SparkSession

    from defuddle_spark.spark.session import ROCKSDB_STATE_CONF, get_spark

    captured = {}

    class _Recorder:
        def master(self, *_): return self
        def appName(self, *_): return self
        def config(self, k, v):
            captured[k] = v
            return self
        def getOrCreate(self):
            return "session-sentinel"

    orig = SparkSession.builder
    try:
        SparkSession.builder = _Recorder()
        assert get_spark(cores=2, rocksdb_state_store=True) \
            == "session-sentinel"
    finally:
        SparkSession.builder = orig
    for k, v in ROCKSDB_STATE_CONF.items():
        assert captured.get(k) == v


def test_streaming_pii_and_decontam_match_batch(spark, tmp_path):
    """The session's stateless corpus ops compose with readStream
    unchanged: PII redaction is a pure projection, decontamination is a
    stream-static broadcast join (the scrub-on-ingest pattern). The
    streaming results must equal the batch results row-for-row."""
    from defuddle_spark.ops.decontam import decontaminate
    from defuddle_spark.ops.pii import redact_pii

    rows = [(1, "mail jo@x.org from 10.0.0.1 please"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "clean text with nothing sensitive at all here"),
            (4, "call 555-123-4567 about alpha beta gamma delta epsilon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["bench_id", "text"])

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(in_dir))
    redacted = redact_pii(stream)
    verdicts = decontaminate(redacted, bench, n=5)

    out = {}
    for name, sdf in (("pii", redacted), ("decontam", verdicts)):
        q = (sdf.writeStream.format("memory").queryName(f"s_{name}")
             .outputMode("append" if name == "pii" else "complete")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        out[name] = {tuple(r) for r in spark.sql(
            f"select * from s_{name}").collect()}

    batch_pii = {tuple(r) for r in redact_pii(docs).collect()}
    batch_dec = {tuple(r) for r in decontaminate(docs, bench, n=5).collect()}
    assert out["pii"] == batch_pii
    assert out["decontam"] == batch_dec
