"""Structured Streaming: incremental extraction + event-time operators."""

import os
import shutil

from pyspark.sql import functions as F

from ocr_processing_pipeline_spark.extractor.core import extract_page
from ocr_processing_pipeline_spark.sources.corpus import make_pages
from ocr_processing_pipeline_spark.streaming.availablenow import (
    sessionize_events, stream_extract_pages, windowed_event_counts)

SF_DIR = "/root/testdata/sf0.001"


def _write_pages_batch(spark, rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocr_processing_pipeline_spark.sources.corpus import PAGES_SCHEMA
    os.makedirs(path, exist_ok=True)
    n = len(os.listdir(path))
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   os.path.join(path, f"batch-{n:04d}.parquet"))


def test_available_now_incremental_extract(spark, tmp_path):
    """Two triggers over a growing directory: each file processed exactly
    once; output byte-identical to the oracle (streaming path included)."""
    pages_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    rows, _ = make_pages(80)
    _write_pages_batch(spark, rows[:50], pages_dir)
    q = stream_extract_pages(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()

    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 50

    # new files arrive; second AvailableNow trigger drains only them
    _write_pages_batch(spark, rows[50:], pages_dir)
    q2 = stream_extract_pages(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination()

    got = {r["url"]: r["text"] for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 80                      # no duplicates, no gaps
    for r in rows:
        assert got[r["url"]] == extract_page(r["html"], r["text"]).text


def _events_stream_dir(tmp_path) -> str:
    d = str(tmp_path / "events_stream")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(d, "e.parquet"))
    return d


def test_windowed_event_counts_streaming(spark, tmp_path):
    """Drive the watermarked window agg with the events table as a file
    stream; compare against the equivalent batch aggregation."""
    events_path = f"{SF_DIR}/events.parquet"
    batch = spark.read.parquet(events_path)

    stream = (spark.readStream.schema(batch.schema)
              .parquet(_events_stream_dir(tmp_path)))
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "SELECT win.start AS ws, event_type, n FROM win_counts")

    expected = (batch
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .groupBy(F.window("ts", "5 minutes").alias("win"),
                         "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("win.start").alias("ws"), "event_type", "n"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, expected.collect()))


def test_sessionize_events_streaming(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stream = (spark.readStream.schema(batch.schema)
              .parquet(_events_stream_dir(tmp_path)))
    q = (sessionize_events(stream)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    sessions = spark.sql("SELECT * FROM sessions")
    n = sessions.count()
    assert n > 0
    # sessions are per-user, non-overlapping, gap-bounded
    row = sessions.select("user_id", "n_events").first()
    assert row["n_events"] >= 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Planted duplicate event_ids across two files: the streaming dedup
    keeps exactly one row per key (bounded state via the watermark)."""
    from ocr_processing_pipeline_spark.streaming.availablenow import (
        dedup_events_within_watermark)
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    d = str(tmp_path / "dup_stream")
    os.makedirs(d, exist_ok=True)
    batch.write.mode("overwrite").parquet(os.path.join(d, "a.parquet"))
    # the SAME 200 events again: every key is a duplicate
    batch.write.mode("overwrite").parquet(os.path.join(d, "b.parquet"))

    stream = (spark.readStream.schema(batch.schema)
              .parquet(d + "/*/"))
    deduped = dedup_events_within_watermark(stream, ["event_id"],
                                            watermark="365 days")
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_out")
    n_keys = batch.select("event_id").distinct().count()
    assert got.count() == n_keys
    assert got.distinct().count() == n_keys


def test_sliding_window_counts_streaming(spark, tmp_path):
    """Sliding (overlapping) windows on the stream must equal the batch
    expansion — the streaming twin of the sliding_window_counts oracle
    query (each event lands in window/slide = 2 windows)."""
    events_path = f"{SF_DIR}/events.parquet"
    batch = spark.read.parquet(events_path)

    stream = (spark.readStream.schema(batch.schema)
              .parquet(_events_stream_dir(tmp_path)))
    agg = windowed_event_counts(stream, window="10 minutes",
                                slide="5 minutes")
    q = (agg.writeStream.format("memory").queryName("slide_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "SELECT win.start AS ws, event_type, n FROM slide_counts")

    expected = (batch
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .groupBy(F.window("ts", "10 minutes", "5 minutes")
                         .alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("win.start").alias("ws"), "event_type", "n"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, expected.collect()))


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Continuous-crawl ingest dedup: files arriving across two
    AvailableNow triggers, decided against the static materialized
    index, must produce byte-identical verdicts to ONE batch run of
    incremental_dedup over all the docs (verdicts are batch-invariant:
    new-vs-existing only), with each file processed exactly once."""
    from ocr_processing_pipeline_spark.operators.dedup import (
        band_keys, fingerprint, incremental_dedup, minhash_signatures,
        shingles)
    from ocr_processing_pipeline_spark.streaming.availablenow import (
        stream_incremental_dedup)

    body = " ".join(f"tok{i}" for i in range(30))
    existing = spark.createDataFrame(
        [(100, body), (101, " ".join(f"old{i}" for i in range(30)))],
        "doc_id long, text string")
    new_rows = [(200, body),                        # exact dup of 100
                (201, body.replace("tok7", "zz")),  # near dup of 100
                (202, " ".join(f"new{i}" for i in range(30))),
                (203, " ".join(f"other{i}" for i in range(25)))]

    # materialize the index like dedup_index_dir does (incl. params.json)
    import json
    idx = str(tmp_path / "index")
    os.makedirs(idx)
    (existing.select(F.col("doc_id").alias("key"),
                     fingerprint(F.col("text")).alias("fp"))
     .write.parquet(os.path.join(idx, "fingerprints.parquet")))
    (band_keys(minhash_signatures(
        shingles(existing, "text", "doc_id"), 4), 4, 2, 10000)
     .write.parquet(os.path.join(idx, "bands.parquet")))
    with open(os.path.join(idx, "params.json"), "w") as fh:
        json.dump({"n": 3, "num_hashes": 4, "band_size": 2}, fh)

    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "verdicts")
    data_dir = os.path.join(out_dir, "data")
    ckpt = str(tmp_path / "sid_ckpt")
    os.makedirs(in_dir)
    mk = spark.createDataFrame
    mk(new_rows[:2], "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(in_dir)
    stream_incremental_dedup(spark, in_dir, idx, existing, out_dir,
                             ckpt).awaitTermination()
    assert spark.read.parquet(data_dir).count() == 2

    # mismatched MinHash params must be rejected (a silent mismatch
    # would band-collide nothing and pass every near-dup as unique)
    import pytest
    with pytest.raises(ValueError, match="num_hashes"):
        stream_incremental_dedup(spark, in_dir, idx, existing, out_dir,
                                 ckpt, num_hashes=8)

    # late files: second trigger drains ONLY them (no re-decisions)
    mk(new_rows[2:], "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(in_dir)
    stream_incremental_dedup(spark, in_dir, idx, existing, out_dir,
                             ckpt).awaitTermination()

    streamed = sorted(
        (r.key, r.canonical, r.match_kind)
        for r in spark.read.parquet(data_dir).collect())
    batch = sorted(
        (r.key, r.canonical, r.match_kind)
        for r in incremental_dedup(
            mk(new_rows, "doc_id long, text string"), existing,
            "text", "doc_id", num_hashes=4, band_size=2).collect())
    assert streamed == batch
    assert ( (200, 100, "exact") in streamed
             and (201, 100, "near") in streamed
             and (202, 202, "unique") in streamed)
