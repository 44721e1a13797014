"""Incremental streaming variants of the pipeline.

The reference is strictly batch (SURVEY §2.9); its only incremental
behavior is the processed-documents ledger. Structured Streaming with
``Trigger.AvailableNow`` subsumes that ledger natively: the stream
checkpoint tracks which input files are done, each trigger drains all
currently-available files and stops — a crash-safe incremental ingest with
exactly-once file tracking, complementary to the batch anti-join resume
(pipeline/lineage.py) which works at row/bucket granularity.

Also provides the generic event-time operators a streaming corpus feed
needs: watermarked tumbling-window counts and gap-based sessionization
(session_window) — late data handled by the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.extract import extract_docs

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def stream_extract_pages(spark: SparkSession, pages_dir: str, out_dir: str,
                         checkpoint_dir: str,
                         max_files_per_trigger: int | None = None):
    """Incrementally extract newly-arrived page files → docs parquet.

    Returns the started StreamingQuery (caller awaits termination).
    Re-running after new files land processes ONLY the new files — the
    streaming analogue of the batch bucket-resume.
    """
    reader = (spark.readStream.schema(PAGES_DDL))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    pages = reader.parquet(pages_dir)
    docs = extract_docs(pages).drop("spans")
    return (docs.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(events: DataFrame,
                          watermark: str = "10 minutes",
                          window: str = "5 minutes",
                          slide: str | None = None) -> DataFrame:
    """Watermarked window counts per event_type (late data beyond the
    watermark is dropped; state is bounded). ``slide`` (default None =
    tumbling) makes the windows overlap — each event lands in
    window/slide concurrent windows, which multiplies state size by the
    same factor (the documented cost of sliding windows on a stream)."""
    win = (F.window("ts", window) if slide is None
           else F.window("ts", window, slide))
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(win.alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total_value")))


def sessionize_events(events: DataFrame,
                      watermark: str = "10 minutes",
                      gap: str = "5 minutes") -> DataFrame:
    """Gap-based sessionization per user (session_window) — the streaming
    generalization of the chunker's 'new chunk on boundary' fold (W3)."""
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("session"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts")))


def dedup_events_within_watermark(events: DataFrame,
                                  keys: list[str] | None = None,
                                  watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup (the F10 first-seen-wins family on a stream):
    dropDuplicatesWithinWatermark keeps state only for the watermark
    horizon, so the dedup ledger is bounded — the unbounded-state
    dropDuplicates would OOM on an endless crawl feed."""
    keys = keys or ["event_id"]
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


DOCS_DDL = "doc_id long, text string"


def stream_incremental_dedup(spark: SparkSession, new_docs_dir: str,
                             index_dir: str, existing_docs: DataFrame,
                             out_dir: str, checkpoint_dir: str, *,
                             min_jaccard: float = 0.5,
                             n: int | None = None,
                             num_hashes: int | None = None,
                             band_size: int | None = None):
    """Streaming ingest dedup: newly-arrived doc files are decided
    against the existing corpus's MATERIALIZED index (fingerprints +
    MinHash band keys from ``dedup_index_dir``) and the verdicts
    written — the continuous-crawl shape of ``incremental_dedup``.

    Trigger.AvailableNow + foreachBatch: the stream checkpoint gives
    exactly-once FILE tracking (a re-run drains only files that arrived
    since), and each micro-batch runs the full batch operator against
    the static index — the canonical Structured-Streaming pattern for
    per-element decisions that need batch-only plans (multi-step aggs +
    self-joins are not expressible as a raw stream-static join). The
    verdict write goes through ``idempotent_parquet_sink`` (per-batch
    overwrite + ledger marker), because foreachBatch delivery is
    AT-LEAST-ONCE — a crash between the data write and the epoch commit
    replays the batch, and a plain append would duplicate its rows.
    Verdicts land under ``{out_dir}/data/batch_id=N/``.

    MinHash parameters come from the index's own ``params.json`` (written
    by dedup_index_dir): band keys from mismatched (n, num_hashes,
    band_size) never join, so every near-dup would silently come back
    'unique'. Explicit arguments that contradict the recorded params
    raise; indexes without the params file fall back to the explicit
    arguments / operator defaults.

    Verdicts are BATCH-INVARIANT: a doc's verdict depends only on (doc,
    existing corpus), never on its micro-batch peers (incremental_dedup
    decides new-vs-EXISTING only, by contract), so any file→batch split
    yields byte-identical output to one big batch — pinned by the
    stream==batch parity test.

    Returns the started StreamingQuery (caller awaits termination)."""
    import json

    from ..operators.dedup import INDEX_BUILD_PARAMS, incremental_dedup
    from .sinks import idempotent_parquet_sink
    # fallback for params-less indexes is the SHARED build constant —
    # what dedup_index_dir actually writes — not the dedup module's
    # generic default of 8 hashes: an 8-hash probe against a 4-hash
    # index only works by the accident that md5-lane h0..h3 is a prefix
    # of the 8-hash family (and pays double signature hashing even then)
    params = {k: INDEX_BUILD_PARAMS[k]
              for k in ("n", "num_hashes", "band_size")}
    pfile = os.path.join(index_dir, "params.json")
    recorded = None
    if os.path.exists(pfile):
        with open(pfile) as fh:
            recorded = json.load(fh)
        params.update(recorded)
    for name, given in (("n", n), ("num_hashes", num_hashes),
                        ("band_size", band_size)):
        if given is None:
            continue
        if recorded is not None and name in recorded \
                and recorded[name] != given:
            raise ValueError(
                f"index at {index_dir} was built with {name}="
                f"{recorded[name]}; stream invoked with {name}={given}. "
                "Mismatched MinHash parameters never band-collide — "
                "every near-dup would silently pass as unique.")
        params[name] = given

    fps = spark.read.parquet(os.path.join(index_dir,
                                          "fingerprints.parquet"))
    bands = spark.read.parquet(os.path.join(index_dir, "bands.parquet"))
    sink = idempotent_parquet_sink(out_dir)

    def decide(batch: DataFrame, batch_id: int) -> None:
        sink(incremental_dedup(batch, existing_docs, "text", "doc_id",
                               n=params["n"], min_jaccard=min_jaccard,
                               num_hashes=params["num_hashes"],
                               band_size=params["band_size"],
                               existing_fingerprints=fps,
                               existing_band_index=bands), batch_id)

    return (spark.readStream.schema(DOCS_DDL).parquet(new_docs_dir)
            .writeStream
            .foreachBatch(decide)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


__all__ = ["stream_extract_pages", "windowed_event_counts",
           "sessionize_events", "dedup_events_within_watermark",
           "stream_incremental_dedup", "PAGES_DDL", "DOCS_DDL"]
