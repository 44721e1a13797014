"""applyInPandasWithState: per-host stateful counters over a page stream."""

import os

from pyspark.sql import functions as F

from ocr_processing_pipeline_spark.operators.skew import host_of
from ocr_processing_pipeline_spark.sources.corpus import make_pages
from ocr_processing_pipeline_spark.streaming.stateful import (
    streaming_host_stats)


def test_stateful_host_stats(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocr_processing_pipeline_spark.sources.corpus import PAGES_SCHEMA

    rows, _ = make_pages(150)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   os.path.join(in_dir, "b0.parquet"))

    pages = (spark.readStream
             .schema("url string, warc_ts timestamp, html binary, "
                     "text string, lang string")
             .parquet(in_dir))
    docs = (pages
            .withColumn("host", host_of(F.col("url")))
            .withColumn("n_bytes", F.length("html").cast("long"))
            .withColumn("failure_code", F.lit(""))
            .select("host", "n_bytes", "failure_code"))

    # short state timeout: AvailableNow drains until all timers fire
    q = (streaming_host_stats(docs, timeout_ms=1500)
         .writeStream.format("memory").queryName("host_stats")
         .outputMode("update").trigger(availableNow=True).start())
    # pyspark 4.1 quirk: this operator's AvailableNow drain can keep
    # issuing state-cleanup micro-batches long after all timers fired;
    # the update rows land in the first batch, so bound the wait
    import time
    deadline = time.time() + 45
    while q.isActive and time.time() < deadline:
        q.awaitTermination(timeout=5)
        if spark.sql("SELECT * FROM host_stats").count() >= 6:
            break
    if q.isActive:
        q.stop()

    rows_out = spark.sql("SELECT * FROM host_stats").collect()
    # keep the LAST emission per host (update mode emits per trigger;
    # the closed=True row is the timeout flush with final totals)
    got = {}
    for r in rows_out:
        got[r["host"]] = (r["n_pages"], r["n_bytes"])

    # batch ground truth
    batch = (spark.createDataFrame(
        [(r["url"], len(r["html"])) for r in rows], "url string, nb long")
        .withColumn("host", host_of(F.col("url")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nb").alias("b")))
    expected = {r["host"]: (r["n"], r["b"]) for r in batch.collect()}
    assert got == expected
