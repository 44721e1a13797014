"""foreachBatch exactly-once sink: replayed batches don't duplicate."""

import os

from ocr_processing_pipeline_spark.pipeline.extract import extract_docs
from ocr_processing_pipeline_spark.sources.corpus import make_pages
from ocr_processing_pipeline_spark.streaming.availablenow import PAGES_DDL
from ocr_processing_pipeline_spark.streaming.sinks import (
    idempotent_parquet_sink)


def test_exactly_once_under_replay(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocr_processing_pipeline_spark.sources.corpus import PAGES_SCHEMA

    rows, _ = make_pages(60)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   os.path.join(in_dir, "b0.parquet"))

    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out)

    def run():
        pages = spark.readStream.schema(PAGES_DDL).parquet(in_dir)
        q = (extract_docs(pages).drop("spans")
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(os.path.join(out, "data")).count()
    assert n1 == 60

    # simulate a replay: call the sink again with the same batch data
    batch_df = spark.read.parquet(os.path.join(out, "data"))
    sink(batch_df, 0)      # batch_id 0 already committed → no-op
    assert spark.read.parquet(os.path.join(out, "data")).count() == 60

    # a NEW batch id writes normally
    sink(batch_df.limit(5), 1)
    assert spark.read.parquet(os.path.join(out, "data")).count() == 65
