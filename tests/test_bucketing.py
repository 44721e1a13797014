"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the chunks↔docs and chunks↔edges joins repeat across jobs; both
sides bucketed on doc_id join with ZERO Exchange (the shuffle is paid once
at write). This test proves the plan shape locally.
"""

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("lang_id"))
    chunks = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("doc_id"),
        F.col("id").alias("chunk_no"))

    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_chunks")
    (docs.write.mode("overwrite").bucketBy(8, "doc_id")
     .sortBy("doc_id").saveAsTable("b_docs"))
    (chunks.write.mode("overwrite").bucketBy(8, "doc_id")
     .sortBy("doc_id").saveAsTable("b_chunks"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("b_chunks")
                  .join(spark.table("b_docs"), "doc_id"))
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, (
            "bucketed join must not shuffle:\n" + p)
        # and it computes the right thing
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_chunks")
