"""FIXTURES.md §4: the monitoring-join fixture.

Reproduces the reference's codecarbon attribution pipeline
(Monitoring/log_parser.py): log lines carry doc transitions; emissions
rows have no doc_id and must inherit the latest transition at-or-before
their timestamp (W7 forward-fill / J3 as-of)."""

from pyspark.sql import functions as F

from ocr_processing_pipeline_spark.operators.asof import (
    asof_join_backward, change_points, forward_fill)


def _metrics_fixture(spark):
    # emissions rows: (ts, duration, energy), doc_id unknown
    metrics = spark.createDataFrame(
        [("2024-01-01 10:00:05", 5.0, 0.001),
         ("2024-01-01 10:00:20", 15.0, 0.002),
         ("2024-01-01 10:01:10", 50.0, 0.010),
         ("2024-01-01 10:02:30", 80.0, 0.020),
         ("2024-01-01 09:59:59", 1.0, 0.0001)],   # before any transition
        "ts_s string, duration double, energy double"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"),
             "duration", "energy").withColumn("run", F.lit("r1"))
    # log transitions: doc starts (chunk_root changes)
    transitions = spark.createDataFrame(
        [("2024-01-01 10:00:00", "doc_a"),
         ("2024-01-01 10:01:00", "doc_b"),
         ("2024-01-01 10:02:00", "doc_c")],
        "ts_s string, doc_id string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "doc_id") \
        .withColumn("run", F.lit("r1"))
    return metrics, transitions


def test_asof_attribution(spark):
    metrics, transitions = _metrics_fixture(spark)
    out = asof_join_backward(metrics, transitions, on="run",
                             left_ts="ts", right_ts="ts",
                             value_cols=["doc_id"])
    got = {r["ts"].isoformat(): r["doc_id"] for r in out.collect()}
    assert got["2024-01-01T10:00:05"] == "doc_a"
    assert got["2024-01-01T10:00:20"] == "doc_a"
    assert got["2024-01-01T10:01:10"] == "doc_b"
    assert got["2024-01-01T10:02:30"] == "doc_c"
    assert got["2024-01-01T09:59:59"] is None      # no prior transition


def test_change_points_and_forward_fill(spark):
    """W7: detect doc transitions from a noisy per-line log, then
    propagate doc_id forward (log_parser.py:23-35, 53-72)."""
    log = spark.createDataFrame(
        [(1, "doc_a"), (2, "doc_a"), (3, "doc_b"), (4, "doc_b"),
         (5, "doc_b"), (6, "doc_a")],
        "line int, chunk_root string").withColumn("run", F.lit("r1"))
    cps = change_points(log, key="run", order_by="line",
                        watch_col="chunk_root")
    assert [r["line"] for r in cps.orderBy("line").collect()] == [1, 3, 6]

    sparse = spark.createDataFrame(
        [(1, "doc_a"), (2, None), (3, None), (4, "doc_b"), (5, None)],
        "line int, doc_id string").withColumn("run", F.lit("r1"))
    filled = forward_fill(sparse, key="run", order_by="line",
                          fill_col="doc_id")
    assert [r["doc_id"] for r in filled.orderBy("line").collect()] == \
        ["doc_a", "doc_a", "doc_a", "doc_b", "doc_b"]


def test_per_doc_aggregation_after_attribution(spark):
    """J2/A7: the aggregator join — per-doc totals from attributed rows
    (Monitoring/aggregator.py:23-47)."""
    metrics, transitions = _metrics_fixture(spark)
    attributed = asof_join_backward(metrics, transitions, on="run",
                                    left_ts="ts", right_ts="ts",
                                    value_cols=["doc_id"])
    per_doc = (attributed.filter(F.col("doc_id").isNotNull())
               .groupBy("doc_id")
               .agg(F.round(F.sum("duration"), 3).alias("total_duration"),
                    F.round(F.sum("energy"), 6).alias("total_energy"),
                    F.count(F.lit(1)).alias("n_rows")))
    got = {r["doc_id"]: (r["total_duration"], r["n_rows"])
           for r in per_doc.collect()}
    assert got == {"doc_a": (20.0, 2), "doc_b": (50.0, 1),
                   "doc_c": (80.0, 1)}
