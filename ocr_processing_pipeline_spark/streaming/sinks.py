"""Exactly-once streaming sinks via foreachBatch.

Structured Streaming's file sinks are append-only; the engine's bucketed
dynamic-overwrite layout (pipeline/lineage.py) needs a custom sink. The
standard recipe: ``foreachBatch`` + an idempotence ledger keyed by
``batch_id`` — a replayed micro-batch (checkpoint recovery re-delivers the
last uncommitted batch) is skipped if its batch_id is already committed,
giving exactly-once table contents on top of at-least-once delivery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str, subdir: str = "data"):
    """Returns a foreachBatch function writing each micro-batch to its own
    committed subdirectory exactly once.

    Layout: ``{out_dir}/{subdir}/batch_id=N/*.parquet`` + a ledger marker
    ``{out_dir}/_committed/N`` written AFTER the data: a crash between
    write and marker re-runs the batch, whose rewrite replaces the same
    directory (overwrite) — no duplicates either way.
    """
    data_root = os.path.join(out_dir, subdir)
    ledger = os.path.join(out_dir, "_committed")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, str(batch_id))
        if os.path.exists(marker):
            return  # replayed batch: already fully committed
        (df.write.mode("overwrite")
         .parquet(os.path.join(data_root, f"batch_id={batch_id}")))
        os.makedirs(ledger, exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok\n")

    return write_batch


__all__ = ["idempotent_parquet_sink"]
