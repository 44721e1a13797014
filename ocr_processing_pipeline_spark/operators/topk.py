"""Top-k and per-group top-k (O1/O2 in SURVEY §2.6).

Global top-k uses orderBy+limit, which Spark executes as a per-partition
TakeOrderedAndProject — no full sort, no single-reducer bottleneck at
100 TB. Per-group top-k is the row_number window idiom; for heavy skew the
window shuffle is hash-partitioned on the group key and AQE splits skewed
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_col: str, k: int,
         ascending: bool = False, tie_break: str | None = None) -> DataFrame:
    order = [F.asc(order_col) if ascending else F.desc(order_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    return df.orderBy(*order).limit(k)


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                   k: int, ascending: bool = False,
                   tie_break: str | None = None,
                   rank_col: str = "rn") -> DataFrame:
    order = [F.asc(order_col) if ascending else F.desc(order_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


__all__ = ["topk", "topk_per_group"]
