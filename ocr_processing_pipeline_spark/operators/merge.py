"""MERGE INTO emulation (upsert / row-level delete) without Delta/Iceberg.

K7 in SURVEY §2.1: the reference deletes duplicate objects by id
(deduplicate.py:25-26) and drops collections. With Iceberg this is
``MERGE INTO … WHEN MATCHED``; on the parquet fallback we emulate with the
standard anti-join + union rewrite (guide: "CDC/SCD2 → emulate with
anti-join + union + window"):

    upsert(target, source, key) = source ∪ (target ⟕anti source)
    delete(target, tombstones)  = target ⟕anti tombstones

Deterministic, one shuffle each, and expressible in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Source rows win on key collision; unmatched target rows survive."""
    survivors = target.join(source.select(*key_cols).distinct(),
                            key_cols, "left_anti")
    return source.unionByName(survivors)


def merge_delete(target: DataFrame, tombstones: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Row-level delete by key (K7)."""
    return target.join(tombstones.select(*key_cols).distinct(),
                       key_cols, "left_anti")


__all__ = ["merge_upsert", "merge_delete"]
