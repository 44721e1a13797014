"""Table catalog: Iceberg when the runtime has it, parquet layout otherwise.

The north rule targets Iceberg tables (ACID appends, snapshot-based
resume, partition evolution). This sandbox image ships no Iceberg jars, so
the engine is written against this thin catalog facade:

- ``IcebergCatalog``: real Iceberg (``spark.sql`` DDL + ``writeTo``
  appends/overwritePartitions, one atomic commit per bucket group). Gated
  behind a capability probe; used automatically when
  ``spark.sql.catalog.*`` is configured and the classes resolve.
- ``ParquetCatalog``: directory-of-parquet fallback with the same call
  surface; atomicity approximated by dynamic partition overwrite +
  checkpoint-last ordering (pipeline/lineage.py), which tests prove is
  idempotent under re-runs.

On a real cluster, flipping the pipeline to Iceberg is a session-config
change, not a code change:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """Capability probe: can this session load Iceberg's SparkCatalog?"""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class ParquetCatalog:
    """Directory-of-parquet tables with the engine's write discipline."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def exists(self, name: str) -> bool:
        import os
        p = self.path(name)
        return os.path.exists(p) and bool(os.listdir(p))

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_col: str = "bucket") -> None:
        """Idempotent per-partition replace (the resume write primitive)."""
        (df.write.mode("overwrite").partitionBy(partition_col)
         .parquet(self.path(name)))

    def append(self, df: DataFrame, name: str,
               partition_col: str | None = None) -> None:
        """Append; MUST pass partition_col when the table was created
        partitioned (flat files inside a partitioned layout are invisible
        to partition discovery)."""
        w = df.write.mode("append")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(self.path(name))


class IcebergCatalog:
    """Same surface over real Iceberg tables (requires jars + catalog conf).

    overwrite_partitions → ``overwritePartitions()`` and append →
    ``append()`` are each ONE Iceberg snapshot commit — crash-consistent
    without the checkpoint-last ordering the parquet fallback needs.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")

    def _tbl(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self._tbl(name))

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_col: str = "bucket") -> None:
        tbl = self._tbl(name)
        if not self.exists(name):
            (df.writeTo(tbl).partitionedBy(partition_col)
             .using("iceberg").create())
        else:
            df.writeTo(tbl).overwritePartitions()

    def append(self, df: DataFrame, name: str,
               partition_col: str | None = None) -> None:
        tbl = self._tbl(name)
        if not self.exists(name):
            w = df.writeTo(tbl).using("iceberg")
            if partition_col is not None:
                w = w.partitionedBy(partition_col)
            w.create()
        else:
            df.writeTo(tbl).append()


def get_catalog(spark: SparkSession, root: str,
                iceberg_catalog: str | None = None,
                namespace: str = "lake"):
    """Pick the best available backend (Iceberg if probed, else parquet)."""
    if iceberg_catalog and iceberg_available(spark):
        return IcebergCatalog(spark, iceberg_catalog, namespace)
    return ParquetCatalog(spark, root)


__all__ = ["get_catalog", "iceberg_available", "ParquetCatalog",
           "IcebergCatalog"]
