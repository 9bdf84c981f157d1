"""Table IO: Iceberg when a catalog is configured, Parquet otherwise.

The reference persists every stage as files on disk (OWL / TSV / SQLite /
Parquet — reference scripts/create_parquet_files.py:62-99). The engine's
stage boundary is a table commit: ``write_table`` targets an Iceberg
catalog when one is on the classpath (production: 10^12-doc pages table,
partitioned), and falls back to plain Parquet directories (this sandbox —
no Iceberg jars, see pyspark guide). Either way readers see one API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None)) and (
            "iceberg" in str(spark.conf.get("spark.sql.catalog.spark_catalog"))
        )
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path_or_name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a stage output table.

    At 100 TB the pages table is partitioned by a url-hash bucket (and
    optionally warc_ts date) so downstream per-url joins co-locate;
    small dimension tables (alias, prefix) are written unpartitioned and
    broadcast on read.
    """
    spark = df.sparkSession
    if _iceberg_available(spark) and "/" not in path_or_name:
        writer = df.writeTo(path_or_name)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path_or_name)


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 32
) -> None:
    """Bucketed managed table: later equi-joins/aggregations on `key`
    between tables bucketed the same way run WITHOUT a shuffle — the
    co-location strategy for the pages/findings tables at 100 TB
    (Iceberg: bucket(N, key) partition transform; Hive layout here)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, path_or_name: str) -> DataFrame:
    if _iceberg_available(spark) and "/" not in path_or_name:
        return spark.read.table(path_or_name)
    return spark.read.parquet(path_or_name)
