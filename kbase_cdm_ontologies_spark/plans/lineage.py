"""Run-history lineage — the DataFrame analog of the reference's
version tracker (scripts/version_tracker.py): an append-only log of
(entity, checksum, stamped-at), per-entity version-history folds, and
last-N tail views (scripts/version_manager.py:152 reads the last 20
log lines; :190-198 keeps the N newest backups).

Timestamps come from the data (max warc_ts of the batch), never the
wall clock, so lineage is deterministic and replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import read_table

LOG_SCHEMA = "entity string, checksum string, stamped_at timestamp, size_bytes long"


class VersionLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "version_log")

    def append(self, entries: DataFrame) -> None:
        """entries(entity, checksum, stamped_at, size_bytes) appended
        (reference analog: the download-log append,
        version_tracker.py:59-73)."""
        entries.select("entity", "checksum", "stamped_at", "size_bytes").write.mode(
            "append"
        ).parquet(self.path)

    def log(self) -> DataFrame:
        return read_table(self.spark, self.path)

    def current_versions(self) -> DataFrame:
        """Latest checksum per entity + the folded version_history list
        (reference version_tracker.py:86-101: previous_checksum +
        version_history[])."""
        w = Window.partitionBy("entity").orderBy(F.desc("stamped_at"), F.desc("checksum"))
        ordered = self.log().withColumn("_rn", F.row_number().over(w))
        history = (
            self.log()
            .groupBy("entity")
            .agg(
                F.reverse(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("stamped_at", "checksum"))
                        ),
                        lambda s: s["checksum"],
                    )
                ).alias("version_history")
            )
        )
        return (
            ordered.where(F.col("_rn") == 1)
            .select("entity", "checksum", "stamped_at", "size_bytes")
            .join(history, "entity")
            .withColumn(
                "previous_checksum",
                F.try_element_at(F.col("version_history"), F.lit(2)),
            )
        )


def last_n(df: DataFrame, order_col: str, n: int, per: str | None = None) -> DataFrame:
    """Newest-N rows, optionally per group — the last-20-log-lines /
    keep-N-backups pattern."""
    w = (
        Window.partitionBy(per).orderBy(F.desc(order_col))
        if per
        else Window.partitionBy(F.lit(1)).orderBy(F.desc(order_col))
    )
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n).drop("_rn")


def changed_entities(log_df: DataFrame, candidates: DataFrame) -> DataFrame:
    """Entities whose checksum differs from the latest logged one (or
    were never logged) — the re-download decision
    (version_tracker.py:111-138)."""
    w = Window.partitionBy("entity").orderBy(F.desc("stamped_at"))
    latest = (
        log_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("entity", F.col("checksum").alias("prev_checksum"))
    )
    return (
        candidates.join(latest, "entity", "left")
        .where(
            F.col("prev_checksum").isNull()
            | (F.col("checksum") != F.col("prev_checksum"))
        )
        .select(*candidates.columns)
    )
