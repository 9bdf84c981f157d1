"""SCD2 (slowly-changing-dimension) merge without a MERGE INTO sink —
the anti-join + union + window emulation (pyspark guide: "CDC / SCD2 —
emulate with anti-join + union + window" when no Delta/Iceberg MERGE
is available). The engine uses it for versioned dimension tables
(alias dictionary revisions, prefix-table updates) where history must
stay queryable.

Table shape: key cols + attribute cols + (valid_from timestamp,
valid_to timestamp nullable, is_current boolean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """First load: every row current from its snapshot timestamp."""
    return snapshot.select(
        *[c for c in snapshot.columns if c != ts_col],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension:

    - changed/new keys: close the old current row (valid_to = change
      ts) and append the new version
    - unchanged keys (identical attribute values): no-op
    - rows for keys not in the batch: untouched
    """
    attr_cols = [
        c for c in dim.columns
        if c not in keys + ["valid_from", "valid_to", "is_current"]
    ]
    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    ch = changes.select(
        *keys,
        *[F.col(c).alias(f"_new_{c}") for c in attr_cols],
        F.col(ts_col).alias("_ts"),
    )
    joined = cur.join(ch, keys, "full")
    is_change = F.col("_ts").isNotNull() & (
        F.col("valid_from").isNull()  # brand-new key
        | ~F.concat_ws("\x00", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in attr_cols]).eqNullSafe(
            F.concat_ws("\x00", *[F.coalesce(F.col(f"_new_{c}").cast("string"), F.lit("")) for c in attr_cols])
        )
    )
    # untouched current rows (no change row, or identical values)
    untouched = joined.where(~is_change & F.col("valid_from").isNotNull()).select(dim.columns)
    # closed-out versions of changed keys
    closed = (
        joined.where(is_change & F.col("valid_from").isNotNull())
        .select(
            *keys,
            *attr_cols,
            "valid_from",
            F.col("_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # new current versions
    fresh = (
        joined.where(is_change)
        .select(
            *keys,
            *[F.col(f"_new_{c}").alias(c) for c in attr_cols],
            F.col("_ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return hist.select(dim.columns).unionByName(untouched).unionByName(closed).unionByName(fresh)


def as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD2 dimension."""
    t = F.lit(ts)
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
