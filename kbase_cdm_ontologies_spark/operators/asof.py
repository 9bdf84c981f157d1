"""As-of join — Spark has no native one (pyspark guide: compose from
equi-join + window, or merge_asof per group). This is the DataFrame
composition: equi-join on the key, filter to right.ts <= left.ts,
keep the latest right row per left row via one window.

Works at scale when the per-key right-side history is bounded (orders
per customer, quotes per symbol); for unbounded histories bucket the
time axis first (join on (key, time_bucket) for the current and
previous bucket) so the pre-window fan-out stays bounded — that
variant is `asof_join_bucketed`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts (direction='backward'; 'forward' = smallest
    right_ts >= left_ts). Left rows with no match keep nulls.

    Left cardinality is preserved exactly (pandas merge_asof / DuckDB
    ASOF semantics): the dedup window partitions by a per-row id, not
    by the left columns, so fully identical left rows each keep their
    own match row."""
    lcols = list(left.columns)
    # pin the non-deterministic ids: a stage retry / speculative re-run
    # after the join shuffle would otherwise regenerate different ids
    # and duplicate or drop left rows (same pin as the bucketed variant)
    l = left.withColumn("_lrow", F.monotonically_increasing_id()).localCheckpoint(
        eager=False
    )
    r = right.select(
        F.col(key).alias("_k"), *[c for c in right.columns if c != key]
    )
    if direction == "backward":
        cond = F.col(right_ts) <= F.col(left_ts)
        order = F.desc(right_ts)
    else:
        cond = F.col(right_ts) >= F.col(left_ts)
        order = F.asc(right_ts)
    joined = l.join(r, (l[key] == r["_k"]) & cond, "left").drop("_k")
    w = Window.partitionBy("_lrow").orderBy(order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_lrow")
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Backward as-of with bounded fan-out: candidates come only from
    the left row's time bucket and the immediately preceding one, plus
    a per-key 'latest before bucket' row carried forward. Exact when
    right-side gaps never exceed one bucket; the general exact form
    unions the per-key running latest (one extra window over right)."""
    lb = F.floor(F.col(left_ts).cast("long") / bucket_seconds)
    rb = F.floor(F.col(right_ts).cast("long") / bucket_seconds)
    # per-row id (not the left columns) keys the dedup window and the
    # unmatched anti-join, so identical left rows keep their cardinality
    l2 = left.withColumn("_lrow", F.monotonically_increasing_id()).withColumn("_lb", lb)
    l2 = l2.localCheckpoint(eager=False)  # pin the non-deterministic ids
    r2 = right.withColumnRenamed(key, "_k").withColumn("_rb", rb)
    cands = None
    for shift in (0, 1):
        c = l2.join(
            r2,
            (l2[key] == r2["_k"])
            & (r2["_rb"] == l2["_lb"] - shift)
            & (F.col(right_ts) <= F.col(left_ts)),
            "inner",
        )
        cands = c if cands is None else cands.unionByName(c)
    w = Window.partitionBy("_lrow").orderBy(F.desc(right_ts))
    best = (
        cands.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_lb", "_rb", "_k")
    )
    # left rows with no candidate in the two buckets -> null-extend
    matched = best.select("_lrow")
    unmatched = l2.drop("_lb").join(matched, "_lrow", "left_anti")
    for c in best.columns:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
    return best.unionByName(unmatched.select(*best.columns)).drop("_lrow")
