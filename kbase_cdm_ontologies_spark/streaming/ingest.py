"""Incremental ingest (stretch beyond the strictly-batch reference —
SURVEY.md §2.10): Structured Streaming over the events/pages feed.

The reference's only incremental notion is checksum-skip
(version_tracker.py:111-138); at web scale new WARC drops arrive
continuously, so the engine exposes a streaming path: readStream over
the landing directory -> watermarked windowed aggregates / incremental
mention extraction -> append sink. Locally a parquet directory + memory
sink drives it to completion synchronously (processAllAvailable).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    window_minutes: int = 5,
    watermark_minutes: int = 10,
) -> DataFrame:
    """Run a watermarked windowed count over the events table as a
    stream (file source), drain it, and return the final batch result:
    (window_start string, event_type, n, total_value)."""
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import os

    reader = spark.readStream.schema(schema).format("parquet")
    if events_dir.endswith(".parquet") and os.path.isfile(events_dir):
        # file source needs a directory: point at the parent + glob
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    stream = (
        reader.load(events_dir)
        .withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.window("ts", f"{window_minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    qname = f"evt_{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS window_start, "
        f"event_type, n, total_value FROM {qname}"
    )


def streaming_dedup(
    spark: SparkSession,
    events_dir: str,
    watermark_minutes: int = 60,
) -> DataFrame:
    """Streaming exact dedup over the event feed:
    dropDuplicatesWithinWatermark on a content key — the streaming
    analog of exact_duplicates for continuously-landing WARC drops.
    State stays bounded by the watermark horizon (Spark evicts dedup
    state older than the watermark), which is what makes exact dedup
    viable on an unbounded 10^12-doc feed: re-crawls inside the horizon
    dedup exactly; older re-crawls are handled by the batch
    incremental anti-join (plans/incremental.py). Returns the drained
    deduplicated batch: (event_id, ts string, content_key) plus the
    key's own inputs (user_id, event_type, value_cents). WHICH
    duplicate survives is arrival-order dependent, so event_id/ts are
    nondeterministic — but the key-determined columns are a pure
    function of the data (one row per distinct key when the feed fits
    one watermark horizon), which is what the oracle checks."""
    import os

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if events_dir.endswith(".parquet") and os.path.isfile(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    # content key: duplicates = same (user, type, value-cents) burst —
    # the fixture's stand-in for same (url, content-sha) page
    # re-crawls. Cents (bigint) rather than a rounded double keeps the
    # key string free of double-rendering differences across engines.
    stream = (
        reader.load(events_dir)
        .withColumn(
            "value_cents", F.round(F.col("value") * 100).cast("long")
        )
        .withColumn(
            "content_key",
            F.md5(F.concat_ws("|", "user_id", "event_type", "value_cents")),
        )
        .withWatermark("ts", f"{watermark_minutes} minutes")
        .dropDuplicatesWithinWatermark(["content_key"])
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "content_key",
            "user_id",
            "event_type",
            "value_cents",
        )
    )
    qname = f"dedup_{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT event_id, ts, content_key, user_id, event_type, value_cents "
        f"FROM {qname}"
    )
