"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState`` — the engine's demonstration of arbitrary
state on a stream (the reference is strictly batch; SURVEY.md §2.10
marks streaming as the engine's incremental-ingest extension).

Semantics: events keyed by user_id; a session closes when no event
arrives within `gap_minutes` of the last one (event-time, tracked in
state; timeout closes the session when the watermark passes). Output:
one row per closed session (user_id, session_start, session_end,
n_events, total_value).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double, closed_by string"
)
STATE_SCHEMA = "start long, last long, n int, total double"

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _sessionize(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # closed_by distinguishes deterministic closures (a later event
        # arrived past the gap — a pure function of the data) from
        # timeout flushes (emitted only when a later batch advances the
        # watermark — arrival/batching dependent). Downstream oracles
        # filter to 'gap'.
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                closed.append((user_id, start, last, n, total, "timeout"))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            events = sorted(
                zip(
                    (rows["ts"].astype("int64") // 1_000_000).tolist(),  # ms
                    rows["value"].astype(float).tolist(),
                )
            )
            if state.exists:
                start, last, n, total = state.get
            else:
                start, last, n, total = None, None, 0, 0.0
            for t, v in events:
                if start is None:
                    start, last, n, total = t, t, 1, v
                elif t - last > gap_ms:
                    closed.append((user_id, start, last, n, total, "gap"))
                    start, last, n, total = t, t, 1, v
                else:
                    last, n, total = max(last, t), n + 1, total + v
            state.update((int(start), int(last), int(n), float(total)))
            state.setTimeoutTimestamp(int(last) + gap_ms)
        out = pd.DataFrame(
            closed,
            columns=["user_id", "start", "last", "n_events", "total_value", "closed_by"],
        )
        yield pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "session_start": pd.to_datetime(out["start"], unit="ms"),
                "session_end": pd.to_datetime(out["last"], unit="ms"),
                "n_events": out["n_events"].astype("int32"),
                "total_value": out["total_value"].round(2),
                "closed_by": out["closed_by"].astype(str),
            }
        )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """Run the stateful sessionizer over the events table as a file
    stream; drain and return closed sessions."""
    import os

    reader = spark.readStream.schema(_EVENTS_SCHEMA).format("parquet")
    if events_dir.endswith(".parquet") and os.path.isfile(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    sessions = (
        reader.load(events_dir)
        .withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize(gap_minutes * 60),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    qname = f"sess_{uuid.uuid4().hex[:12]}"
    q = sessions.writeStream.outputMode("append").format("memory").queryName(qname).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {qname}")
