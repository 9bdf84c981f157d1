"""Streaming: windowed counts (file source) + custom stateful
sessionization (applyInPandasWithState)."""

import duckdb

from kbase_cdm_ontologies_spark.streaming.ingest import windowed_event_counts_stream
from kbase_cdm_ontologies_spark.streaming.stateful import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark):
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts_stream(spark, f"{SF_DIR}/events.parquet").collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            f"""
            SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
                            '%Y-%m-%d %H:%M:%S'),
                   event_type, count(*), round(sum(value), 2)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_stateful_sessionization(spark):
    sessions = sessionize_stream(spark, f"{SF_DIR}/events.parquet", gap_minutes=30)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.collect()
    }
    # batch oracle in plain python: sessions fully closed WITHIN the
    # single micro-batch (the final open session per user closes only
    # via watermark timeout in a later batch — excluded on both sides)
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, epoch_ms(ts) FROM '{SF_DIR}/events.parquet' ORDER BY user_id, 2"
    ).fetchall()
    by_user: dict = {}
    for uid, ms in rows:
        by_user.setdefault(uid, []).append(ms)
    want = set()
    gap = 30 * 60 * 1000
    for uid, tss in by_user.items():
        start = last = None
        n = 0
        for t in tss:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                want.add((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        # final session stays open -> not emitted
    from datetime import timezone

    def _ms(dt):
        return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)

    got_ms = {(u, _ms(s), _ms(e), n) for u, s, e, n in got}
    # every gap-closed session must be emitted exactly once...
    assert want <= got_ms
    # ...and anything extra is a user's FINAL session, closed by the
    # event-time timeout once the watermark passed it
    finals = {}
    for uid, tss in by_user.items():
        start = last = None
        n = 0
        for t in tss:
            if start is None or t - last > gap:
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        finals[uid] = (uid, start, last, n)
    extras = got_ms - want
    assert extras <= set(finals.values())
    assert len(want) > 0  # fixture actually produces closed sessions

def test_streaming_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon collapse to one row per content key."""
    from datetime import datetime

    from kbase_cdm_ontologies_spark.streaming.ingest import streaming_dedup

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 5), 7, "click", 1.0, "{}"),   # dup of 1
        (3, datetime(2024, 1, 1, 10, 10), 7, "click", 2.0, "{}"),  # distinct value
        (4, datetime(2024, 1, 1, 10, 15), 8, "view", 1.0, "{}"),
        (5, datetime(2024, 1, 1, 10, 20), 8, "view", 1.0, "{}"),   # dup of 4
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(src)
    out = streaming_dedup(spark, src, watermark_minutes=60).collect()
    keys = [r["content_key"] for r in out]
    assert len(keys) == 3 and len(set(keys)) == 3
    assert {r["event_id"] for r in out} <= {1, 2, 3, 4, 5}
