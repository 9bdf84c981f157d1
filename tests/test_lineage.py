"""Version-log lineage (reference version_tracker.py semantics)."""

from datetime import datetime

from kbase_cdm_ontologies_spark.plans.lineage import VersionLog, changed_entities, last_n


def _ts(d):
    return datetime(2024, 1, d)


def test_version_log_fold_and_latest(spark, tmp_path):
    vl = VersionLog(spark, str(tmp_path))
    vl.append(
        spark.createDataFrame(
            [
                ("go.owl", "aaa", _ts(1), 100),
                ("po.owl", "xxx", _ts(1), 50),
            ],
            "entity string, checksum string, stamped_at timestamp, size_bytes long",
        )
    )
    vl.append(
        spark.createDataFrame(
            [("go.owl", "bbb", _ts(5), 120)],
            "entity string, checksum string, stamped_at timestamp, size_bytes long",
        )
    )
    cur = {r["entity"]: r for r in vl.current_versions().collect()}
    assert cur["go.owl"]["checksum"] == "bbb"
    assert cur["go.owl"]["previous_checksum"] == "aaa"
    assert cur["go.owl"]["version_history"] == ["bbb", "aaa"]
    assert cur["po.owl"]["previous_checksum"] is None


def test_changed_entities(spark, tmp_path):
    vl = VersionLog(spark, str(tmp_path))
    vl.append(
        spark.createDataFrame(
            [("go.owl", "aaa", _ts(1), 1)],
            "entity string, checksum string, stamped_at timestamp, size_bytes long",
        )
    )
    cands = spark.createDataFrame(
        [("go.owl", "aaa"), ("go.owl2", "zzz")], ["entity", "checksum"]
    )
    # unchanged go.owl skipped; unseen go.owl2 selected
    got = {r["entity"] for r in changed_entities(vl.log(), cands).collect()}
    assert got == {"go.owl2"}
    cands2 = spark.createDataFrame([("go.owl", "NEW")], ["entity", "checksum"])
    assert changed_entities(vl.log(), cands2).count() == 1


def test_last_n(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], ["v", "g"])
    assert {r["v"] for r in last_n(df, "v", 3).collect()} == {7, 8, 9}
    per = {(r["g"], r["v"]) for r in last_n(df, "v", 2, per="g").collect()}
    assert per == {(0, 8), (0, 6), (1, 9), (1, 7)}


def test_sorted_text_sink(spark, tmp_path):
    from kbase_cdm_ontologies_spark.operators.export import sorted_text_sink

    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], ["term"])
    out = str(tmp_path / "terms")
    sorted_text_sink(df, "term", out)
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert lines == ["a", "b", "c"]
