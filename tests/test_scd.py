"""SCD2 merge emulation (anti-join + union semantics) vs hand state."""

from datetime import datetime

from kbase_cdm_ontologies_spark.operators.scd import as_of, scd2_apply, scd2_init


def _ts(d):
    return datetime(2024, 1, d)


def test_scd2_lifecycle(spark):
    snap = spark.createDataFrame(
        [("GO:1", "alpha", _ts(1)), ("GO:2", "beta", _ts(1))],
        "term string, label string, loaded_at timestamp",
    )
    dim = scd2_init(snap, "loaded_at")
    assert dim.where("is_current").count() == 2

    # batch: GO:1 relabeled, GO:2 unchanged, GO:3 new
    changes = spark.createDataFrame(
        [
            ("GO:1", "alpha-renamed", _ts(5)),
            ("GO:2", "beta", _ts(5)),
            ("GO:3", "gamma", _ts(5)),
        ],
        "term string, label string, loaded_at timestamp",
    )
    dim2 = scd2_apply(dim, changes, ["term"], "loaded_at")
    rows = {(r["term"], r["label"], r["is_current"]): r for r in dim2.collect()}

    assert ("GO:1", "alpha", False) in rows  # closed
    assert rows[("GO:1", "alpha", False)]["valid_to"] == _ts(5)
    assert ("GO:1", "alpha-renamed", True) in rows  # new version
    assert ("GO:2", "beta", True) in rows  # untouched (identical)
    assert rows[("GO:2", "beta", True)]["valid_from"] == _ts(1)
    assert ("GO:3", "gamma", True) in rows  # inserted
    assert len(rows) == 4

    # point-in-time views
    old = {(r["term"], r["label"]) for r in as_of(dim2, _ts(3)).collect()}
    assert old == {("GO:1", "alpha"), ("GO:2", "beta")}
    new = {(r["term"], r["label"]) for r in as_of(dim2, _ts(6)).collect()}
    assert new == {("GO:1", "alpha-renamed"), ("GO:2", "beta"), ("GO:3", "gamma")}


def test_scd2_idempotent_batch(spark):
    snap = spark.createDataFrame(
        [("A", "x", _ts(1))], "k string, v string, t timestamp"
    )
    dim = scd2_init(snap, "t")
    again = scd2_apply(dim, snap, ["k"], "t")
    assert again.count() == 1  # identical re-send: no new version
