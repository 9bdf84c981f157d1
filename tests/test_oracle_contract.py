"""Pre-flight of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB exactly (order-insensitive, columns
sorted by name) at sf0.001; oracle-less entries must at least run and
return a stable schema."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from kbase_cdm_ontologies_spark.queries import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float repr jitter
        return f"{v + 0.0:.10g}"
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_normalize(r[c]) for c in cols) for r in df.collect()
    ), cols


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return sorted(
        tuple(_normalize(row[i]) for i in order) for row in rows
    ), sorted(cols)


ORACLED = sorted(entry_mod.oracle_sql())
ALL = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    got, gcols = _spark_rows(qfn(spark, SF_DIR))
    want, wcols = _duck_rows(ddb, entry_mod.oracle_sql()[name])
    assert gcols == wcols, f"{name}: column mismatch {gcols} vs {wcols}"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    assert got == want, (
        f"{name}: value mismatch; first diffs: "
        f"{[x for x in got if x not in set(want)][:3]} vs "
        f"{[x for x in want if x not in set(got)][:3]}"
    )


def test_every_query_is_oracled():
    # since round 4 there are NO rows-only entries: all 50 queries —
    # streaming, multimodal decode, and sketch stats included — carry a
    # DuckDB oracle. A new query without one should be a deliberate,
    # visible decision, not a silent gap.
    assert ALL == ORACLED


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
