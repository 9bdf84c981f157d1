"""Physical-plan regression guards: filters pushed to the parquet scan,
columns pruned, dimension joins broadcast. These are the properties
that keep the queries viable at 100 TB — assert them so a refactor
can't silently lose them."""

import re

import pytest

from kbase_cdm_ontologies_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    assert "l_orderkey" not in schema  # unused columns pruned from the scan
    assert "l_quantity" in schema


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter reached the scan


def test_semi_and_anti_joins(spark):
    semi = _plan(spark, "parts_ordered_semi")
    assert "LeftSemi" in semi
    anti = _plan(spark, "customers_without_orders")
    assert "LeftAnti" in anti


def test_mention_scan_prunes_columns(spark):
    plan = _plan(spark, "kg_mention_counts")
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    assert "source" not in schema and "lang" not in schema


def test_approx_within_tolerance(spark):
    rows = QUERIES["approx_distinct_stats"](spark, SF_DIR).collect()
    for r in rows:
        assert abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"] < 0.1
        q50, q95, q99 = r["price_quantiles"]
        assert q50 <= q95 <= q99


@pytest.mark.parametrize(
    "name", ["kg_mentions_operator"]
)
def test_new_queries_run(spark, name):
    assert QUERIES[name](spark, SF_DIR).count() > 0
