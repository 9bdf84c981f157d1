"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in kbase_cdm_ontologies_spark/queries.py; this
file stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kbase_cdm_ontologies_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG co-occurrence edge construction over the documents
    table at sf0.001 (web-text -> (subj, pred, obj) edges)."""
    return _q.kg_cooccurrence_edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
