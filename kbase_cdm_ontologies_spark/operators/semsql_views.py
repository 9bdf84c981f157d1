"""semsql table-layout parity: derive the reference's 18-table export
set (outputs_test/tsv_tables/*.tsv headers — SURVEY.md §1.1.5) from the
engine's statements/edges/alias tables.

Populated tables are filtered projections; tables that are empty at the
reference's test tier are emitted empty WITH the correct schema, so a
consumer of the reference's layout sees the same files/columns.

lexical_problem is actually implemented (not just shaped): terms
sharing an identical normalized alias — the engine's ambiguity fixture
is exactly the lexical problem semsql tracks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .alias_dict import ALIAS_PREDICATES


def _empty(spark: SparkSession, schema: str) -> DataFrame:
    return spark.createDataFrame([], schema)


def semsql_tables(
    spark: SparkSession,
    statements: DataFrame,
    edges: DataFrame,
    alias_with_counts: DataFrame,
    prefix: DataFrame,
    owl_restriction: DataFrame,
) -> dict[str, DataFrame]:
    """The full export dict keyed by the reference's table names."""
    syn_preds = [p for p in ALIAS_PREDICATES if p.startswith("oio:")]
    stmt_cols = ["subject", "predicate", "object", "value", "datatype", "language"]

    has_oio_synonym_statement = statements.where(
        F.col("predicate").isin(*syn_preds)
    ).select(*stmt_cols)

    # terms sharing one normalized alias (semsql problem-table semantics)
    lexical_problem = (
        alias_with_counts.where(F.col("n_candidates") > 1)
        .select(
            F.col("term_id").alias("subject"),
            F.lit("oio:hasExactSynonym").alias("predicate"),
            F.col("alias_norm").alias("value"),
        )
        .distinct()
    )

    # rdf list cells (property-chain axioms reify through them) are
    # rdf_list_statement rows in semsql, NOT anonymous class expressions
    rdf_list_statement = statements.where(
        F.col("subject").startswith("_:")
        & F.col("predicate").isin("rdf:first", "rdf:rest")
    ).select("subject", "predicate", "object", "value", "datatype", "language")
    list_nodes = rdf_list_statement.select(
        F.col("subject").alias("id")
    ).distinct()
    anonymous_class_expression = (
        statements.where(F.col("subject").startswith("_:"))
        .select(F.col("subject").alias("id"))
        .distinct()
        .join(list_nodes, "id", "left_anti")
    )

    return {
        "statements": statements,
        "entailed_edge": edges.select("subject", "predicate", "object"),
        "prefix": prefix,
        "owl_restriction": owl_restriction,
        "has_oio_synonym_statement": has_oio_synonym_statement,
        "lexical_problem": lexical_problem,
        "problem": lexical_problem,
        "anonymous_class_expression": anonymous_class_expression,
        "anonymous_property_expression": _empty(spark, "id string"),
        "anonymous_individual_expression": _empty(spark, "id string"),
        "anonymous_expression": anonymous_class_expression,
        "rdf_list_statement": rdf_list_statement,
        "term_association": _empty(
            spark,
            "id string, subject string, predicate string, object string, evidence_type string, publication string, source string",
        ),
        "owl_complex_axiom": _empty(
            spark, "subject string, predicate string, object string"
        ),
        "relation_graph_construct": _empty(
            spark, "subject string, predicate string, object string"
        ),
        "subgraph_query": _empty(
            spark,
            "subject string, predicate string, object string, anchor_object string, anchor_predicate string",
        ),
        "repair_action": _empty(spark, "subject string, description string"),
        "rdf_level_summary_statistic": statements.groupBy(
            F.col("predicate").alias("element")
        ).agg(F.count(F.lit(1)).alias("count_value")),
    }
