"""M2 — alias dictionary build (pure built-in functions, no UDF).

The reference's term dictionary is implicit in its label/synonym
statements (rdfs:label 10,576 rows, oio:hasExactSynonym 3,956,
oio:hasRelatedSynonym 2,419, oio:hasBroadSynonym 554 in
outputs_test/parquet_files/statements.parquet — SURVEY.md §2.3). This
stage derives ``alias(term_id, alias, alias_norm, kind, source_onto)``
from a statements table and is small enough to broadcast (even at 30+
production ontologies it is ~millions of rows — dimension-sized next to
a 10^12-row pages table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALIAS_PREDICATES = {
    "rdfs:label": "label",
    "oio:hasExactSynonym": "exact",
    "oio:hasRelatedSynonym": "related",
    "oio:hasBroadSynonym": "broad",
}


def normalize_expr(col):
    """Column-expression twin of functions.text_rules.normalize_surface
    (casefold ≈ lower for the ASCII alias corpus; whitespace collapse)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def build_alias_dict(statements: DataFrame) -> DataFrame:
    kind_map = F.create_map(
        *[F.lit(x) for kv in ALIAS_PREDICATES.items() for x in kv]
    )
    return (
        statements.where(
            F.col("predicate").isin(*ALIAS_PREDICATES) & F.col("value").isNotNull()
        )
        .select(
            F.col("subject").alias("term_id"),
            F.col("value").alias("alias"),
            normalize_expr(F.col("value")).alias("alias_norm"),
            kind_map[F.col("predicate")].alias("kind"),
            F.split(F.col("subject"), ":").getItem(0).alias("source_onto"),
        )
        .dropDuplicates(["term_id", "alias_norm", "kind"])
    )


def with_candidate_counts(alias: DataFrame) -> DataFrame:
    """Attach n_candidates per alias_norm (ambiguity marker for linking)."""
    counts = alias.groupBy("alias_norm").agg(
        F.countDistinct("term_id").alias("n_candidates")
    )
    return alias.join(F.broadcast(counts), "alias_norm")
