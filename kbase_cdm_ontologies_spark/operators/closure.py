"""M7a — entailment closure: the Spark re-expression of relation-graph
(Scala, reference Dockerfile:55-61; flags captured at
notebooks/workflow.ipynb:1631-1641):

  --reflexive-subclasses true   -> reflexive rows for every class node
  --equivalence-as-subclass true-> handled upstream by canonicalization
  --disable-owl-nothing true    -> owl:Nothing filtered before closure
  + transitive closure of rdfs:subClassOf
  + existential property entailment: a ⊑ ∃p.c, x ⊑ a, c ⊑ d ⟹ (x,p,d)

Algorithm: path-doubling transitive closure — O(log diameter) joins
instead of O(diameter):

    C_0 = E;  C_{k+1} = C_k ∪ (C_k ⋈ C_k)  until fixpoint

Each round: one self-join on the frontier, distinct, localCheckpoint to
cut lineage. At web scale the closure runs over the CANONICAL DAG only
(canonicalize first — SURVEY.md §7.4 risk 2), and the join key (mid
node) is skew-prone at hub classes, so AQE skew-join stays on and the
closure table is repartitioned by the join key each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOGIC_PREDICATES = (
    "rdfs:subClassOf",
    "owl:equivalentClass",
    "owl:onProperty",
    "owl:someValuesFrom",
    "rdf:type",
)


def prune_for_closure(statements: DataFrame) -> DataFrame:
    """Pre-closure semantic prune — the Spark analog of
    ``robot remove --axioms "equivalent disjoint annotation abox type"``
    before relation-graph (reference workflow.ipynb:1626-1627) and
    ``robot remove --term owl:Nothing`` (merge_ontologies.py:108-111).
    Shrinks the closure working set by orders of magnitude: annotation
    statements never participate in entailment."""
    return statements.where(
        F.col("predicate").isin(*LOGIC_PREDICATES)
        & (F.col("subject") != "owl:Nothing")
        & (F.coalesce(F.col("object"), F.lit("")) != "owl:Nothing")
    )


def transitive_closure(
    edges: DataFrame, src: str = "s", dst: str = "o", max_rounds: int = 20
) -> DataFrame:
    """All (s, o) pairs with a directed path s ->+ o (non-reflexive).
    Path doubling: max_rounds=20 covers diameter 2^20."""
    c = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("o"))
        .where(F.col("s") != F.col("o"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    # the closure set grows monotonically (union each round), so count
    # equality IS set equality — one count per round, carried forward,
    # and the count action doubles as the lazy checkpoint materializer
    n_prev = c.count()
    for _ in range(max_rounds):
        hop = (
            c.alias("a")
            .join(
                c.alias("b").hint("shuffle_hash"),
                F.col("a.o") == F.col("b.s"),
            )
            .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
        )
        c = (
            c.unionByName(hop)
            .where(F.col("s") != F.col("o"))
            .dropDuplicates()
            .localCheckpoint(eager=False)
        )
        n_new = c.count()
        if n_new == n_prev:
            return c
        n_prev = n_new
    raise RuntimeError(f"transitive_closure: no fixpoint in {max_rounds} doubling rounds")


def subclass_edges(pruned: DataFrame) -> DataFrame:
    """Asserted subclass edges between named classes (blank-node
    restriction subjects/objects excluded — those feed restrictions())."""
    return (
        pruned.where(
            (F.col("predicate") == "rdfs:subClassOf")
            & F.col("object").isNotNull()
            & ~F.col("subject").startswith("_:")
            & ~F.col("object").startswith("_:")
        )
        .select(F.col("subject").alias("s"), F.col("object").alias("o"))
    )


def restriction_axioms(pruned: DataFrame) -> DataFrame:
    """Reassemble someValuesFrom restrictions from their blank-node
    reification (reference census: 6,093 someValuesFrom + 6,127
    onProperty statements): (a, prop, c) for a ⊑ ∃prop.c."""
    sub_bn = pruned.where(
        (F.col("predicate") == "rdfs:subClassOf") & F.col("object").startswith("_:")
    ).select(F.col("subject").alias("a"), F.col("object").alias("bn"))
    on_prop = pruned.where(F.col("predicate") == "owl:onProperty").select(
        F.col("subject").alias("bn"), F.col("object").alias("prop")
    )
    some_from = pruned.where(F.col("predicate") == "owl:someValuesFrom").select(
        F.col("subject").alias("bn"), F.col("object").alias("c")
    )
    return sub_bn.join(on_prop, "bn").join(some_from, "bn").select("a", "prop", "c")


def entail(
    statements: DataFrame,
    class_nodes: DataFrame,
) -> DataFrame:
    """Full entailment over (already canonicalized) statements ->
    edges(subject, predicate, object).

    class_nodes: one-column DF ``id`` of all canonical class nodes
    (drives the reflexive rows, like --reflexive-subclasses true).
    """
    pruned = prune_for_closure(statements)
    sc = subclass_edges(pruned)
    tc = transitive_closure(sc)  # strict
    # reflexive-transitive: used both for output and for composing
    refl = class_nodes.select(F.col("id").alias("s"), F.col("id").alias("o"))
    rtc = tc.unionByName(refl).dropDuplicates().localCheckpoint()

    sub_out = rtc.select(
        F.col("s").alias("subject"),
        F.lit("rdfs:subClassOf").alias("predicate"),
        F.col("o").alias("object"),
    )

    restr = restriction_axioms(pruned)
    # x ⊑ a (rtc), a ⊑ ∃p.c, c ⊑ d (rtc)  ⟹  (x, p, d)
    prop_out = (
        rtc.select(F.col("s").alias("x"), F.col("o").alias("a"))
        .join(F.broadcast(restr), "a")
        .join(
            rtc.select(F.col("s").alias("c"), F.col("o").alias("d")),
            "c",
        )
        .select(
            F.col("x").alias("subject"),
            F.col("prop").alias("predicate"),
            F.col("d").alias("object"),
        )
    )
    # individuals: x rdf:type C, C ⊑ D  ⟹  x rdf:type D
    # (relation-graph --output-individuals true, workflow.ipynb:1638);
    # rdf:type rows whose object is a named class — owl:Class /
    # owl:NamedIndividual meta-rows drop out via the class_nodes semi-join
    type_asserts = (
        pruned.where(
            (F.col("predicate") == "rdf:type") & ~F.col("subject").startswith("_:")
        )
        .select(F.col("subject").alias("ind"), F.col("object").alias("cls"))
        .join(class_nodes.select(F.col("id").alias("cls")), "cls", "left_semi")
    )
    ind_out = (
        type_asserts.join(rtc.select(F.col("s").alias("cls"), "o"), "cls")
        .select(
            F.col("ind").alias("subject"),
            F.lit("rdf:type").alias("predicate"),
            F.col("o").alias("object"),
        )
    )
    return (
        sub_out.unionByName(prop_out)
        .unionByName(ind_out)
        .where((F.col("subject") != "owl:Nothing") & (F.col("object") != "owl:Nothing"))
        .dropDuplicates()
    )
