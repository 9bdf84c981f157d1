"""Direct unit coverage of the three round-4 semantics operators that
deliver exact reference parity (scripts/reference_parity.py P/R 1.0):
``robot_min`` (input reduction with --preserve-structure rewiring),
``drop_non_el_axioms`` (Whelk-Bridge whole-axiom skip), and
``canonicalize_expressions`` (structural interning). Each was
previously exercised only through the end-to-end parity runs."""

import pytest
from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.closure import (
    canonicalize_expressions,
    drop_non_el_axioms,
)
from kbase_cdm_ontologies_spark.operators.robot_min import robot_min

COLS = ["subject", "predicate", "object"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _rows(df):
    return {(r["subject"], r["predicate"], r["object"]) for r in df.collect()}


# ---------------------------------------------------------------- robot_min


def test_robot_min_drops_equivalence_and_abox_types(spark):
    st = _df(spark, [
        ("A", "owl:equivalentClass", "B"),
        ("ind1", "rdf:type", "A"),                 # ABox typing -> dropped
        ("A", "rdf:type", "owl:Class"),            # declaration -> kept
        ("p", "rdf:type", "owl:TransitiveProperty"),  # declaration -> kept
        ("A", "rdfs:subClassOf", "B"),             # logic -> kept
        ("A", "rdfs:label", "a label"),            # annotation -> kept
    ])
    out = _rows(robot_min(st, exclude_terms=()))
    assert ("A", "owl:equivalentClass", "B") not in out
    assert ("ind1", "rdf:type", "A") not in out
    assert ("A", "rdf:type", "owl:Class") in out
    assert ("p", "rdf:type", "owl:TransitiveProperty") in out
    assert ("A", "rdfs:subClassOf", "B") in out
    assert ("A", "rdfs:label", "a label") in out


def test_robot_min_excludes_terms_and_rewires_structure(spark):
    # p1 ⊑ X ⊑ Y ⊑ p2 with X, Y excluded: every row touching X/Y goes,
    # and robot's --preserve-structure re-attaches p1 to the nearest
    # surviving ancestor p2 THROUGH the excluded-only path
    st = _df(spark, [
        ("p1", "rdfs:subPropertyOf", "X"),
        ("X", "rdfs:subPropertyOf", "Y"),
        ("Y", "rdfs:subPropertyOf", "p2"),
        ("X", "rdfs:domain", "D"),          # excluded term's own axiom
        ("other", "rdfs:subPropertyOf", "q"),
    ])
    out = _rows(robot_min(st, exclude_terms=("X", "Y")))
    assert not any("X" in t or "Y" in t for t in out)
    assert ("p1", "rdfs:subPropertyOf", "p2") in out  # the bridge
    assert ("other", "rdfs:subPropertyOf", "q") in out


def test_robot_min_no_bridge_when_no_surviving_ancestor(spark):
    st = _df(spark, [
        ("p1", "rdfs:subPropertyOf", "X"),  # X excluded, no parents
    ])
    out = _rows(robot_min(st, exclude_terms=("X",)))
    assert out == set()


# ------------------------------------------------------ drop_non_el_axioms


def test_non_el_taint_drops_whole_intersection(spark):
    # A ⊑ ∃p.(C ⊓ ∀q.D): the ∀ conjunct taints the list cell, the
    # intersection node, and the enclosing restriction — BOTH conjuncts
    # vanish (Whelk skips the axiom whole)
    st = _df(spark, [
        ("A", "rdfs:subClassOf", "_:r"),
        ("_:r", "owl:onProperty", "p"),
        ("_:r", "owl:someValuesFrom", "_:ix"),
        ("_:ix", "owl:intersectionOf", "_:c1"),
        ("_:c1", "rdf:first", "C"),
        ("_:c1", "rdf:rest", "_:c2"),
        ("_:c2", "rdf:first", "_:all"),
        ("_:c2", "rdf:rest", "rdf:nil"),
        ("_:all", "owl:allValuesFrom", "D"),
        ("_:all", "owl:onProperty", "q"),
        # control: an untouched EL restriction elsewhere
        ("B", "rdfs:subClassOf", "_:r2"),
        ("_:r2", "owl:onProperty", "p"),
        ("_:r2", "owl:someValuesFrom", "C"),
    ])
    out = _rows(drop_non_el_axioms(st))
    assert not any(s.startswith("_:r") or s.startswith("_:c") or s.startswith("_:ix")
                   or s.startswith("_:all") for s, _p, _o in out
                   if s != "_:r2")
    assert ("A", "rdfs:subClassOf", "_:r") not in out
    assert ("B", "rdfs:subClassOf", "_:r2") in out
    assert ("_:r2", "owl:someValuesFrom", "C") in out


def test_non_el_preserves_el_only_input(spark):
    st = _df(spark, [
        ("A", "rdfs:subClassOf", "_:r"),
        ("_:r", "owl:onProperty", "p"),
        ("_:r", "owl:someValuesFrom", "C"),
    ])
    assert _rows(drop_non_el_axioms(st)) == _rows(st)


# ------------------------------------------------ canonicalize_expressions


def test_interning_merges_identical_restrictions(spark):
    # two structurally identical ∃p.C bnodes collapse into one node, so
    # both subclass rows point at the SAME canonical atom
    st = _df(spark, [
        ("A", "rdfs:subClassOf", "_:ra"),
        ("_:ra", "owl:onProperty", "p"),
        ("_:ra", "owl:someValuesFrom", "C"),
        ("B", "rdfs:subClassOf", "_:rb"),
        ("_:rb", "owl:onProperty", "p"),
        ("_:rb", "owl:someValuesFrom", "C"),
    ])
    out = canonicalize_expressions(st)
    supers = {
        r["object"]
        for r in out.where(F.col("predicate") == "rdfs:subClassOf").collect()
    }
    assert len(supers) == 1  # A and B share one canonical restriction
    assert next(iter(supers)).startswith("_:x")


def test_interning_distinguishes_different_structure(spark):
    st = _df(spark, [
        ("A", "rdfs:subClassOf", "_:ra"),
        ("_:ra", "owl:onProperty", "p"),
        ("_:ra", "owl:someValuesFrom", "C"),
        ("B", "rdfs:subClassOf", "_:rb"),
        ("_:rb", "owl:onProperty", "p"),
        ("_:rb", "owl:someValuesFrom", "D"),  # different filler
    ])
    out = canonicalize_expressions(st)
    supers = {
        r["object"]
        for r in out.where(F.col("predicate") == "rdfs:subClassOf").collect()
    }
    assert len(supers) == 2


def test_interning_nested_fillers_converge(spark):
    # ∃p.(∃q.C) twice via distinct bnodes at BOTH levels -> one atom
    st = _df(spark, [
        ("A", "rdfs:subClassOf", "_:outer1"),
        ("_:outer1", "owl:onProperty", "p"),
        ("_:outer1", "owl:someValuesFrom", "_:inner1"),
        ("_:inner1", "owl:onProperty", "q"),
        ("_:inner1", "owl:someValuesFrom", "C"),
        ("B", "rdfs:subClassOf", "_:outer2"),
        ("_:outer2", "owl:onProperty", "p"),
        ("_:outer2", "owl:someValuesFrom", "_:inner2"),
        ("_:inner2", "owl:onProperty", "q"),
        ("_:inner2", "owl:someValuesFrom", "C"),
    ])
    out = canonicalize_expressions(st)
    supers = {
        r["object"]
        for r in out.where(F.col("predicate") == "rdfs:subClassOf").collect()
    }
    assert len(supers) == 1


def test_interning_handles_deep_nesting(spark):
    # topological (children-first) interning converges in one pass at
    # any nesting depth — two disjoint 40-deep chains with the same
    # structure collapse level-by-level into ONE canonical spine
    rows = []
    for tag in ("a", "b"):
        for i in range(40):
            rows += [
                (f"_:{tag}{i}", "owl:onProperty", "p"),
                (f"_:{tag}{i}", "owl:someValuesFrom",
                 f"_:{tag}{i + 1}" if i < 39 else "C"),
            ]
    rows += [("A", "rdfs:subClassOf", "_:a0"), ("B", "rdfs:subClassOf", "_:b0")]
    out = canonicalize_expressions(_df(spark, rows))
    supers = {
        r["object"]
        for r in out.where(F.col("predicate") == "rdfs:subClassOf").collect()
    }
    assert len(supers) == 1


def test_interning_raises_on_cyclic_expression(spark):
    # a cyclic bnode structure (malformed RDF) has no canonical form
    st = _df(spark, [
        ("_:c0", "owl:onProperty", "p"),
        ("_:c0", "owl:someValuesFrom", "_:c1"),
        ("_:c1", "owl:onProperty", "q"),
        ("_:c1", "owl:someValuesFrom", "_:c0"),
    ])
    with pytest.raises(RuntimeError, match="cyclic"):
        canonicalize_expressions(st)
