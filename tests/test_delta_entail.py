"""Incremental entailment maintenance (operators/delta_entail.py):
entail_delta() must produce EXACTLY the edge set of a full entail()
recompute on the union, for every rule family — subclass closure,
expression normalization, union elimination, the domain rule, base
existential links, property saturation (SubRole/Trans/Chain incl.
schema growth), individual typing — in both execution regimes.

The reference has no counterpart to compare against (its incremental
story is checksum skip-if-unchanged, version_tracker.py:111-138), so
the oracle here is the engine's own full recompute, which is itself
golden-parity-verified (scripts/reference_parity.py P/R 1.0)."""

import random

import pytest
from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.closure import entail
from kbase_cdm_ontologies_spark.operators.delta_entail import (
    EntailState,
    entail_delta,
    entail_with_state,
)

COLS = ["subject", "predicate", "object"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _edges(df):
    return {(r["subject"], r["predicate"], r["object"]) for r in df.collect()}


def _class_nodes(spark, stmts):
    return (
        stmts.where(
            (F.col("predicate") == "rdf:type")
            & (F.col("object") == "owl:Class")
            & ~F.col("subject").startswith("_:")
        )
        .select(F.col("subject").alias("id"))
        .distinct()
    )


def _check_delta_matches_full(spark, base_rows, delta_rows):
    """entail_delta(state(base), delta) == entail(base ∪ delta)."""
    base = _df(spark, base_rows)
    delta = _df(spark, delta_rows)
    full = _df(spark, base_rows + delta_rows)
    want = _edges(entail(full, _class_nodes(spark, full)))

    _, state = entail_with_state(base, _class_nodes(spark, base))
    got_df, new_state = entail_delta(state, delta)
    got = _edges(got_df)
    assert got == want, (
        f"missing={sorted(want - got)[:8]} extra={sorted(got - want)[:8]}"
    )
    return new_state, want


# ------------------------------------------------------------ fixtures

def _base_fixture():
    """Subclass chain + restriction + transitive/chain schema + union +
    domain + individuals — every rule family has base-side facts."""
    return [
        # class declarations
        *[(f"A:{i}", "rdf:type", "owl:Class") for i in range(6)],
        ("B:organ", "rdf:type", "owl:Class"),
        ("B:tissue", "rdf:type", "owl:Class"),
        ("B:body", "rdf:type", "owl:Class"),
        # subclass chain A:5 ⊑ ... ⊑ A:0
        *[(f"A:{i+1}", "rdfs:subClassOf", f"A:{i}") for i in range(5)],
        ("B:tissue", "rdfs:subClassOf", "B:organ"),
        # restriction: A:3 ⊑ ∃part_of.B:tissue
        ("A:3", "rdfs:subClassOf", "_:rb1"),
        ("_:rb1", "owl:onProperty", "P:part_of"),
        ("_:rb1", "owl:someValuesFrom", "B:tissue"),
        # property schema: part_of transitive, located_in ∘ part_of ⊑ located_in
        ("P:part_of", "rdf:type", "owl:TransitiveProperty"),
        ("P:located_in", "owl:propertyChainAxiom", "_:cl1"),
        ("_:cl1", "rdf:first", "P:located_in"),
        ("_:cl1", "rdf:rest", "_:cl2"),
        ("_:cl2", "rdf:first", "P:part_of"),
        ("_:cl2", "rdf:rest", "rdf:nil"),
        # base restriction feeding the chain: A:0 ⊑ ∃located_in.B:organ
        ("A:0", "rdfs:subClassOf", "_:rb2"),
        ("_:rb2", "owl:onProperty", "P:located_in"),
        ("_:rb2", "owl:someValuesFrom", "B:organ"),
        # union of A:4 and A:5 (both reach A:2 via the chain)
        ("_:ub1", "owl:unionOf", "_:ul1"),
        ("_:ul1", "rdf:first", "A:4"),
        ("_:ul1", "rdf:rest", "_:ul2"),
        ("_:ul2", "rdf:first", "A:5"),
        ("_:ul2", "rdf:rest", "rdf:nil"),
        ("B:union_holder", "rdf:type", "owl:Class"),
        ("B:union_holder", "rdfs:subClassOf", "_:ub1"),
        # domain: part_of has domain B:body
        ("P:part_of", "rdfs:domain", "B:body"),
        # individual
        ("I:x1", "rdf:type", "A:4"),
    ]


def test_delta_matches_full_rich_fixture(spark):
    """Delta touches every family: new terms under old cone, a new
    restriction over an old filler, a new individual, a new class
    declaration for a pre-existing bare node."""
    delta = [
        ("N:1", "rdf:type", "owl:Class"),
        ("N:2", "rdf:type", "owl:Class"),
        # new leaves under the old chain
        ("N:1", "rdfs:subClassOf", "A:5"),
        ("N:2", "rdfs:subClassOf", "N:1"),
        # new restriction over an old property + old filler
        ("N:1", "rdfs:subClassOf", "_:nd1"),
        ("_:nd1", "owl:onProperty", "P:part_of"),
        ("_:nd1", "owl:someValuesFrom", "A:2"),
        # new subclass edge deep in the OLD hierarchy (reorganization)
        ("B:organ", "rdfs:subClassOf", "B:body"),
        # declare a node that existed only as a filler before
        ("B:tissue2", "rdf:type", "owl:Class"),
        ("B:tissue2", "rdfs:subClassOf", "B:tissue"),
        # new individuals typed at old and new classes
        ("I:y1", "rdf:type", "N:2"),
        ("I:x1", "rdf:type", "N:1"),
    ]
    _check_delta_matches_full(spark, _base_fixture(), delta)


def test_delta_schema_growth(spark):
    """Old links must fire under rules that only arrive with the delta:
    a new subPropertyOf pair, a new TransitiveProperty declaration, and
    a new chain axiom over old properties."""
    base = [
        ("C:a", "rdf:type", "owl:Class"),
        ("C:b", "rdf:type", "owl:Class"),
        ("C:c", "rdf:type", "owl:Class"),
        ("C:d", "rdf:type", "owl:Class"),
        # p-links a->b->c (p NOT transitive in base)
        ("C:a", "rdfs:subClassOf", "_:r1"),
        ("_:r1", "owl:onProperty", "P:p"),
        ("_:r1", "owl:someValuesFrom", "C:b"),
        ("C:b", "rdfs:subClassOf", "_:r2"),
        ("_:r2", "owl:onProperty", "P:p"),
        ("_:r2", "owl:someValuesFrom", "C:c"),
        # q-link c->d
        ("C:c", "rdfs:subClassOf", "_:r3"),
        ("_:r3", "owl:onProperty", "P:q"),
        ("_:r3", "owl:someValuesFrom", "C:d"),
    ]
    delta = [
        # p becomes transitive -> a p c must appear
        ("P:p", "rdf:type", "owl:TransitiveProperty"),
        # p ⊑ r -> every old p-link lifts to r
        ("P:p", "rdfs:subPropertyOf", "P:r"),
        # NEW chain p ∘ q ⊑ s over OLD links -> b s d (and a s d via trans)
        ("P:s", "owl:propertyChainAxiom", "_:dcl1"),
        ("_:dcl1", "rdf:first", "P:p"),
        ("_:dcl1", "rdf:rest", "_:dcl2"),
        ("_:dcl2", "rdf:first", "P:q"),
        ("_:dcl2", "rdf:rest", "rdf:nil"),
    ]
    _, want = _check_delta_matches_full(spark, base, delta)
    assert ("C:a", "P:p", "C:c") in want  # new transitivity fired
    assert ("C:a", "P:r", "C:b") in want  # new lift fired
    assert ("C:b", "P:s", "C:d") in want  # new chain fired


def test_delta_union_elimination_incremental(spark):
    """A delta subclass edge gives the LAST member of an old union the
    common super — elimination must fire incrementally; plus a brand
    new union over old classes eliminates immediately."""
    base = [
        ("U:m1", "rdf:type", "owl:Class"),
        ("U:m2", "rdf:type", "owl:Class"),
        ("U:top", "rdf:type", "owl:Class"),
        ("U:h", "rdf:type", "owl:Class"),
        ("U:m1", "rdfs:subClassOf", "U:top"),
        # union (m1 ∪ m2); m2 does NOT reach top yet
        ("_:ub", "owl:unionOf", "_:ul1"),
        ("_:ul1", "rdf:first", "U:m1"),
        ("_:ul1", "rdf:rest", "_:ul2"),
        ("_:ul2", "rdf:first", "U:m2"),
        ("_:ul2", "rdf:rest", "rdf:nil"),
        ("U:h", "rdfs:subClassOf", "_:ub"),
    ]
    delta = [
        ("U:m2", "rdfs:subClassOf", "U:top"),  # completes the union
        # brand-new union over old classes, eliminable right away
        ("U:h2", "rdf:type", "owl:Class"),
        ("_:nb", "owl:unionOf", "_:nl1"),
        ("_:nl1", "rdf:first", "U:m1"),
        ("_:nl1", "rdf:rest", "_:nl3"),
        ("_:nl3", "rdf:first", "U:top"),
        ("_:nl3", "rdf:rest", "rdf:nil"),
        ("U:h2", "rdfs:subClassOf", "_:nb"),
    ]
    _, want = _check_delta_matches_full(spark, base, delta)
    assert ("U:h", "rdfs:subClassOf", "U:top") in want


def test_delta_noop_and_duplicates(spark):
    """A delta that only repeats known statements changes nothing."""
    base = _base_fixture()
    bdf = _df(spark, base)
    edges, state = entail_with_state(bdf, _class_nodes(spark, bdf))
    got_df, _ = entail_delta(state, _df(spark, base[:10]))
    assert _edges(got_df) == _edges(edges)


def test_delta_applied_twice(spark):
    """Two successive deltas == one full recompute of all three sets
    (state threads through)."""
    base = _base_fixture()
    d1 = [
        ("N:1", "rdf:type", "owl:Class"),
        ("N:1", "rdfs:subClassOf", "A:5"),
    ]
    d2 = [
        ("N:2", "rdf:type", "owl:Class"),
        ("N:2", "rdfs:subClassOf", "N:1"),
        ("I:z", "rdf:type", "N:2"),
    ]
    full = _df(spark, base + d1 + d2)
    want = _edges(entail(full, _class_nodes(spark, full)))
    bdf = _df(spark, base)
    _, state = entail_with_state(bdf, _class_nodes(spark, bdf))
    _, state = entail_delta(state, _df(spark, d1))
    got_df, _ = entail_delta(state, _df(spark, d2))
    assert _edges(got_df) == want


def test_state_save_load_roundtrip(spark, tmp_path):
    """Cross-session resume: persist the state, reload, apply a delta —
    identical to the in-memory path (the graph-stage extension of the
    checkpoint/resume contract)."""
    base = _base_fixture()
    delta = [
        ("N:9", "rdf:type", "owl:Class"),
        ("N:9", "rdfs:subClassOf", "A:3"),
        ("I:w", "rdf:type", "N:9"),
    ]
    full = _df(spark, base + delta)
    want = _edges(entail(full, _class_nodes(spark, full)))
    bdf = _df(spark, base)
    _, state = entail_with_state(bdf, _class_nodes(spark, bdf))
    state.save(str(tmp_path / "st"))
    loaded = EntailState.load(spark, str(tmp_path / "st"))
    got_df, _ = entail_delta(loaded, _df(spark, delta))
    assert _edges(got_df) == want


def test_delta_rejects_union_membership_growth(spark):
    """Growing an existing union's member set is non-monotone for the
    elimination rule — must fail loudly, not under-derive. Bnode unions
    cannot collide (re-canonicalization keys them by member set), so
    the reachable case is a NAMED union subject re-asserted with an
    extra member."""
    base = [
        ("U:m1", "rdf:type", "owl:Class"),
        ("U:m2", "rdf:type", "owl:Class"),
        ("U:named", "rdf:type", "owl:Class"),
        ("U:named", "owl:unionOf", "_:bl1"),
        ("_:bl1", "rdf:first", "U:m1"),
        ("_:bl1", "rdf:rest", "rdf:nil"),
    ]
    bdf = _df(spark, base)
    _, state = entail_with_state(bdf, _class_nodes(spark, bdf))
    bad = [
        ("U:named", "owl:unionOf", "_:xl1"),
        ("_:xl1", "rdf:first", "U:m2"),
        ("_:xl1", "rdf:rest", "rdf:nil"),
    ]
    with pytest.raises(ValueError, match="union"):
        entail_delta(state, _df(spark, bad))


# ------------------------------------------------------- randomized

def _random_units(rng, tag, classes, props, n_units):
    """Random axiom units (each bnode-closed). Returns list of
    statement-row lists."""
    units = []
    for k in range(n_units):
        kind = rng.random()
        u = []
        if kind < 0.35:  # subclass edge
            a, b = rng.sample(classes, 2)
            u.append((a, "rdfs:subClassOf", b))
        elif kind < 0.6:  # restriction
            a, c = rng.sample(classes, 2)
            p = rng.choice(props)
            bn = f"_:{tag}r{k}"
            u += [
                (a, "rdfs:subClassOf", bn),
                (bn, "owl:onProperty", p),
                (bn, "owl:someValuesFrom", c),
            ]
        elif kind < 0.7:  # union over 2-3 classes
            ms = rng.sample(classes, rng.choice([2, 3]))
            bn, h = f"_:{tag}u{k}", rng.choice(classes)
            cells = [f"_:{tag}ul{k}_{i}" for i in range(len(ms))]
            u.append((bn, "owl:unionOf", cells[0]))
            for i, m in enumerate(ms):
                nxt = cells[i + 1] if i + 1 < len(ms) else "rdf:nil"
                u += [(cells[i], "rdf:first", m), (cells[i], "rdf:rest", nxt)]
            u.append((h, "rdfs:subClassOf", bn))
        elif kind < 0.8:  # schema: subPropertyOf / transitive / domain
            p, q = rng.sample(props, 2)
            pick = rng.random()
            if pick < 0.4:
                u.append((p, "rdfs:subPropertyOf", q))
            elif pick < 0.7:
                u.append((p, "rdf:type", "owl:TransitiveProperty"))
            else:
                u.append((p, "rdfs:domain", rng.choice(classes)))
        elif kind < 0.9:  # chain axiom (2 or 3 slots)
            sl = rng.sample(props, rng.choice([2, 2, 3]))
            r = rng.choice(props)
            cells = [f"_:{tag}cl{k}_{i}" for i in range(len(sl))]
            u.append((r, "owl:propertyChainAxiom", cells[0]))
            for i, m in enumerate(sl):
                nxt = cells[i + 1] if i + 1 < len(sl) else "rdf:nil"
                u += [(cells[i], "rdf:first", m), (cells[i], "rdf:rest", nxt)]
        else:  # individual
            u.append((f"I:{tag}{k}", "rdf:type", rng.choice(classes)))
        units.append(u)
    return units


@pytest.mark.parametrize("seed", [3, 17, 41, 77])
def test_delta_fuzz_vs_full(spark, seed):
    """Random ontologies, random axiom-unit split into base/delta —
    incremental must equal full recompute bit-for-bit."""
    rng = random.Random(seed)
    classes = [f"C:{i}" for i in range(14)]
    props = [f"P:{i}" for i in range(5)]
    decls = [(c, "rdf:type", "owl:Class") for c in classes]
    base_units = _random_units(rng, "b", classes, props, 30)
    delta_units = _random_units(rng, "d", classes, props, 8)
    base_rows = decls + [r for u in base_units for r in u]
    delta_rows = [r for u in delta_units for r in u]
    _check_delta_matches_full(spark, base_rows, delta_rows)


def test_delta_distributed_regime(spark):
    """Force every hybrid fast path to the distributed loops (the
    regime a 100 TB corpus runs) — same equality."""
    keys = [
        "spark.graft.transitiveClosure.localThreshold",
        "spark.graft.unionElimination.localThreshold",
        "spark.graft.propertyClosure.localThreshold",
        "spark.graft.keyedTransitiveClosure.localThreshold",
        # the warm-seeded distributed property fixpoint — the at-scale
        # regime — only runs when the driver saturation is off too
        "spark.graft.deltaEntail.driverThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "0")
    try:
        rng = random.Random(99)
        classes = [f"C:{i}" for i in range(10)]
        props = [f"P:{i}" for i in range(4)]
        decls = [(c, "rdf:type", "owl:Class") for c in classes]
        base_units = _random_units(rng, "b", classes, props, 20)
        delta_units = _random_units(rng, "d", classes, props, 6)
        _check_delta_matches_full(
            spark,
            decls + [r for u in base_units for r in u],
            [r for u in delta_units for r in u],
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_delta_distributed_rule_free_schema(spark):
    """Hierarchy/restriction + subPropertyOf ONLY — no transitive,
    chain, or union axioms — through the forced-distributed warm
    property fixpoint. Regression guard for the seeded
    _generic_property_fixpoint crashing on an empty rule-part list
    (ADVICE r5 high: parts[0] IndexError when the schema has no
    trans/chain/union rules)."""
    keys = [
        "spark.graft.transitiveClosure.localThreshold",
        "spark.graft.propertyClosure.localThreshold",
        "spark.graft.keyedTransitiveClosure.localThreshold",
        "spark.graft.deltaEntail.driverThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "0")
    try:
        base_rows = [
            *[(f"C:{i}", "rdf:type", "owl:Class") for i in range(4)],
            ("C:1", "rdfs:subClassOf", "C:0"),
            ("C:2", "rdfs:subClassOf", "C:1"),
            # restriction: C:2 ⊑ ∃P:a.C:3
            ("C:2", "rdfs:subClassOf", "_:r1"),
            ("_:r1", "owl:onProperty", "P:a"),
            ("_:r1", "owl:someValuesFrom", "C:3"),
            # property hierarchy only — NO trans/chain/union anywhere
            ("P:a", "rdfs:subPropertyOf", "P:b"),
        ]
        delta_rows = [
            ("C:9", "rdf:type", "owl:Class"),
            ("C:9", "rdfs:subClassOf", "C:2"),
            # a delta restriction so the warm property stage has work
            ("C:9", "rdfs:subClassOf", "_:r2"),
            ("_:r2", "owl:onProperty", "P:a"),
            ("_:r2", "owl:someValuesFrom", "C:0"),
        ]
        _check_delta_matches_full(spark, base_rows, delta_rows)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ------------------------------------------------ reference corpus

REF_ST = "/root/reference/outputs_test/parquet_files/statements.parquet"


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_ST),
    reason="reference data not mounted",
)
def test_delta_reference_add_bfo_slice(spark):
    """Add-a-source on the reference's OWN merged statements: base =
    the RO stanzas, delta = the BFO stanzas (stanzas are axiom-closed,
    so the bnode-disjointness contract holds). Incremental must equal
    the full recompute on the union — the real-corpus witness that
    delta maintenance derives the cross-source edges (BFO terms sit
    ABOVE RO's restriction fillers, so the delta rewires the top of
    the old hierarchy, the hard direction)."""
    st = spark.read.parquet(REF_ST).withColumn(
        "graph", F.col("graph").cast("string")
    )
    keep = F.col("stanza").startswith("BFO:") | F.col("stanza").startswith("RO:")
    pick = st.where(keep & (F.col("predicate") != "owl:equivalentClass"))
    base = pick.where(F.col("stanza").startswith("RO:")).select(*COLS)
    delta = pick.where(F.col("stanza").startswith("BFO:")).select(*COLS)
    full = base.unionByName(delta)
    want = _edges(entail(full, _class_nodes(spark, full)))
    _, state = entail_with_state(base, _class_nodes(spark, base))
    got_df, _ = entail_delta(state, delta)
    got = _edges(got_df)
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
