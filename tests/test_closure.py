"""M7: transitive closure + restriction entailment micro-fixtures
(FIXTURES.md §7; semantics of relation-graph flags, SURVEY.md §2.8)."""

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.closure import (
    entail,
    restriction_axioms,
    prune_for_closure,
    transitive_closure,
)


def _tc(spark, edges):
    df = spark.createDataFrame(edges, ["s", "o"])
    return {(r["s"], r["o"]) for r in transitive_closure(df).collect()}


def test_chain(spark):
    # a⊑b⊑c⊑d -> 6 strict pairs
    got = _tc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }


def test_diamond_no_duplicates(spark):
    got = _tc(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "d"), ("c", "d"),
    }


def test_cycle_terminates(spark):
    got = _tc(spark, [("a", "b"), ("b", "a")])
    assert got == {("a", "b"), ("b", "a")}


def _stmt_rows(rows):
    return [
        dict(stanza=s, subject=s, predicate=p, object=o, value=None,
             datatype=None, language=None, graph=None)
        for s, p, o in rows
    ]


def test_restriction_entailment(spark):
    # a ⊑ ∃p.c, c ⊑ d, x ⊑ a  ⟹  (x,p,c),(x,p,d),(a,p,c),(a,p,d)
    rows = _stmt_rows([
        ("x", "rdfs:subClassOf", "a"),
        ("c", "rdfs:subClassOf", "d"),
        ("a", "rdfs:subClassOf", "_:bn1"),
        ("_:bn1", "owl:onProperty", "p"),
        ("_:bn1", "owl:someValuesFrom", "c"),
    ])
    # fix stanza for blank-node rows (owner is 'a') — shape only matters
    stmts = spark.createDataFrame(
        rows,
        "stanza string, subject string, predicate string, object string, "
        "value string, datatype string, language string, graph string",
    )
    class_nodes = spark.createDataFrame(
        [("a",), ("c",), ("d",), ("x",)], ["id"]
    )
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in entail(stmts, class_nodes).collect()
    }
    want = {
        # reflexive + strict subclass
        ("a", "rdfs:subClassOf", "a"), ("c", "rdfs:subClassOf", "c"),
        ("d", "rdfs:subClassOf", "d"), ("x", "rdfs:subClassOf", "x"),
        ("x", "rdfs:subClassOf", "a"), ("c", "rdfs:subClassOf", "d"),
        # property entailment
        ("a", "p", "c"), ("a", "p", "d"), ("x", "p", "c"), ("x", "p", "d"),
    }
    assert got == want


def test_corpus_closure_matches_oracle(corpus, corpus_dfs):
    """Ontology part of the edge oracle (no SVO): canonicalize then
    entail must equal the hand-rolled BFS closure."""
    from kbase_cdm_ontologies_spark.operators.canonicalize import (
        apply_canonical,
        canonical_map,
    )
    from kbase_cdm_ontologies_spark.plans.pipeline import class_node_ids
    from kbase_cdm_ontologies_spark.sources.corpus import _closure_oracle

    stmts = corpus_dfs["statements"]
    cmap = canonical_map(stmts)
    canon_stmts = apply_canonical(stmts, cmap, ["subject", "object"])
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in entail(canon_stmts, class_node_ids(canon_stmts)).collect()
    }
    assert got == _closure_oracle(corpus)


def test_prune_keeps_only_logic(corpus_dfs):
    pruned = prune_for_closure(corpus_dfs["statements"])
    preds = {r["predicate"] for r in pruned.select("predicate").distinct().collect()}
    assert "rdfs:label" not in preds and "oio:hasExactSynonym" not in preds
    restr = restriction_axioms(pruned)
    assert restr.count() == 3


def test_long_chain_path_doubling(spark):
    """Chain of 200: path doubling converges in ~8 rounds, |closure| =
    n(n-1)/2 (stress of SURVEY.md §7.4 risk 2 at unit scale)."""
    n = 200
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    got = _tc(spark, edges)
    assert len(got) == n * (n - 1) // 2


def test_random_dag_matches_bfs(spark):
    """Random DAG (edges only i -> j with j > i) vs hand-rolled BFS."""
    import random

    rng = random.Random(7)
    n = 120
    edges = sorted(
        {
            (f"v{i:03d}", f"v{j:03d}")
            for _ in range(300)
            for i, j in [sorted(rng.sample(range(n), 2))]
        }
    )
    got = _tc(spark, edges)
    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
    want = set()
    for s in {e[0] for e in edges}:
        seen, stack = set(), [s]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        want |= {(s, o) for o in seen}
    assert got == want
