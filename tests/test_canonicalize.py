"""M6: large-star/small-star connected components vs union-find oracle
(micro-fixtures from FIXTURES.md §7 + randomized graphs)."""

import random

import pytest

from kbase_cdm_ontologies_spark.operators.canonicalize import (
    apply_canonical,
    connected_components,
)
from kbase_cdm_ontologies_spark.sources.corpus import _union_find_canon


def _run_cc(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {r["id"]: r["canonical"] for r in connected_components(df).collect()}


def _oracle(pairs):
    nodes = {x for p in pairs for x in p}
    full = _union_find_canon(nodes, pairs)
    return full


def test_equiv_chain(spark):
    pairs = [("x", "y"), ("y", "z")]
    assert _run_cc(spark, pairs) == {"x": "x", "y": "x", "z": "x"}


def test_equiv_cycle(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    assert _run_cc(spark, pairs) == {"a": "a", "b": "a", "c": "a"}


def test_two_components(spark):
    pairs = [("n4", "n2"), ("n2", "n1"), ("n9", "n8")]
    got = _run_cc(spark, pairs)
    assert got == {"n4": "n1", "n2": "n1", "n1": "n1", "n9": "n8", "n8": "n8"}


def test_hot_hub(spark):
    """Skew fixture: one node with 500 edges (scaled-down 10k hub)."""
    pairs = [("hub", f"leaf{i:04d}") for i in range(500)]
    got = _run_cc(spark, pairs)
    assert len(set(got.values())) == 1
    assert set(got.values()) == {"hub"}  # 'hub' < 'leaf...'


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 100, 120), (3, 30, 60)])
def test_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = [
        (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}") for _ in range(m)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run_cc(spark, pairs) == _oracle(pairs)


def test_apply_canonical(spark):
    cmap = spark.createDataFrame([("b", "a"), ("c", "a")], ["id", "canonical"])
    df = spark.createDataFrame([("b", "x"), ("z", "c"), ("q", "q")], ["s", "o"])
    got = {(r["s"], r["o"]) for r in apply_canonical(df, cmap, ["s", "o"]).collect()}
    assert got == {("a", "x"), ("z", "a"), ("q", "q")}


@pytest.mark.parametrize("seed,n,m", [(4, 80, 100), (5, 40, 30)])
def test_hybrid_matches_forced_distributed(spark, seed, n, m):
    """All three execution regimes agree: pure-local (threshold above
    the edge count), fully distributed (threshold 0), and mixed
    (threshold hit after a couple of contraction rounds)."""
    rng = random.Random(seed)
    pairs = [
        (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}") for _ in range(m)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    want = _oracle(pairs)
    for thr in (10**6, 0, max(1, len(set(pairs)) // 2)):
        got = {
            r["id"]: r["canonical"]
            for r in connected_components(df, local_threshold=thr).collect()
        }
        assert got == want, f"threshold={thr}"
