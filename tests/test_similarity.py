"""Similarity-search operators: brute-force exactness, LSH/IVF recall,
TF-IDF cosine sanity."""

import math
import random

import pytest

from kbase_cdm_ontologies_spark.operators import similarity

DIM = 16
N = 300


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(), rows


def _py_topk(rows, q, k):
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    return [
        i for i, _ in sorted(
            ((i, cos(v, q)) for i, v in rows), key=lambda t: (-t[1], t[0])
        )[:k]
    ]


def test_brute_force_exact(spark, emb_df):
    df, rows = emb_df
    q = rows[0][1]
    got = [r["vec_id"] for r in similarity.brute_force_topk(df, q, k=10).collect()]
    assert got == _py_topk(rows, q, 10)


def test_lsh_recall(spark, emb_df):
    """LSH bucket restricted to ~1/2^planes of vectors must still find
    most of the true top-k (same-bucket vectors are the similar ones)."""
    df, rows = emb_df
    q = rows[0][1]
    true10 = set(_py_topk(rows, q, 10))
    got = {r["vec_id"] for r in similarity.lsh_topk(df, q, k=10, n_planes=3).collect()}
    assert 0 in got  # the query vector itself shares its own bucket
    assert len(got & true10) >= 2  # recall floor for 3 planes on random data


def test_ivf_probes(spark, emb_df):
    df, rows = emb_df
    q = rows[5][1]
    assigned, cents = similarity.ivf_index(df, n_centroids=8)
    got = [r["vec_id"] for r in similarity.ivf_topk(assigned, cents, q, k=10, n_probe=8).collect()]
    # probing ALL centroids == brute force
    assert got == _py_topk(rows, q, 10)


def test_tfidf_cosine(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple banana apple"),
            (3, "cherry durian elderberry"),
        ],
        ["id", "text"],
    )
    v = similarity.tfidf_vectors(docs, "id", "text")
    sims = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_join(v, v).collect()
    }
    assert abs(sims[(1, 2)] - 1.0) < 1e-9
    assert abs(sims[(1, 1)] - 1.0) < 1e-9
    assert (1, 3) not in sims  # no shared terms
