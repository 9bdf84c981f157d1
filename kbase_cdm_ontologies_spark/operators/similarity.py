"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Dot products stay JVM-side via F.zip_with + F.aggregate (no Python).
- lsh_topk: random-hyperplane LSH — the scale path. Hyperplane signs
  bucket vectors; only same-bucket (± multi-probe) candidates are
  scored. Hyperplanes are derived deterministically from a seed via
  md5, so results are reproducible run-to-run.
- ivf_topk: IVF-style coarse quantization — k-means-lite centroids
  chosen deterministically (first n_centroids vectors by id), vectors
  assigned to nearest centroid at build; queries probe the nearest
  n_probe centroids. Demonstrates the partition-pruning pattern that
  matters at 10^9+ vectors: the scan reads only probed partitions.

TF-IDF cosine (the entity-linking re-ranker from the north star) is
`tfidf_vectors` + `cosine_join` below, over sparse (id, term, weight)
rows — pure joins/aggs, no UDF.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. One scan, one
    partial top-k per partition (takeOrdered semantics via orderBy+limit
    under AQE), no shuffle of the vectors themselves."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _seeded_hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from md5 bytes."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            for i in range(0, 16, 4):
                (u,) = struct.unpack(">I", h[i : i + 4])
                vals.append((u / 2**31) - 1.0)  # uniform [-1, 1)
            ctr += 1
        planes.append(vals[:dim])
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bit-string bucket id from hyperplane signs (column expression)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in pl])) >= 0, "1").otherwise("0")
        for pl in planes
    ]
    return F.concat(*bits)


def _probe_sequence(
    query_vec: list[float], planes: list[list[float]], n_probes: int
) -> list[str]:
    """Query-directed multi-probe sequence (Lv et al., VLDB'07 —
    public algorithm): the query's own bucket first, then buckets
    reached by flipping the planes whose decision boundary the query
    sits closest to (single flips, then pairs), ordered by the total
    boundary distance of the flipped planes."""
    dots = [sum(a * b for a, b in zip(query_vec, pl)) for pl in planes]
    qbits = ["1" if d >= 0 else "0" for d in dots]
    flips: list[tuple[float, tuple[int, ...]]] = []
    n = len(planes)
    for i in range(n):
        flips.append((abs(dots[i]), (i,)))
    for i in range(n):
        for j in range(i + 1, n):
            flips.append((abs(dots[i]) + abs(dots[j]), (i, j)))
    flips.sort()
    probes = ["".join(qbits)]
    for _, idxs in flips:
        if len(probes) >= n_probes:
            break
        bits = qbits[:]
        for i in idxs:
            bits[i] = "0" if bits[i] == "1" else "1"
        probes.append("".join(bits))
    return probes


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    round_dp: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    plus the n_probes-1 nearest perturbation buckets (multi-probe —
    recovers the recall a single probe loses at scale without adding
    hash tables). The bucket predicate is a literal IN-list, so at
    scale a bucket-partitioned layout prunes scan partitions.

    round_dp: round the cosine (and order by the rounded value) so the
    top-k cut is reproducible across engines with different float
    summation orders — the oracle-parity mode."""
    dim = len(query_vec)
    planes = _seeded_hyperplanes(dim, n_planes, seed)
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    probes = _probe_sequence(query_vec, planes, n_probes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_expr(F.col("v"), q)
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    return (
        emb.where(F.col("bucket").isin(probes))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _assign(emb: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, v, centroid_id): nearest centroid by cosine — the
    centroid vectors are plan literals, so assignment is one scan
    inside whole-stage codegen (no join, no shuffle)."""
    sims = [
        cosine_expr(F.col("v"), F.array(*[F.lit(x) for x in cv])).alias(f"c{cid}")
        for cid, cv in cents
    ]
    withsims = emb.select("vec_id", "v", *sims)
    best = F.greatest(*[F.col(f"c{cid}") for cid, _ in cents])
    pick = F.lit(None).cast("int")
    for cid, _ in cents:
        pick = F.when(F.col(f"c{cid}") == F.col("_best"), F.lit(cid)).otherwise(pick)
    return withsims.withColumn("_best", best).select(
        "vec_id", "v", pick.alias("centroid_id")
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 3,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Assign each vector to its nearest centroid after n_iters rounds
    of Lloyd's k-means (deterministic init: first n_centroids vectors
    by id — no RNG, reruns identical). Each round is one assignment
    scan + one mean-per-(centroid, dim) aggregation (posexplode ->
    partial-aggregating avg -> centroids collected to the driver;
    centroid tables are tiny by construction). Returns (assigned_df,
    centroids). At scale the assigned table is written partitioned by
    centroid_id — probing then prunes partitions at scan time."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.orderBy("vec_id").limit(n_centroids).collect()
    ]
    for _ in range(max(0, n_iters)):
        assigned = _assign(emb, cents)
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["centroid_id"], {})[r["pos"]] = r["m"]
        # empty centroids keep their previous position (standard Lloyd)
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in range(len(cv))] if cid in by_cid else cv,
            )
            for cid, cv in cents
        ]
    return _assign(emb, cents), cents


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the n_probe centroids nearest to the query, brute-force
    within them."""

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    probes = sorted(centroids, key=lambda c: -cos(c[1], query_vec))[:n_probe]
    probe_ids = [cid for cid, _ in probes]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("centroid_id").isin(probe_ids))
        .select("vec_id", cosine_expr(F.col("v"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# --- TF-IDF (sparse, join-based — the linking re-ranker) -------------------

def tfidf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_max_terms: int | None = None,
) -> DataFrame:
    """(id, term, w): tf * log((N+1)/(df+1)), L2-normalized per doc.

    Size-aware df-join: the per-term document-frequency table is
    vocabulary-sized — dictionary-scale for an ontology corpus but
    unbounded for web text — so it is broadcast only when one counting
    aggregate proves it small; otherwise it joins via shuffle on `term`
    with AQE choosing the physical strategy."""
    from .skew import BROADCAST_MAX_ROWS

    if broadcast_max_terms is None:
        broadcast_max_terms = BROADCAST_MAX_ROWS
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n")).collect()[0]["n"]
    dfreq = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))
    vocab_n = dfreq.count()
    dfj = F.broadcast(dfreq) if vocab_n <= broadcast_max_terms else dfreq
    w = tf.join(dfj, "term").select(
        "id",
        "term",
        (F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0))).alias("w"),
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.join(norms, "id").select(
        "id", "term", (F.col("w") / F.col("nrm")).alias("w")
    )


def cosine_join(va: DataFrame, vb: DataFrame, min_cosine: float = 0.0) -> DataFrame:
    """Sparse cosine between all pairs sharing at least one term:
    (id_a, id_b, cosine). Inverted-index join — the sparse-vector
    analog of a similarity self-join; term skew handled by AQE."""
    a = va.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = vb.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    return (
        a.join(b, "term")
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cosine"))
        .where(F.col("cosine") >= min_cosine)
    )
