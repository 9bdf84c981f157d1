"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL functions (JVM, codegen); the
hashing primitive is md5 over strings so every result is reproducible
in any engine (the DuckDB oracles in __spark_entry__ recompute them
bit-for-bit).

Scale notes (100 TB corpus):
- exact dedup: one hash-shuffle on a 32-char digest — balanced keys by
  construction; group sizes are the duplicate clusters.
- MinHash: explode(tokens) is the big intermediate; distinct per
  (doc, token) first so hub tokens don't multiply, then k min-aggs
  which partial-aggregate map-side. Candidate join is on (seed,
  signature) — a hot signature (boilerplate text) is a real skew risk,
  handled by AQE skew-join + the band cap below.
- banded LSH: probability tuning via (bands, rows-per-band); pairs
  within a bucket are generated bucket-locally, with an explicit cap
  on bucket size (drop degenerate buckets, log them) so one viral
  boilerplate string can't emit O(n^2) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, token) pairs — whitespace tokenization."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks): per-document DISTINCT token set as one array — the
    zero-shuffle form of `tokens()`. All downstream consumers (min-hash,
    set Jaccard) are order- and multiplicity-insensitive, so the
    explode → distinct → groupBy round-trip of the long form is pure
    shuffle cost; array_distinct over the split does the same dedup
    inside the scan task. Documents with no tokens are dropped,
    matching the long form (they produce zero (id, token) rows)."""
    arr = F.array_distinct(
        F.filter(
            F.split(F.col(text_col), TOKEN_SPLIT_RE), lambda t: t != ""
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), arr.alias("toks"))
        .where(F.size("toks") > 0)
    )


def merge_token_arrays(toks_arr: DataFrame) -> DataFrame:
    """One (id, toks) row per id: toks = the distinct union of the
    duplicate rows' token sets — exactly the long form's
    DISTINCT (id, token) semantics. The per-row array path assumes
    unique ids; an input whose id space can collide (the bench's
    injected-twin frame once real doc_ids cross the +10000 offset —
    true from ~sf0.2 up) MUST merge before any per-id consumer, or the
    colliding doc gets two signature/verification rows where the
    oracle's DISTINCT-merged pipeline has one. A no-op on unique-id
    input (flatten of a one-element list), but it does cost one
    exchange of the token arrays — so signature-only consumers prefer
    the cheaper per-id min-merge inside minhash_signatures_wide.

    The explicit repartition(id) is load-bearing: the groupBy reuses it
    (hashpartitioning(id) satisfies the aggregate's distribution, so no
    extra exchange), and a user-specified partition count is exempt
    from AQE coalescing — consumers run EXPENSIVE per-row work (the
    k·|toks| md5 signature lambdas, the simhash explode) on the merge
    OUTPUT, and AQE sizing the exchange by its small input bytes would
    serialize that work onto one task."""
    n = toks_arr.sparkSession.sparkContext.defaultParallelism
    return (
        toks_arr.repartition(n, "id")
        .groupBy("id")
        .agg(F.array_distinct(F.flatten(F.collect_list("toks"))).alias("toks"))
    )


def minhash_signatures_wide(toks_arr: DataFrame, k: int = 8) -> DataFrame:
    """(id, _s0.._s{k-1}) from a (id, toks) array frame: per-row
    sig_i = array_min(md5(i || ':' || tok)) over the row's token set
    (identical to the groupBy-min over exploded tokens — min over
    strings = lexicographic array_min), then a per-id min-merge so
    duplicate-id rows collapse to the signature of their UNION set
    (min-hash distributes over union: sig(A ∪ B) = min(sig(A),
    sig(B))). The merge shuffles only k 32-char digests per row,
    map-side combined — on unique-id input it is a cheap identity
    exchange, and it is what keeps the array path bit-identical to the
    oracle's DISTINCT (doc_id, token) pipeline when the injected-twin
    id space collides with real ids (real from ~sf0.2 up)."""
    def _seed_hash(s: int):
        # closure factory: a 2-parameter lambda would be read by
        # PySpark as the (element, index) form of transform
        return lambda t: F.md5(F.concat(F.lit(f"{s}:"), t))

    cols = [
        F.array_min(F.transform(F.col("toks"), _seed_hash(s))).alias(f"_s{s}")
        for s in range(k)
    ]
    per_row = toks_arr.select("id", *cols)
    return per_row.groupBy("id").agg(
        *[F.min(f"_s{s}").alias(f"_s{s}") for s in range(k)]
    )


_PAIR_BLOCK = 1024  # ids per expansion block: bounds per-eval memory
# and splits one viral key group across tasks


def _group_pairs(keyed: DataFrame, *group_cols: str, max_bucket: int | None = None) -> DataFrame:
    """Distinct (id_a, id_b), id_a < id_b, for ids sharing a key group:
    ONE shuffle (groupBy collect_list) + in-task pair expansion +
    distinct, replacing the self-join formulation whose two join inputs
    each recompute the whole upstream.

    Expansion shape (the scale-critical part):

    1. Identical SORTED id sets collapse before expansion
       (``.distinct()`` on the array): near-dup clusters agree on many
       seeds/bands, so the same id set recurs once per agreeing key —
       the former shape expanded (and then pair-distinct'ed) each
       recurrence. The pair set of a group depends only on its id set,
       so deduping sets first is exact.
    2. Each set is cut into _PAIR_BLOCK-sized blocks of left-elements
       (explode of a stepped sequence) and the BLOCK rows are
       round-robin repartitioned: a user-specified repartition is
       AQE-coalescing-exempt (AQE sizes partitions by input bytes and
       cannot see the C(n,2) fan-out — a 2.2M-row frame once coalesced
       onto ONE task emitting ~10^8 pairs, a 30+ min straggler at
       sf1.0), and blocking also splits one viral group across tasks
       instead of pinning its whole C(n,2) on one task.
    3. Per block row, pairs stream through posexplode (left ids) +
       explode of the remaining suffix — peak per-eval memory is
       O(|set|), where the former single-eval
       ``flatten(transform(transform(...)))`` materialized ALL C(n,2)
       pair structs of a group at once (an uncapped hot group of ~46k
       ids = ~10^9 structs in one allocation: OOM on any heap).

    max_bucket: drop key groups larger than this (viral-bucket guard)
    — applied on the grouped sizes, identical to the former
    count-filter-join."""
    grouped = keyed.groupBy(*group_cols).agg(F.collect_list("id").alias("_ids"))
    if max_bucket is not None:
        grouped = grouped.where(F.size("_ids") <= max_bucket)
    sets = (
        grouped.where(F.size("_ids") >= 2)
        .select(F.sort_array("_ids").alias("_ids"))
        .distinct()
    )
    n_out = keyed.sparkSession.sparkContext.defaultParallelism * 4
    blocks = sets.select(
        "_ids",
        F.explode(
            F.sequence(F.lit(0), F.size("_ids") - 2, F.lit(_PAIR_BLOCK))
        ).alias("_b0"),
    ).repartition(n_out)
    lefts = blocks.select(
        "_ids",
        "_b0",
        F.posexplode(F.slice("_ids", F.col("_b0") + 1, _PAIR_BLOCK)).alias(
            "_p", "id_a"
        ),
    )
    return (
        lefts.select(
            "id_a",
            F.explode(
                F.slice(
                    "_ids", F.col("_b0") + F.col("_p") + 2, F.size("_ids")
                )
            ).alias("id_b"),
        )
        .distinct()
    )


def _fanout_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit exchange before a bucket-local self-join whose output
    FANS OUT quadratically per key group (C(n,2) pairs): AQE coalesces
    post-shuffle partitions by INPUT bytes and cannot see the fan-out,
    so a dense corpus lands the whole pair generation on one task
    (measured at sf1.0: a 2.2M-row frame coalesced to ONE task emitting
    ~10^8 pairs — a 30+ min straggler). A user-specified partition
    count is exempt from AQE coalescing."""
    n = df.sparkSession.sparkContext.defaultParallelism * 4
    return df.repartition(n, *cols)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Clusters of byte-identical documents:
    (rep_id, dup_id) for every duplicate, rep = min id of the cluster."""
    h = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h"))
    reps = h.groupBy("h").agg(
        F.min("id").alias("rep_id"), F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        h.join(reps, "h")
        .where((F.col("cluster_size") > 1) & (F.col("id") != F.col("rep_id")))
        .select("rep_id", F.col("id").alias("dup_id"))
    )


def minhash_signatures_from_tokens(toks: DataFrame, k: int = 8) -> DataFrame:
    """(id, seed, sig) from a prepared (id, token) frame — the shared
    signature stage: compute tokens ONCE (persist at the call site) and
    feed both candidate generation and exact verification.

    Shape: ONE groupBy with k min-aggregates (map-side combined), then
    an unpivot — not a tokens×seeds crossJoin, which would multiply the
    shuffle volume by k. Duplicate tokens need no distinct: min() is
    idempotent."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("token")))).alias(f"_s{s}")
        for s in range(k)
    ]
    wide = toks.groupBy("id").agg(*aggs)
    stack = ", ".join(f"{s}, _s{s}" for s in range(k))
    return wide.select(
        "id", F.expr(f"stack({k}, {stack}) AS (seed, sig)")
    ).select("id", F.col("seed").cast("int").alias("seed"), "sig")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """(id, seed, sig): k md5-based min-hashes over the token set.
    hash_i(tok) = md5(i || ':' || tok) — engine-portable determinism.
    Computed per row from the doc's distinct-token array (no explode,
    no shuffle), unpivoted to the long form."""
    wide = minhash_signatures_wide(token_arrays(df, id_col, text_col), k)
    stack = ", ".join(f"{s}, _s{s}" for s in range(k))
    return wide.select(
        "id", F.expr(f"stack({k}, {stack}) AS (seed, sig)")
    ).select("id", F.col("seed").cast("int").alias("seed"), "sig")


def minhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Near-dup candidates: pairs sharing the min-hash of ANY seed
    (banded LSH with 1 row per band). Returns distinct (id_a, id_b),
    id_a < id_b."""
    sig = minhash_signatures(df, id_col, text_col, k)
    return _group_pairs(sig, "seed", "sig")


def banded_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    tokens_arr_df: DataFrame | None = None,
) -> DataFrame:
    """Classic (b, r) MinHash-LSH: signature of b*r hashes, one bucket
    key per band = md5 of the band's r concatenated min-hashes.
    Buckets larger than max_bucket are dropped (boilerplate guard —
    'no silent caps': caller can count them via lsh_bucket_stats).

    tokens_arr_df: optional prepared (id, toks) array frame
    (token_arrays) — pass a persisted one to share the tokenize stage
    with the verification pass."""
    k = bands * rows_per_band
    if tokens_arr_df is not None:
        wide = minhash_signatures_wide(tokens_arr_df, k)
    else:
        wide = minhash_signatures_wide(token_arrays(df, id_col, text_col), k)
    # band bucket per row (no groupBy: the band's r sigs are already
    # columns) — md5 of the band's SORTED sigs, exactly the former
    # collect_list+sort_array key
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.array(
                        *[F.col(f"_s{b * rows_per_band + i}") for i in range(rows_per_band)]
                    )
                ),
            )
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    stack = ", ".join(f"{b}, _b{b}" for b in range(bands))
    band_key = (
        wide.select("id", *band_cols)
        .select("id", F.expr(f"stack({bands}, {stack}) AS (band, bucket)"))
        .select("id", F.col("band").cast("int").alias("band"), "bucket")
    )
    return _group_pairs(band_key, "band", "bucket", max_bucket=max_bucket)


def banded_lsh_jaccard(
    toks_arr: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    threshold: float = 0.5,
) -> DataFrame:
    """Fused banded-LSH candidates + exact set-Jaccard verify, bucket
    locally: the (id, token-set) rows travel ONCE into their band
    buckets and every same-bucket pair is verified in a vectorized
    pandas stage — the candidate pairs themselves are never shuffled
    or joined (the staged form shuffles the pair set three times:
    distinct + two attach-joins). Same guards as banded_lsh_pairs
    (viral buckets dropped at max_bucket; fan-out repartition keeps
    the quadratic expansion spread under AQE). Jaccard values are
    bit-identical to the JVM form (integer set sizes, one IEEE double
    division); a pair sharing several buckets is verified once per
    bucket with an identical result and deduped at the end. The
    size-ratio prune (jaccard ≤ min/max) uses a conservative epsilon
    so float rounding can never drop a qualifying pair.

    Returns distinct (id_a, id_b, jaccard RAW double) with
    jaccard >= threshold; callers round for presentation."""
    import pandas as pd

    k = bands * rows_per_band

    # duplicate-id rows must collapse to their union token set BEFORE
    # banding (the oracle tokenizes through DISTINCT (doc_id, token)):
    # the verify stage needs the merged SET itself, not just merged
    # signatures, and the two rows of a colliding id may band into
    # different buckets — so the sig-level min-merge is not enough here
    toks_arr = merge_token_arrays(toks_arr)

    # carry toks through the signature projection (no join)
    def _seed_hash(s: int):
        return lambda t: F.md5(F.concat(F.lit(f"{s}:"), t))

    sig_cols = [
        F.array_min(F.transform(F.col("toks"), _seed_hash(s))).alias(f"_s{s}")
        for s in range(k)
    ]
    wide = toks_arr.select("id", "toks", *sig_cols)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.array(
                        *[F.col(f"_s{b * rows_per_band + i}") for i in range(rows_per_band)]
                    )
                ),
            )
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    stack = ", ".join(f"{b}, _b{b}" for b in range(bands))
    keyed = (
        wide.select("id", "toks", *band_cols)
        .select("id", "toks", F.expr(f"stack({bands}, {stack}) AS (band, bucket)"))
        .select("id", "toks", F.col("band").cast("int").alias("band"), "bucket")
    )
    keyed = _fanout_repartition(keyed, "band", "bucket")
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in toks_arr.schema.fields
    )["id"]

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        if n < 2 or n > max_bucket:
            return empty
        pdf = pdf.sort_values("id")  # id_a < id_b via order
        ids = pdf["id"].to_numpy()
        sets = [frozenset(t) for t in pdf["toks"]]
        sizes = [len(s) for s in sets]
        out_a, out_b, out_j = [], [], []
        for i in range(n - 1):
            si, ni = sets[i], sizes[i]
            for j in range(i + 1, n):
                nj = sizes[j]
                lo, hi = (ni, nj) if ni <= nj else (nj, ni)
                if lo < threshold * hi - 1e-9:  # jaccard <= lo/hi < thr
                    continue
                inter = len(si & sets[j])
                union = ni + nj - inter
                jac = inter / union  # same IEEE division as the JVM
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})

    return (
        keyed.groupBy("band", "bucket")
        .applyInPandas(_verify, f"id_a {id_type}, id_b {id_type}, jaccard double")
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame,
    threshold: float = 0.5,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs:
    (id_a, id_b, jaccard) with jaccard >= threshold.

    Token-level join form: shuffles (id, token) rows — robust when
    single documents are huge. For bounded-size documents prefer
    jaccard_pairs_sets (one array_intersect per pair, no token-level
    fan-out shuffle)."""
    toks = tokens_df if tokens_df is not None else tokens(df, id_col, text_col)
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    ta = toks.select(F.col("id").alias("id_a"), "token")
    tb = toks.select(F.col("id").alias("id_b"), "token")
    inter = (
        candidates.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_sets(
    toks: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over candidates via per-doc token arrays:
    two equi-joins + one JVM array_intersect per pair, instead of the
    token-level fan-out join + groupBy of jaccard_pairs. The right
    shape when per-document token sets are bounded (web pages): the
    heavy shuffle is two (id -> array) joins on the candidate ids, and
    intersections never leave whole-stage codegen.

    toks: either the long (id, token) form (grouped to sets here) or a
    token_arrays (id, toks) frame, used directly — the zero-shuffle
    path.

    Attach-join strategy: when the per-doc set frame is provably small
    (one count, conf spark.graft.jaccard.broadcastSetRows, default
    200k — sized so token arrays stay inside the broadcast budget),
    broadcast it on BOTH sides so the candidate pairs never shuffle;
    a corpus-scale set frame falls back to shuffled joins under AQE."""
    from ..config import conf_threshold as _conf_threshold

    if "toks" in toks.columns:
        # merge duplicate-id rows to their union set — the long form's
        # groupBy collect_set does this implicitly
        sets = merge_token_arrays(toks).select(
            "id", F.col("toks").alias("tset")
        )
    else:
        sets = toks.groupBy("id").agg(F.collect_set("token").alias("tset"))
    bcast_cap = _conf_threshold(
        toks, "spark.graft.jaccard.broadcastSetRows", 200_000
    )
    if sets.count() <= bcast_cap:
        sets = F.broadcast(sets)
    a = sets.select(F.col("id").alias("id_a"), F.col("tset").alias("ta"))
    b = sets.select(F.col("id").alias("id_b"), F.col("tset").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size("ta") + F.size("tb") - inter
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct (id, shingle) word n-grams — JVM-side via split +
    transform over index range (no Python)."""
    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    # docs with < n tokens yield no shingles; the guard keeps sequence()
    # from ever seeing a descending (0, -1) span, which would make
    # slice() throw INVALID_PARAMETER_VALUE.START on short/empty docs
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def embedding_near_dup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    Exact all-pairs variant (the correctness baseline the LSH path in
    operators/similarity.py is measured against): norms are
    precomputed once, the self-join is a range-predicate nested-loop —
    viable to ~10^5 vectors per group. The scale path buckets with
    similarity.lsh_bucket first and runs this within buckets."""
    from .similarity import _dot, _norm  # shared JVM-side expressions

    v = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 5).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dup_bucketed(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 4,
    seed: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    backend: str = "gram",
) -> DataFrame:
    """The SCALE path for embedding near-dup: LSH-bucket first (seeded
    hyperplane signs), exact cosine only within buckets. Recall is
    governed by n_planes (each plane halves the candidate space and can
    split a true pair); composition is deterministic (md5-seeded
    planes), so it sits under the DuckDB oracle gate in queries.py.

    backend="gram" (default): each bucket's vectors are shipped to a
    vectorized pandas stage ONCE (n·dim doubles) and all C(n,2)
    cosines are computed there — vectorized ACROSS pairs, sequential
    ACROSS dimensions, i.e. the exact ((0+p0)+p1)+… left fold of the
    JVM expression, so every cosine is bit-identical to the join
    backend (and to the DuckDB oracle). The former equi-self-join paid
    an interpreted higher-order-function fold per pair (~2·dim lambda
    calls × C(n,2) pairs — the measured wall at sf1.0) and recomputed
    the scan+bucket subtree for both join sides. Python-side
    pre-filtering uses a sound margin (threshold - 1e-5 on the RAW
    cosine); the authoritative round+threshold gate stays in Spark.
    backend="join": the all-JVM equi-join formulation (kept for
    environments without the Python worker pool)."""
    from .similarity import _dot, _norm, _seeded_hyperplanes, lsh_bucket

    planes = _seeded_hyperplanes(dim, n_planes, seed)
    v = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
        .withColumn("bucket", lsh_bucket(F.col("v"), planes))
    )
    v = _fanout_repartition(v, "bucket")
    if backend == "gram":
        import numpy as np
        import pandas as pd

        id_type = dict(
            (f.name, f.dataType.simpleString()) for f in embeddings.schema.fields
        )[id_col]
        margin = threshold - 1e-5  # sound: wider than the 5-dp half-ulp

        def _bucket_gram(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            if n < 2:
                return empty
            pdf = pdf.sort_values("id")  # id_a < id_b via sorted order
            V = np.vstack(pdf["v"].to_numpy())
            nrm = pdf["nrm"].to_numpy()
            ids = pdf["id"].to_numpy()
            d = V.shape[1]
            # dim-major layout: the inner accumulation reads CONTIGUOUS
            # suffix slices (SIMD) instead of fancy-index gathers;
            # per a-row working set is O(n), so no pair-block chunking
            VT = np.ascontiguousarray(V.T)
            out_a, out_b, out_c = [], [], []
            for i in range(n - 1):
                acc = np.zeros(n - 1 - i)
                for k in range(d):  # exact JVM left fold, per dim
                    acc += VT[k, i] * VT[k, i + 1 :]
                cos = acc / (nrm[i] * nrm[i + 1 :])
                keep = cos >= margin
                if keep.any():
                    out_a.append(np.full(int(keep.sum()), ids[i]))
                    out_b.append(ids[i + 1 :][keep])
                    out_c.append(cos[keep])
            if not out_a:
                return empty
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "cosine": np.concatenate(out_c),
                }
            )

        pairs = v.groupBy("bucket").applyInPandas(
            _bucket_gram, f"id_a {id_type}, id_b {id_type}, cosine double"
        )
        return pairs.select(
            "id_a", "id_b", F.round("cosine", 5).alias("cosine")
        ).where(F.col("cosine") >= threshold)
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 5).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over the token set, built from the first 16 hex
    chars of md5(token). Bitwise majority vote expressed with built-in
    functions, ONE aggregation: per distinct (id, token) row, 64
    conditional-sum aggregates (one per bit, statically-shifted — all
    map-side combined), then the word reassembled from the 64 vote
    columns in a projection. The former shape exploded 64 bit rows per
    token (a 64x row blow-up through two shuffles); this shape shuffles
    64 longs per document. Bit values are identical: votes are
    order-independent integer sums, and the reassembly adds the same
    distinct powers of two (bit 63 as min-long, matching
    shiftleft(1,63) two's-complement).

    Returns (id, simhash long)."""
    # explode of the per-doc distinct token ARRAY: distinct (id, token)
    # rows without the long-form explode+distinct shuffle. Duplicate-id
    # rows merge to their union set first — votes are multiplicity-
    # sensitive, so a token present in both rows of a colliding id must
    # vote ONCE (the oracle's DISTINCT (doc_id, token) semantics)
    toks = merge_token_arrays(token_arrays(df, id_col, text_col)).select(
        "id", F.explode("toks").alias("token")
    )
    hashed = toks.select(
        "id",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long").alias("h60"),
        F.conv(F.substring(F.md5("token"), 16, 15), 16, 10).cast("long").alias("h60b"),
    )
    aggs = []
    for b in range(64):
        src, sh = ("h60", b) if b < 32 else ("h60b", b - 32)
        bit = F.expr(f"CAST(shiftright({src}, {sh}) % 2 AS INT)")
        aggs.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"_v{b}")
        )
    votes = hashed.groupBy("id").agg(*aggs)
    total = F.lit(0).cast("long")
    for b in range(64):
        power = -(1 << 63) if b == 63 else (1 << b)
        total = total + F.when(
            F.col(f"_v{b}") > 0, F.lit(power).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", total.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 16-bit
    chunks (pigeonhole: distance <= 3 => at least one of 4 chunks
    equal), so the join is equi- not cross-."""
    sh = simhash64(df, id_col, text_col)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("chunk"),
    ).withColumn(
        "ckey",
        F.expr("shiftright(simhash, CAST(chunk * 16 AS INT)) & 65535"),
    )
    # group-local pair expansion (same block-streaming shape as
    # _group_pairs, with the simhash carried in the struct payload)
    # instead of a self-join whose both sides recompute the whole
    # simhash aggregation. SimHash CONCENTRATES near-dup corpora into
    # shared chunk buckets by design, so the same hazards apply:
    # identical member sets recur across the 4 chunks (dedup before
    # expansion), and one viral bucket must neither materialize its
    # whole C(n,2) in a single eval nor pin it on one task.
    grouped = chunks.groupBy("chunk", "ckey").agg(
        F.sort_array(F.collect_list(F.struct("id", "simhash"))).alias("_m")
    )
    sets = (
        grouped.where(F.size("_m") >= 2).select("_m").distinct()
    )
    n_out = df.sparkSession.sparkContext.defaultParallelism * 4
    blocks = sets.select(
        "_m",
        F.explode(
            F.sequence(F.lit(0), F.size("_m") - 2, F.lit(_PAIR_BLOCK))
        ).alias("_b0"),
    ).repartition(n_out)
    lefts = blocks.select(
        "_m",
        "_b0",
        F.posexplode(F.slice("_m", F.col("_b0") + 1, _PAIR_BLOCK)).alias(
            "_p", "_a"
        ),
    )
    cand = (
        lefts.select(
            "_a",
            F.explode(
                F.slice("_m", F.col("_b0") + F.col("_p") + 2, F.size("_m"))
            ).alias("_b"),
        )
        .select(
            F.col("_a.id").alias("id_a"),
            F.col("_b.id").alias("id_b"),
            F.col("_a.simhash").alias("sh_a"),
            F.col("_b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
