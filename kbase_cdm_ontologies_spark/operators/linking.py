"""M5 — entity linking: surface -> ontology term.

Two candidate-generation paths (north star: "TF-IDF cosine +
MinHash-LSH blocking"):

1. **Exact path** (`link_triples`): surfaces that are dictionary
   aliases join the broadcast alias table directly; an ambiguous alias
   (n_candidates > 1) is resolved by page context — candidate score =
   number of distinct unambiguous aliases on the same page from the
   candidate's source ontology, ties broken by min term_id. All
   built-in ops: broadcast joins + one window; the big (triples) side
   is never shuffled by alias key.

2. **Fuzzy path** (`fuzzy_candidates` / `fuzzy_link_best`): surfaces
   that are NOT dictionary aliases (typos, variants) are blocked
   against the alias table with MinHash-LSH over char-3gram shingles
   and re-ranked by exact n-gram Jaccard (TF-IDF cosine over terms is
   available via operators/similarity.tfidf_vectors + cosine_join for
   context-level re-ranking). Only same-signature pairs are scored —
   never a cross-join of corpus surfaces against the dictionary.

Skew note: hub aliases (fixture hot alias; production analog =
NCBITaxon-scale hub terms, reference README.md:104) concentrate join
keys. Dictionary sides are broadcast; the context join is an equi-join
on (url, source_onto) whose skew AQE splits at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page_onto_context(mentions: DataFrame, alias_with_counts: DataFrame) -> DataFrame:
    """(url, source_onto, ctx_score): distinct unambiguous aliases seen
    on the page, per candidate ontology."""
    unamb = (
        alias_with_counts.where(F.col("n_candidates") == 1)
        .select("alias_norm", "source_onto")
        .distinct()
    )
    return (
        mentions.select("url", "alias_norm")
        .distinct()
        .join(F.broadcast(unamb), "alias_norm")
        .groupBy("url", "source_onto")
        .agg(F.countDistinct("alias_norm").alias("ctx_score"))
    )


def _resolve_side(
    triples: DataFrame,
    surface_col: str,
    out_col: str,
    alias_with_counts: DataFrame,
    context: DataFrame,
) -> DataFrame:
    keep = list(triples.columns)
    cand = (
        alias_with_counts.select(
            F.col("alias_norm").alias(surface_col), "term_id", "source_onto"
        ).distinct()
    )
    joined = (
        triples.join(F.broadcast(cand), surface_col)
        .join(context, ["url", "source_onto"], "left")
        .withColumn("ctx_score", F.coalesce(F.col("ctx_score"), F.lit(0)))
    )
    w = Window.partitionBy(*keep).orderBy(F.desc("ctx_score"), F.asc("term_id"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*keep, F.col("term_id").alias(out_col))
    )


def _char_ngrams(colname: str, n: int = 3):
    """Character n-gram shingles of a (already normalized) surface
    column, as an array — JVM-side sequence+transform (SQL expr: the
    python substring() builder rejects column-valued positions)."""
    return F.expr(
        f"array_distinct(transform(sequence(0, greatest(length({colname}) - {n}, 0)), "
        f"i -> substring({colname}, i + 1, {n})))"
    )


def fuzzy_candidates(
    surfaces: DataFrame,
    alias: DataFrame,
    k_hashes: int = 12,
    min_jaccard: float = 0.4,
) -> DataFrame:
    """MinHash-LSH blocking + n-gram-Jaccard scoring for surfaces that
    are NOT exact dictionary aliases (typos, variant spellings) — the
    north-star's "TF-IDF cosine + MinHash-LSH blocking" candidate path.

    surfaces(surface_norm) x alias(term_id, alias_norm) ->
    (surface_norm, term_id, alias_norm, sim) ranked by char-3gram
    overlap. Blocking: md5-minhash over char-3gram shingles, one band
    per hash; only same-signature pairs are scored, so the alias table
    is never cross-joined against the corpus surfaces.
    """

    def sigs(df, col, out):
        grams = df.select(F.col(col).alias(out), F.explode(_char_ngrams(col)).alias("g"))
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("g")))).alias(f"_s{s}")
            for s in range(k_hashes)
        ]
        wide = grams.groupBy(out).agg(*aggs)
        stack = ", ".join(f"{s}, _s{s}" for s in range(k_hashes))
        return wide.select(out, F.expr(f"stack({k_hashes}, {stack}) AS (seed, sig)"))

    s_sig = sigs(surfaces.select("surface_norm").distinct(), "surface_norm", "surface_norm")
    a_sig = sigs(alias.select("alias_norm").distinct(), "alias_norm", "alias_norm")
    blocked = (
        s_sig.join(a_sig, ["seed", "sig"])
        .select("surface_norm", "alias_norm")
        .distinct()
    )
    # exact n-gram Jaccard re-rank on the blocked pairs only
    pair = blocked.select(
        "surface_norm",
        "alias_norm",
        _char_ngrams("surface_norm").alias("ga"),
        _char_ngrams("alias_norm").alias("gb"),
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    scored = pair.select(
        "surface_norm",
        "alias_norm",
        (inter / union).alias("sim"),
    ).where(F.col("sim") >= min_jaccard)
    return scored.join(
        F.broadcast(alias.select("alias_norm", "term_id").distinct()), "alias_norm"
    ).select("surface_norm", "term_id", "alias_norm", "sim")


def fuzzy_link_best(
    surfaces: DataFrame,
    alias: DataFrame,
    **kwargs,
) -> DataFrame:
    """Best term per surface: candidates from fuzzy_candidates, ranked
    by similarity then min term_id (deterministic)."""
    cand = fuzzy_candidates(surfaces, alias, **kwargs)
    w = Window.partitionBy("surface_norm").orderBy(F.desc("sim"), F.asc("term_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("surface_norm", "term_id", F.round("sim", 4).alias("sim"))
    )


def tfidf_context_scores(
    extracted: DataFrame,
    alias: DataFrame,
    candidates: DataFrame,
) -> DataFrame:
    """(url, term_id, tfidf_cosine) for candidate disambiguation pairs —
    the north star's "TF-IDF cosine" scoring: each candidate term's
    pseudo-document is the bag of its aliases, each page's document is
    its extracted text, both vectorized over ONE shared corpus (so IDF
    weights are comparable), scored with the sparse inverted-index
    cosine join restricted to the candidate pairs.

    candidates(url, term_id): the ambiguous pairs to score — both
    corpus sides are semi-joined down to them before vectorization, so
    the expensive explode/join work is proportional to the ambiguity
    set, not the corpus."""
    from .similarity import cosine_join, tfidf_vectors

    urls = candidates.select("url").distinct()
    terms = candidates.select("term_id").distinct()
    page_docs = (
        extracted.join(urls, "url", "left_semi")
        .select(F.concat(F.lit("u:"), F.col("url")).alias("id"),
                F.col("extracted_text").alias("text"))
    )
    term_docs = (
        alias.join(terms, "term_id", "left_semi")
        .groupBy("term_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_set("alias_norm"))).alias("text"))
        .select(F.concat(F.lit("t:"), F.col("term_id")).alias("id"), "text")
    )
    v = tfidf_vectors(page_docs.unionByName(term_docs), "id", "text")
    va = v.where(F.col("id").startswith("u:"))
    vb = v.where(F.col("id").startswith("t:"))
    scores = cosine_join(va, vb).select(
        F.expr("substring(id_a, 3)").alias("url"),
        F.expr("substring(id_b, 3)").alias("term_id"),
        F.col("cosine").alias("tfidf_cosine"),
    )
    return candidates.join(scores, ["url", "term_id"], "left").select(
        "url", "term_id", F.coalesce("tfidf_cosine", F.lit(0.0)).alias("tfidf_cosine")
    )


def link_triples_tfidf(
    raw_triples: DataFrame,
    alias_with_counts: DataFrame,
    extracted: DataFrame,
) -> DataFrame:
    """link_triples variant that disambiguates by TF-IDF cosine between
    the page text and each candidate term's alias bag (ties: min
    term_id). Same output shape as link_triples; the scoring join runs
    only over surfaces with >1 dictionary candidate."""
    triples = raw_triples.dropDuplicates(
        ["url", "subj_surface", "pred", "obj_surface"]
    )
    amb = alias_with_counts.where(F.col("n_candidates") > 1)
    cand_pairs = (
        triples.select("url", F.col("subj_surface").alias("alias_norm"))
        .unionByName(triples.select("url", F.col("obj_surface").alias("alias_norm")))
        .distinct()
        .join(F.broadcast(amb.select("alias_norm", "term_id").distinct()), "alias_norm")
        .select("url", "term_id")
        .distinct()
    )
    scores = tfidf_context_scores(
        extracted, alias_with_counts.select("term_id", "alias_norm"), cand_pairs
    )

    def resolve(df: DataFrame, surface_col: str, out_col: str) -> DataFrame:
        keep = list(df.columns)
        cand = alias_with_counts.select(
            F.col("alias_norm").alias(surface_col), "term_id"
        ).distinct()
        joined = (
            df.join(F.broadcast(cand), surface_col)
            .join(scores, ["url", "term_id"], "left")
            .withColumn("_score", F.coalesce(F.col("tfidf_cosine"), F.lit(0.0)))
        )
        w = Window.partitionBy(*keep).orderBy(F.desc("_score"), F.asc("term_id"))
        return (
            joined.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*keep, F.col("term_id").alias(out_col))
        )

    s = resolve(triples, "subj_surface", "subj_id")
    out = resolve(s, "obj_surface", "obj_id")
    return out.select("url", "subj_id", "pred", "obj_id")


def link_triples(
    raw_triples: DataFrame,
    alias_with_counts: DataFrame,
    mentions: DataFrame,
) -> DataFrame:
    """raw_triples(url, subj_surface, pred, obj_surface) ->
    linked(url, subj_id, pred, obj_id). Surfaces with no dictionary
    candidate drop out (inner join), mirroring the oracle. Input is
    deduplicated first — linking is per distinct (url, s, p, o)."""
    triples = raw_triples.dropDuplicates(
        ["url", "subj_surface", "pred", "obj_surface"]
    )
    context = page_onto_context(mentions, alias_with_counts)
    s = _resolve_side(triples, "subj_surface", "subj_id", alias_with_counts, context)
    out = _resolve_side(s, "obj_surface", "obj_id", alias_with_counts, context)
    return out.select("url", "subj_id", "pred", "obj_id")
