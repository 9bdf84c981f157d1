"""Entity linking: exact path (ambiguity resolution) + fuzzy path
(MinHash-LSH blocked, n-gram re-ranked)."""

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.linking import (
    fuzzy_candidates,
    fuzzy_link_best,
)


def test_ambiguous_alias_resolved_by_context(spark, corpus, corpus_dfs):
    """The 'omega factor' fixture: pages mentioning it must link to the
    term whose ontology dominates the page context (oracle rule)."""
    amb = {
        (u, s, p, o)
        for (u, s, p, o) in corpus.expected_linked
        if s.endswith("0000010") or o.endswith("0000010")
    }
    # covered in the e2e suite; here just assert the fixture exists
    # in at least one page so the rule is actually exercised
    assert any("omega factor" in pg["text"] for pg in corpus.pages)
    _ = amb


def test_fuzzy_candidates_find_typos(spark, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    real = [r["alias_norm"] for r in alias.limit(5).collect()]
    # introduce character-level typos: swap two middle characters
    def typo(s):
        mid = len(s) // 2
        return s[: mid - 1] + s[mid] + s[mid - 1] + s[mid + 1 :]

    surfaces = spark.createDataFrame(
        [(typo(a),) for a in real] + [("zzzz qqqq",)], ["surface_norm"]
    )
    best = {
        r["surface_norm"]: r["term_id"]
        for r in fuzzy_link_best(surfaces, alias, min_jaccard=0.3).collect()
    }
    amap = {r["alias_norm"]: r["term_id"] for r in alias.collect()}
    hits = sum(1 for a in real if best.get(typo(a)) == amap[a])
    assert hits >= 4  # typo'd surfaces link back to their true term
    assert "zzzz qqqq" not in best  # garbage stays unlinked


def test_fuzzy_exact_surface_scores_one(spark, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    a0 = alias.first()["alias_norm"]
    surfaces = spark.createDataFrame([(a0,)], ["surface_norm"])
    cand = fuzzy_candidates(surfaces, alias).collect()
    exact = [r for r in cand if r["alias_norm"] == a0]
    assert exact and abs(exact[0]["sim"] - 1.0) < 1e-9


def test_tfidf_context_rerank_disambiguates(spark):
    """TF-IDF strategy: the shared alias 'omega factor' must resolve to
    the term whose OTHER aliases overlap the page text."""
    from kbase_cdm_ontologies_spark.operators.linking import (
        link_triples_tfidf,
        tfidf_context_scores,
    )

    alias = spark.createDataFrame(
        [
            ("AAA:1", "omega factor", 2, "AAA"),
            ("BBB:1", "omega factor", 2, "BBB"),
            ("AAA:1", "alpha kinase", 1, "AAA"),
            ("BBB:1", "beta channel", 1, "BBB"),
        ],
        ["term_id", "alias_norm", "n_candidates", "source_onto"],
    )
    extracted = spark.createDataFrame(
        [
            ("u1", "the omega factor binds the alpha kinase pathway"),
            ("u2", "omega factor opens the beta channel gate"),
        ],
        ["url", "extracted_text"],
    )
    triples = spark.createDataFrame(
        [
            ("u1", "omega factor", "kg:activates", "alpha kinase"),
            ("u2", "omega factor", "kg:activates", "beta channel"),
        ],
        ["url", "subj_surface", "pred", "obj_surface"],
    )
    got = {
        (r["url"], r["subj_id"], r["obj_id"])
        for r in link_triples_tfidf(triples, alias, extracted).collect()
    }
    assert got == {("u1", "AAA:1", "AAA:1"), ("u2", "BBB:1", "BBB:1")}
    # score surface: candidate pairs get comparable scores, right one wins
    cand = spark.createDataFrame(
        [("u1", "AAA:1"), ("u1", "BBB:1")], ["url", "term_id"]
    )
    s = {
        r["term_id"]: r["tfidf_cosine"]
        for r in tfidf_context_scores(
            extracted, alias.select("term_id", "alias_norm"), cand
        ).collect()
    }
    assert s["AAA:1"] > s["BBB:1"]
