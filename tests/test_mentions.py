"""M2+M3: alias dictionary build + Aho-Corasick mention detection
against the plain-Python regex oracle (sources/corpus.py _link_oracle)."""

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.mentions import detect_mentions
from kbase_cdm_ontologies_spark.operators.text_extract import extract_text_stage


def test_alias_dict_matches_generator(corpus, corpus_dfs):
    built = build_alias_dict(corpus_dfs["statements"])
    got = {
        (r["term_id"], r["alias_norm"], r["kind"], r["source_onto"])
        for r in built.collect()
    }
    want = {
        (r["term_id"], r["alias_norm"], r["kind"], r["source_onto"])
        for r in corpus.alias_rows
    }
    assert got == want


def test_candidate_counts(corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    amb = {r["alias_norm"] for r in alias.where("n_candidates > 1").collect()}
    assert amb == {"omega factor"}


def test_mentions_match_oracle(corpus, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    extracted = extract_text_stage(corpus_dfs["pages"])
    ments = detect_mentions(extracted, alias)
    # compare mentions via unambiguous aliases (oracle stores only those)
    unamb_aliases = {
        r["alias_norm"] for r in alias.where("n_candidates = 1").collect()
    }
    got = {
        (r["url"], r["term_id"])
        for r in ments.select("url", "term_id", "alias_norm").distinct().collect()
        if r["alias_norm"] in unamb_aliases
    }
    assert got == corpus.expected_mentions


def test_hot_alias_skew_present(corpus, corpus_dfs):
    """The skew fixture: one alias must dominate the mention counts."""
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    extracted = extract_text_stage(corpus_dfs["pages"])
    ments = detect_mentions(extracted, alias)
    top = (
        ments.groupBy("alias_norm").count().orderBy("count", ascending=False).first()
    )
    assert top["count"] > 100  # ~60% of en pages carry the hot alias
