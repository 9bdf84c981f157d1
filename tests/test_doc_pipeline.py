"""Fused single-pass doc operator must equal the staged operators."""

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.doc_pipeline import (
    fused_doc_pass,
    mentions_view,
    raw_triples_view,
)
from kbase_cdm_ontologies_spark.operators.mentions import detect_mentions
from kbase_cdm_ontologies_spark.operators.text_extract import extract_text_stage
from kbase_cdm_ontologies_spark.operators.triples import extract_triples


def test_fused_equals_staged(corpus_dfs):
    pages = corpus_dfs["pages"]
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    fused = fused_doc_pass(pages, alias).cache()

    staged_ext = extract_text_stage(pages)
    want_mentions = {
        tuple(r) for r in detect_mentions(staged_ext, alias).collect()
    }
    got_mentions = {tuple(r) for r in mentions_view(fused).collect()}
    assert got_mentions == want_mentions

    want_raw = {tuple(r) for r in extract_triples(staged_ext).collect()}
    got_raw = {tuple(r) for r in raw_triples_view(fused).collect()}
    assert got_raw == want_raw
    fused.unpersist()


def test_fused_pre_extracted_text(corpus_dfs):
    """text_col path (pre-extracted corpora, e.g. documents table)."""
    pages = corpus_dfs["pages"]
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    via_html = {tuple(r) for r in fused_doc_pass(pages, alias).collect()}
    via_text = {
        tuple(r) for r in fused_doc_pass(pages, alias, text_col="text").collect()
    }
    assert via_html == via_text  # extraction invariant, again
