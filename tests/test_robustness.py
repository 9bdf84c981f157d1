"""Robustness: different corpus seeds/sizes keep P/R = 1.0, and
adversarial page content survives the distributed doc pass."""

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.doc_pipeline import fused_doc_pass
from kbase_cdm_ontologies_spark.plans.pipeline import run_pipeline
from kbase_cdm_ontologies_spark.sources.corpus import (
    CorpusSpec,
    corpus_to_spark,
    generate_corpus,
)


def test_e2e_other_seed_and_bigger_dict(spark):
    """P/R = 1.0 must hold for a corpus the code was never tuned on:
    different seed, more terms, more pages per the same generator."""
    c = generate_corpus(CorpusSpec(seed=7, n_pages=250, n_terms=40))
    pages, stmts, _ = corpus_to_spark(spark, c)
    out = run_pipeline(spark, pages, stmts)
    got = {(r["subject"], r["predicate"], r["object"]) for r in out["edges"].collect()}
    want = c.expected_edges
    tp = len(got & want)
    assert tp / len(got) == 1.0 and tp / len(want) == 1.0


def test_adversarial_pages_through_fused_pass(spark, corpus_dfs):
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    from datetime import datetime

    a0, a1 = [r["alias_norm"] for r in alias.orderBy("alias_norm").limit(2).collect()]
    w0, w1 = a0.split(" ", 1)
    ts = datetime(2024, 1, 1)
    rows = [
        ("u:empty", ts, b"", "", "en"),
        ("u:invalid-utf8", ts, b"\xff\xfe<p>" + a0.encode() + b"</p>", "", "en"),
        ("u:huge-token", ts, b"<p>" + b"a" * 100_000 + b"</p>", "", "en"),
        ("u:only-script", ts, b"<script>" + a0.encode() + b"</script>", "", "en"),
        ("u:unicode", ts, f"<p>café naïve {a0}</p>".encode(), "", "en"),
        (
            "u:nested-tags", ts,
            f"<div><p><b>{w0}</b> {w1} regulates {a1}.</p></div>".encode(),
            "", "en",
        ),
        ("u:entities", ts, f"<p>{w0}&nbsp;{w1} &amp; beta</p>".encode(), "", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    fused = fused_doc_pass(df, alias).cache()
    by_url = {}
    for r in fused.collect():
        by_url.setdefault(r["url"], []).append(r)
    # script content never produces mentions
    assert "u:only-script" not in by_url
    # bold/nested inline tags don't break mention or SVO detection
    kinds = {r["kind"] for r in by_url.get("u:nested-tags", [])}
    assert "mention" in kinds and "svo" in kinds
    # unicode page still detects the embedded ASCII alias
    assert any(r["b"] == a0 for r in by_url.get("u:unicode", []))
    # &nbsp; is unescaped to U+00A0 which normalize_surface collapses
    assert any(r["b"] == a0 for r in by_url.get("u:entities", []))
    fused.unpersist()


def test_empty_inputs(spark):
    """Zero pages / zero statements: every stage degrades to empty
    outputs, not errors."""
    c = generate_corpus(CorpusSpec(seed=42, n_pages=0, build_oracle=False))
    pages, stmts, _ = corpus_to_spark(spark, c)
    out = run_pipeline(spark, pages, stmts)
    assert out["mentions"].count() == 0
    assert out["linked"].count() == 0
    assert out["edges"].count() > 0  # ontology closure still present
    empty_stmts = stmts.where(F.lit(False))
    out2 = run_pipeline(spark, pages, empty_stmts)
    assert out2["edges"].count() == 0
