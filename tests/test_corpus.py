"""Generator invariants (the golden-fixture discipline — SURVEY.md §5)."""

from kbase_cdm_ontologies_spark.functions.text_rules import extract_text
from kbase_cdm_ontologies_spark.sources.corpus import CorpusSpec, generate_corpus


def test_deterministic(corpus):
    c2 = generate_corpus(CorpusSpec(seed=42, n_pages=400))
    assert [p["html"] for p in c2.pages] == [p["html"] for p in corpus.pages]
    assert c2.expected_edges == corpus.expected_edges
    assert c2.expected_linked == corpus.expected_linked


def test_text_invariant_at_source(corpus):
    for p in corpus.pages:
        assert extract_text(p["html"]) == p["text"]


def test_shapes(corpus):
    assert len(corpus.pages) == 400
    assert len(corpus.statements) > 300
    assert len(corpus.expected_edges) > 500
    # canonicalization fixture: the equivalence chain collapsed
    assert corpus.expected_canon["CCC:0000011"] == "AAA:0000011"
    assert corpus.expected_canon["BBB:0000011"] == "AAA:0000011"
    assert corpus.expected_canon["CCC:0000007"] == "BBB:0000007"
    # owl:Nothing never appears in expected edges
    assert all("owl:Nothing" not in (s, o) for s, _, o in corpus.expected_edges)
