"""M1: distributed extraction must be byte-identical per url
(input_hint per-row invariant, checked via sha2 like
reference scripts/version_tracker.py:14-20)."""

from kbase_cdm_ontologies_spark.operators.text_extract import (
    extract_text_stage,
    verify_byte_identical,
)


def test_byte_identical(corpus_dfs):
    pages = corpus_dfs["pages"]
    extracted = extract_text_stage(pages)
    assert verify_byte_identical(pages, extracted) == 0


def test_schema_and_rowcount(corpus_dfs):
    pages = corpus_dfs["pages"]
    extracted = extract_text_stage(pages)
    assert extracted.columns == ["url", "warc_ts", "extracted_text", "lang"]
    assert extracted.count() == pages.count()
