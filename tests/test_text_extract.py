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


def test_gzip_payload(spark, corpus):
    """gzipped html decodes to the same text (reference gzip handling)."""
    import gzip

    from kbase_cdm_ontologies_spark.functions.text_rules import extract_text

    p = corpus.pages[0]
    assert extract_text(gzip.compress(p["html"])) == p["text"]
    # distributed path
    gz = spark.createDataFrame(
        [(p["url"], p["warc_ts"], gzip.compress(p["html"]), p["text"], p["lang"])],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    from kbase_cdm_ontologies_spark.operators.text_extract import (
        extract_text_stage,
        verify_byte_identical,
    )

    assert verify_byte_identical(gz, extract_text_stage(gz)) == 0
