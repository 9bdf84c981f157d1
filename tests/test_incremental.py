"""Incremental ingest: delta detection, changed-content reprocessing,
equivalence with a full from-scratch run."""

import gzip

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.alias_dict import (
    build_alias_dict,
    with_candidate_counts,
)
from kbase_cdm_ontologies_spark.operators.doc_pipeline import fused_doc_pass
from kbase_cdm_ontologies_spark.plans.incremental import IncrementalDocPass


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_matches_full(spark, corpus_dfs, tmp_path):
    pages = corpus_dfs["pages"]
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    first = pages.where(F.col("url") < "https://example.org/p000300")
    rest = pages.where(F.col("url") >= "https://example.org/p000300")

    inc = IncrementalDocPass(spark, str(tmp_path / "inc"))
    s1 = inc.ingest(first, alias)
    assert s1["delta_pages"] == first.count()

    # batch 2: the new pages PLUS a re-send of already-seen pages
    s2 = inc.ingest(first.unionByName(rest), alias)
    assert s2["delta_pages"] == rest.count()  # dupes skipped
    assert s2["total_processed"] == pages.count()

    # re-send everything again: nothing to do
    s3 = inc.ingest(pages, alias)
    assert s3["delta_pages"] == 0

    assert _rows(inc.findings()) == _rows(fused_doc_pass(pages, alias))


def test_changed_content_reprocessed(spark, corpus, corpus_dfs, tmp_path):
    pages = corpus_dfs["pages"].limit(50).cache()
    alias = with_candidate_counts(build_alias_dict(corpus_dfs["statements"]))
    inc = IncrementalDocPass(spark, str(tmp_path / "inc2"))
    inc.ingest(pages, alias)

    # same url, new bytes (gzip wrapper changes the hash, not the text)
    p0 = pages.orderBy("url").first()
    changed = spark.createDataFrame(
        [(p0["url"], p0["warc_ts"], gzip.compress(bytes(p0["html"])), p0["text"], p0["lang"])],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    s = inc.ingest(changed, alias)
    assert s["delta_pages"] == 1
    # no duplicate findings for the reprocessed url
    findings = inc.findings()
    full = fused_doc_pass(pages, alias)
    assert _rows(findings) == _rows(full)