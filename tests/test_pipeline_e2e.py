"""End-to-end: full pipeline vs the plain-Python oracle.

The north-rule gate: triple P/R >= 0.95 vs the reference-style golden
triple set (we target exact 1.0), plus checkpoint/resume semantics
(reference analog: version_tracker.py checksum skip)."""

import shutil

import pytest

from kbase_cdm_ontologies_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus_dfs):
    """One in-memory pipeline run shared by the assertion tests."""
    return run_pipeline(spark, corpus_dfs["pages"], corpus_dfs["statements"])


def _edge_set(df):
    return {
        (r["subject"], r["predicate"], r["object"]) for r in df.collect()
    }


def _precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return 0.0, 0.0
    tp = len(got & want)
    return tp / len(got), tp / len(want)


def test_e2e_precision_recall(spark, corpus, pipeline_out):
    out = pipeline_out
    got = _edge_set(out["edges"])
    p, r = _precision_recall(got, corpus.expected_edges)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.4f} R={r:.4f}; "
        f"extra={sorted(got - corpus.expected_edges)[:10]}, "
        f"missing={sorted(corpus.expected_edges - got)[:10]}"
    )
    # we actually target exactness on the fixture
    assert p == 1.0 and r == 1.0


def test_linked_triples_match_oracle(spark, corpus, pipeline_out):
    out = pipeline_out
    got = {
        (r["url"], r["subj_id"], r["pred"], r["obj_id"])
        for r in out["linked"].collect()
    }
    assert got == corpus.expected_linked


def test_nodes_table(spark, corpus, pipeline_out):
    nodes = {r["id"]: r for r in pipeline_out["nodes"].collect()}
    # only canonical ids appear
    assert all(corpus.expected_canon[i] == i for i in nodes)
    # merged term's synonyms folded into canonical node
    merged = nodes["AAA:0000011"]
    assert len(merged["synonyms"]) >= 3  # labels of AAA/BBB/CCC:11


def test_checkpoint_resume(spark, corpus, corpus_dfs, tmp_path):
    ckdir = str(tmp_path / "ck")
    out1 = run_pipeline(
        spark, corpus_dfs["pages"], corpus_dfs["statements"],
        checkpoint_dir=ckdir, corpus_fingerprint="fp-seed42",
    )
    edges1 = _edge_set(out1["edges"])
    ck1 = out1["checkpoints"]
    assert len(ck1.stages_run) == 8 and not ck1.stages_skipped
    # manifest records per-partition lineage
    m = ck1.manifest["m7_edges"]
    assert m["row_count"] == len(edges1)
    assert sum(m["partition_rows"].values()) == m["row_count"]

    # per-partition lineage is queryable (north rule: lineage + metrics)
    mdf = ck1.metrics_df()
    assert mdf.where("stage = 'm7_edges'").count() >= 1
    assert (
        mdf.where("stage = 'm7_edges'").groupBy().sum("rows").collect()[0][0]
        == len(edges1)
    )

    # resume: everything skipped, identical result
    out2 = run_pipeline(
        spark, corpus_dfs["pages"], corpus_dfs["statements"],
        checkpoint_dir=ckdir, corpus_fingerprint="fp-seed42",
    )
    ck2 = out2["checkpoints"]
    assert not ck2.stages_run and len(ck2.stages_skipped) == 8
    assert _edge_set(out2["edges"]) == edges1

    # partial resume: blow away a late stage, only downstream re-runs
    shutil.rmtree(ckdir + "/m7_edges")
    out3 = run_pipeline(
        spark, corpus_dfs["pages"], corpus_dfs["statements"],
        checkpoint_dir=ckdir, corpus_fingerprint="fp-seed42",
    )
    ck3 = out3["checkpoints"]
    assert ck3.stages_run == ["m7_edges"]
    assert "m1_extracted" in ck3.stages_skipped
    assert _edge_set(out3["edges"]) == edges1
