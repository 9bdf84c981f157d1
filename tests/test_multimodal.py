"""Multimodal plumbing: binary columns through mapInPandas, stubbed
decode kernel, frame-sampling plan."""

import hashlib

import pytest

from kbase_cdm_ontologies_spark.operators import multimodal


def test_image_features_deterministic(spark):
    assets = spark.createDataFrame(
        [("a1", b"\x89PNG fake bytes"), ("a2", b"other bytes")],
        "asset_id string, data binary",
    )
    got = {r["asset_id"]: r for r in multimodal.image_features(assets).collect()}
    for aid, raw in [("a1", b"\x89PNG fake bytes"), ("a2", b"other bytes")]:
        w, h, luma = multimodal._fake_decode(raw)
        r = got[aid]
        assert r["n_bytes"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()
        assert (r["width"], r["height"], round(r["mean_luma"], 6)) == (w, h, luma)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x", fake=False)


def test_frame_sample_plan(spark):
    assets = spark.createDataFrame(
        [("v1", 10.0), ("v2", 0.5)], "asset_id string, duration_s double"
    )
    rows = multimodal.frame_sample_plan(assets, fps=0.5).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append((r["frame_idx"], r["t_offset_s"]))
    assert sorted(by_asset["v1"]) == [(0, 0.0), (1, 2.0), (2, 4.0), (3, 6.0), (4, 8.0)]
    assert by_asset["v2"] == [(0, 0.0)]  # min one frame
