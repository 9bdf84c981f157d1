"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched ``mapInPandas``.

The image/audio decode libraries are not in this container, so the
decode kernels are STUBS: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (md5
of the bytes -> pseudo pixel stats) stands in. Everything around the
kernel — schema, batch shape, partitioning, UDF signature — is real
and tested; swapping in PIL/torchaudio later changes only the kernel
body.

Scale notes: binary payloads dominate row size; keep
spark.sql.files.maxPartitionBytes at/below 128 MB so a partition of
images fits executor memory, and never shuffle the binary column —
derive features first, then join features (small) to whatever needs
them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "asset_id string, n_bytes long, sha256 string, "
    "width int, height int, mean_luma double"
)


def _fake_decode(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decode: derives plausible
    (width, height, mean_luma) from a content hash."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def decode_image(data: bytes, fake: bool = False) -> tuple[int, int, float]:
    if fake:
        return _fake_decode(data)
    raise NotImplementedError(
        "real image decoding requires PIL/opencv, not present in this "
        "environment; pass fake=True for the deterministic stub"
    )


def image_features(
    assets: DataFrame,
    id_col: str = "asset_id",
    bytes_col: str = "data",
    fake_decode: bool = True,
) -> DataFrame:
    """assets(asset_id, data binary, ...) -> per-asset features.
    Pure map (no shuffle); the binary column never leaves this stage."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "asset_id": [], "n_bytes": [], "sha256": [],
                "width": [], "height": [], "mean_luma": [],
            }
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(data)
                w, h, luma = decode_image(raw, fake=fake_decode)
                rows["asset_id"].append(aid)
                rows["n_bytes"].append(len(raw))
                rows["sha256"].append(hashlib.sha256(raw).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_luma"].append(luma)
            yield pd.DataFrame(rows)

    return assets.select(id_col, bytes_col).mapInPandas(_run, IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(
    assets: DataFrame,
    id_col: str = "asset_id",
    duration_col: str = "duration_s",
    fps: float = 0.5,
) -> DataFrame:
    """Video frame-sampling plumbing: expand each asset into the frame
    timestamps a decoder would extract (one row per planned frame),
    entirely JVM-side. The actual frame decode is the same stubbed
    kernel pattern as image_features."""
    n_frames = F.greatest(
        (F.col(duration_col) * fps).cast("int"), F.lit(1)
    )
    return assets.select(
        F.col(id_col).alias("asset_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("t_offset_s", F.round(F.col("frame_idx") / fps, 3))
