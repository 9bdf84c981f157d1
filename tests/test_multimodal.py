"""Multimodal: REAL stdlib image decode (PNG/BMP/PPM) through the
Arrow-batched mapInPandas plumbing, plus the frame-sampling plan."""

import hashlib
import struct
import zlib

import pytest

from kbase_cdm_ontologies_spark.operators import multimodal


def _ground_truth(seed, width=24, height=16):
    """Recompute the synthesize_image stats from its own formula."""
    rs = gs = bs = 0
    for y in range(height):
        for x in range(width):
            rs += (x * 7 + seed) % 256
            gs += (y * 5 + 2 * seed) % 256
            bs += (x + y + 3 * seed) % 256
    n = width * height
    return round((0.299 * rs + 0.587 * gs + 0.114 * bs) / (n * 255.0), 6)


def test_png_roundtrip_matches_formula():
    for seed in (0, 7, 99_999):
        data = multimodal.synthesize_image(seed)
        w, h, luma = multimodal.decode_image(data)
        assert (w, h) == (24, 16)
        assert luma == _ground_truth(seed)


def _forward_filter(rows, filters, channels):
    """Apply PNG forward filters so every decoder branch is exercised."""
    stride = len(rows[0])
    out = b""
    prev = bytes(stride)
    bpp = channels
    for line, f in zip(rows, filters):
        enc = bytearray(line)
        if f == 1:
            for x in range(stride - 1, bpp - 1, -1):
                enc[x] = (enc[x] - line[x - bpp]) & 255
        elif f == 2:
            for x in range(stride):
                enc[x] = (enc[x] - prev[x]) & 255
        elif f == 3:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                enc[x] = (enc[x] - ((a + prev[x]) >> 1)) & 255
        elif f == 4:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (enc[x] - pr) & 255
        out += bytes([f]) + bytes(enc)
        prev = line
    return out


def test_png_all_filter_types():
    # 5 rows x 4 px RGB, one row per filter type 0..4
    rows = [bytes((r * 40 + c) % 256 for c in range(12)) for r in range(5)]
    raw = _forward_filter(rows, [0, 1, 2, 3, 4], channels=3)
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (
        multimodal._PNG_MAGIC
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    w, h, luma = multimodal.decode_image(png)
    flat = b"".join(rows)
    rs, gs, bs = sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3])
    assert (w, h) == (4, 5)
    assert luma == round((0.299 * rs + 0.587 * gs + 0.114 * bs) / (20 * 255.0), 6)


def test_png_grayscale():
    vals = bytes(range(0, 160, 10))  # 4x4 gray
    raw = b"".join(b"\x00" + vals[i : i + 4] for i in range(0, 16, 4))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    png = (
        multimodal._PNG_MAGIC
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    w, h, luma = multimodal.decode_image(png)
    assert (w, h) == (4, 4)
    assert luma == round(sum(vals) / (16 * 255.0), 6)


def test_bmp_decode():
    # 2x2 24-bit BMP, bottom-up, rows padded to 4 bytes (2*3=6 -> 8)
    px_bottom = bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00"  # BGR BGR pad
    px_top = bytes([70, 80, 90, 100, 110, 120]) + b"\x00\x00"
    pixel_data = px_bottom + px_top
    offset = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", offset + len(pixel_data), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    w, h, luma = multimodal.decode_image(header + pixel_data)
    bs = 10 + 40 + 70 + 100
    gs = 20 + 50 + 80 + 110
    rs = 30 + 60 + 90 + 120
    assert (w, h) == (2, 2)
    assert luma == round((0.299 * rs + 0.587 * gs + 0.114 * bs) / (4 * 255.0), 6)


def test_ppm_decode_with_comment():
    px = bytes(range(12))  # 2x2 RGB
    data = b"P6\n# a comment\n2 2\n255\n" + px
    w, h, luma = multimodal.decode_image(data)
    rs, gs, bs = sum(px[0::3]), sum(px[1::3]), sum(px[2::3])
    assert (w, h) == (2, 2)
    assert luma == round((0.299 * rs + 0.587 * gs + 0.114 * bs) / (4 * 255.0), 6)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff jpeg-ish")


def test_image_features_real_decode_in_spark(spark):
    ids = spark.createDataFrame(
        [(str(i), i) for i in range(8)], "asset_id string, seed long"
    )
    assets = multimodal.synthetic_image_assets(ids)
    got = {
        r["asset_id"]: r
        for r in multimodal.image_features(assets, fake_decode=False).collect()
    }
    for i in range(8):
        data = multimodal.synthesize_image(i)
        r = got[str(i)]
        assert r["n_bytes"] == len(data)
        assert r["sha256"] == hashlib.sha256(data).hexdigest()
        assert (r["width"], r["height"]) == (24, 16)
        assert r["mean_luma"] == _ground_truth(i)


def test_image_features_fake_path_kept(spark):
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
