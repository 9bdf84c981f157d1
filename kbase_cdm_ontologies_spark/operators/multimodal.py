"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow-batched ``mapInPandas``.

``decode_image`` is a REAL pure-stdlib decoder for three formats —
PNG (zlib inflate + full filter reconstruction; color types
gray/gray+alpha/RGB/RGBA/palette at bit depth 8), BMP (uncompressed
24/32-bit BI_RGB), and PPM (binary P6) — plus ``encode_png`` /
``synthesize_image`` to generate real image bytes deterministically
for fixtures and the synthetic corpus. Formats outside those three
(JPEG etc.) raise NotImplementedError: a full codec zoo needs
PIL/opencv, which this container doesn't ship; ``fake=True`` keeps
the old hash-derived stub for plumbing-only tests.

mean_luma is the Rec.601 luma mean over pixels, normalized to [0, 1]:
mean(0.299 R + 0.587 G + 0.114 B) / 255 (gray value / 255 for
grayscale), rounded to 6 dp.

Scale notes: binary payloads dominate row size; keep
spark.sql.files.maxPartitionBytes at/below 128 MB so a partition of
images fits executor memory, and never shuffle the binary column —
derive features first, then join features (small) to whatever needs
them.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from binascii import crc32
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "asset_id string, n_bytes long, sha256 string, "
    "width int, height int, mean_luma double"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _fake_decode(data: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decode: derives plausible
    (width, height, mean_luma) from a content hash."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def _rgb_luma(r_sum: float, g_sum: float, b_sum: float, n_px: int) -> float:
    return round((0.299 * r_sum + 0.587 * g_sum + 0.114 * b_sum) / (n_px * 255.0), 6)


def _png_decode(data: bytes) -> tuple[int, int, float]:
    """PNG: parse chunks, inflate IDAT, undo scanline filters (all five:
    none/sub/up/average/paeth), then Rec.601 luma. Bit depth 8 only,
    non-interlaced (interlace needs Adam7 deinterleave — out of scope)."""
    pos = 8
    idat = bytearray()
    w = h = ct = bitd = inter = None
    plte = b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bitd, ct, _comp, _filt, inter = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if bitd != 8 or inter != 0:
        raise NotImplementedError(f"PNG bit depth {bitd} / interlace {inter}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    prev = bytearray(stride)
    out = bytearray()
    i = 0
    for _y in range(h):
        f = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        bpp = channels
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 255
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 255
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 255
        elif f != 0:
            raise ValueError(f"PNG: unknown filter {f}")
        out += line
        prev = line
    n_px = w * h
    if ct in (0, 4):  # gray / gray+alpha: luma is the gray channel
        return w, h, round(sum(out[0::channels]) / (n_px * 255.0), 6)
    if ct == 3:  # palette indices -> look up RGB triples
        rs = sum(plte[3 * i] for i in out)
        gs = sum(plte[3 * i + 1] for i in out)
        bs = sum(plte[3 * i + 2] for i in out)
        return w, h, _rgb_luma(rs, gs, bs, n_px)
    return w, h, _rgb_luma(
        sum(out[0::channels]), sum(out[1::channels]), sum(out[2::channels]), n_px
    )


def _bmp_decode(data: bytes) -> tuple[int, int, float]:
    """BMP: uncompressed (BI_RGB) 24/32-bit, bottom-up or top-down,
    BGR(A) order, rows padded to 4 bytes."""
    (offset,) = struct.unpack("<I", data[10:14])
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression {comp} / bpp {bpp}")
    h = abs(h_signed)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rs = gs = bs = 0
    for y in range(h):
        base = offset + y * row_bytes
        row = data[base : base + w * nch]
        bs += sum(row[0::nch])
        gs += sum(row[1::nch])
        rs += sum(row[2::nch])
    return w, h, _rgb_luma(rs, gs, bs, w * h)


def _ppm_decode(data: bytes) -> tuple[int, int, float]:
    """PPM binary (P6), maxval 255; header tokens may be separated by
    whitespace and # comments."""
    tokens: list[bytes] = []
    i = 2  # past 'P6'
    while len(tokens) < 3 and i < len(data):
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval}")
    i += 1  # single whitespace after maxval
    px = data[i : i + w * h * 3]
    return w, h, _rgb_luma(sum(px[0::3]), sum(px[1::3]), sum(px[2::3]), w * h)


def decode_image(data: bytes, fake: bool = False) -> tuple[int, int, float]:
    """(width, height, mean_luma) via the stdlib decoders; sniffs the
    container by magic bytes. fake=True keeps the hash-derived stub."""
    if fake:
        return _fake_decode(data)
    if data[:8] == _PNG_MAGIC:
        return _png_decode(data)
    if data[:2] == b"BM":
        return _bmp_decode(data)
    if data[:2] == b"P6":
        return _ppm_decode(data)
    raise NotImplementedError(
        "unsupported image container (PNG/BMP/PPM have stdlib decoders; "
        "JPEG and friends require PIL/opencv, not present here)"
    )


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal valid RGB8 PNG (filter 0 scanlines, one IDAT).
    rgb: width*height*3 bytes, row-major."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_image(seed: int, width: int = 24, height: int = 16) -> bytes:
    """Deterministic real PNG from a seed (plain arithmetic gradient —
    no RNG, identical across runs/partitions). Ground-truth stats are
    recomputable in tests from the same formula."""
    rgb = bytearray(width * height * 3)
    k = 0
    for y in range(height):
        for x in range(width):
            rgb[k] = (x * 7 + seed) % 256
            rgb[k + 1] = (y * 5 + 2 * seed) % 256
            rgb[k + 2] = (x + y + 3 * seed) % 256
            k += 3
    return encode_png(width, height, bytes(rgb))


def synthetic_image_assets(
    ids: DataFrame, id_col: str = "asset_id", seed_col: str = "seed"
) -> DataFrame:
    """(asset_id, data binary): real PNG bytes generated per row inside
    an Arrow-batched map — the fixture corpus for the decode kernel."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype(str),
                    "data": [
                        synthesize_image(int(s) % 100_000) for s in pdf[seed_col]
                    ],
                }
            )

    return ids.select(id_col, seed_col).mapInPandas(
        _gen, "asset_id string, data binary"
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
