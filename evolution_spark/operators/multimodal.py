"""Multimodal column support: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-preserving
transforms, deterministic fake decoders — is real and tested. The image and
audio codecs are REAL and dependency-free (pure numpy): 24-bit BMP, PNG
(truecolor/gray/palette, 8/16-bit, Adam7), GIF, TIFF, 16-bit PCM WAV, FLAC,
and JPEG in every mode — baseline
(SOF0), extended sequential (SOF1), progressive (SOF2, Annex G),
arithmetic-coded (SOF9/SOF10, Annex D QM-coder in ``jpeg_arith.py``),
lossless predictive (SOF3, Annex H in ``jpeg_lossless.py``, 8/16-bit), and
hierarchical (DHP/EXP pyramids in ``jpeg_hier.py``) —
each with a matching encoder for round-trip tests and mock-data
generation — round 12 completed the set with arithmetic lossless
(SOF11 in ``jpeg_lossless_arith.py``), so every SOF mode a real
encoder emits decodes. MP3 and
MP4/ISO-BMFF dispatch to their frame-/box-walker METADATA paths
(``mp3.py``/``mp4.py``) while their lossy bitstream decode raises
``NotImplementedError``; ``fake=True`` requests the deterministic fake
(hash-derived pixels/samples), which exercises every byte of the pipeline
except the codec itself.

Scale design: media bytes never shuffle — every transform here is a narrow
``mapInPandas`` over the scan, so a 100 TB image corpus processes at scan
speed with Arrow-batch transfer into Python only where a codec is genuinely
required.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video | binary
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def read_media_dir(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of media files into the canonical multimodal
    schema via Spark's ``binaryFile`` source: one row per file with the
    payload as an opaque binary column, kind sniffed from magic bytes
    (BM -> image, RIFF/WAVE -> audio, else video), ``media_id`` = a stable
    64-bit hash of the file path.

    Scale: binaryFile splits by file (one task per file group), payloads
    go straight into the scan's Arrow batches and — like every transform
    in this module — never shuffle; filters on ``kind``/``mime`` prune
    before any decode runs. Use ``glob`` (``pathGlobFilter``) to prune at
    LISTING time, which matters more than row filters when the directory
    holds billions of files."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    magic = F.substring(F.col("content"), 1, 4)
    # RIFF is a container family: require the WAVE fourcc at bytes 9-12 for
    # audio; RIFF....AVI is video; other RIFF forms stay opaque binary
    is_bmp = F.substring(F.col("content"), 1, 2) == F.lit(b"BM")
    is_png = F.substring(F.col("content"), 1, 8) == F.lit(_PNG_SIG)
    riff_form = F.substring(F.col("content"), 9, 4)
    is_wav = (magic == F.lit(b"RIFF")) & (riff_form == F.lit(b"WAVE"))
    is_avi = (magic == F.lit(b"RIFF")) & (riff_form == F.lit(b"AVI "))
    kind = (
        F.when(is_bmp | is_png, "image")
        .when(is_wav, "audio")
        .when(is_avi, "video")
        .otherwise("binary")
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        F.when(is_bmp, "image/bmp")
        .when(is_png, "image/png")
        .when(is_wav, "audio/wav")
        .when(is_avi, "video/x-msvideo")
        .otherwise("application/octet-stream")
        .alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: derives a pseudo-pixel buffer from the
    payload's sha256 — stable across runs/engines, exercises the full
    Arrow<->pandas path without a codec."""
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer((digest * 8)[:256], dtype=np.uint8).astype(np.float32)


# ---------------------------------------------------------------------------
# Real codecs (pure numpy, no dependencies): 24-bit BMP, 16-bit PCM WAV
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP to an RGB ``uint8`` array ``(height, width, 3)``,
    rows top-down: 24-bit uncompressed (both row orders, 4-byte row
    padding), and — round 13 — 8/4-bit PALETTE images, uncompressed or
    RLE8/RLE4 compressed (BI_RLE encoded-mode runs, absolute mode,
    end-of-line / end-of-bitmap / delta escapes per the public
    BITMAPINFOHEADER layout; RLE is bottom-up by definition, so a
    negative height refuses)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size} (need >= 40)")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    top_down, h = height < 0, abs(height)
    if width <= 0 or h == 0 or width * h > (1 << 26):
        raise ValueError(f"implausible BMP dimensions {width}x{height}")
    if bpp == 24 and compression == 0:
        stride = (width * 3 + 3) & ~3
        if data_offset + stride * h > len(payload):
            raise ValueError("BMP payload truncated")
        px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
        px = px.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
        if not top_down:
            px = px[::-1]
        return px[..., ::-1].copy()  # stored BGR -> returned RGB
    if bpp in (4, 8):
        return _decode_bmp_palette(payload, width, h, top_down, bpp,
                                   compression, header_size,
                                   data_offset)
    raise ValueError(
        f"unsupported BMP (bpp={bpp}, compression={compression}): "
        "24-bit uncompressed or 4/8-bit palette (raw or RLE4/RLE8)"
    )


def _decode_bmp_palette(payload, width, h, top_down, bpp, compression,
                        header_size, data_offset):
    clr_used = int.from_bytes(payload[46:50], "little")
    n_colors = clr_used or (1 << bpp)
    if n_colors > 1 << bpp:
        raise ValueError(f"BMP declares {n_colors} palette colors")
    pal_off = 14 + header_size
    pal_raw = payload[pal_off: pal_off + 4 * n_colors]
    if len(pal_raw) < 4 * n_colors:
        raise ValueError("BMP palette truncated")
    pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(n_colors, 4)
    rgb = pal[:, [2, 1, 0]]            # stored BGRA
    idx = np.zeros((h, width), dtype=np.uint8)
    if compression == 0:
        stride = ((width * bpp + 31) // 32) * 4
        if data_offset + stride * h > len(payload):
            raise ValueError("BMP payload truncated")
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=data_offset).reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :width].copy()
        else:
            nib = np.empty((h, stride * 2), dtype=np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :width].copy()
    elif compression in (1, 2):
        if (compression == 1) != (bpp == 8):
            raise ValueError(
                f"BMP RLE{4 if compression == 2 else 8} requires "
                f"{'8' if compression == 1 else '4'}-bit pixels, "
                f"got {bpp}"
            )
        if top_down:
            raise ValueError("RLE BMPs are bottom-up by definition")
        pos = data_offset
        x = y = 0              # y counts bottom-up rows
        end = len(payload)
        while True:
            if pos + 2 > end:
                raise ValueError("BMP RLE stream truncated")
            n, v = payload[pos], payload[pos + 1]
            pos += 2
            if n > 0:          # encoded run
                if y >= h or x + n > width:
                    raise ValueError("BMP RLE run overruns the row")
                if bpp == 8:
                    idx[y, x: x + n] = v
                else:
                    pair = np.array([v >> 4, v & 0x0F], dtype=np.uint8)
                    idx[y, x: x + n] = np.tile(pair, (n + 1) // 2)[:n]
                x += n
            elif v == 0:       # end of line
                x, y = 0, y + 1
            elif v == 1:       # end of bitmap
                break
            elif v == 2:       # delta
                if pos + 2 > end:
                    raise ValueError("BMP RLE delta truncated")
                x += payload[pos]
                y += payload[pos + 1]
                pos += 2
                if x > width or y > h:
                    raise ValueError("BMP RLE delta outside the image")
            else:              # absolute mode: v literal pixels
                if y >= h or x + v > width:
                    raise ValueError("BMP RLE absolute overruns the row")
                if bpp == 8:
                    nbytes = (v + 1) & ~1      # padded to even
                    raw = payload[pos: pos + nbytes]
                    if len(raw) < nbytes:
                        raise ValueError("BMP RLE absolute truncated")
                    idx[y, x: x + v] = np.frombuffer(
                        raw[:v], dtype=np.uint8)
                else:
                    nbytes = (((v + 1) // 2) + 1) & ~1
                    raw = payload[pos: pos + nbytes]
                    if len(raw) < nbytes:
                        raise ValueError("BMP RLE absolute truncated")
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    nib = np.empty(arr.size * 2, dtype=np.uint8)
                    nib[0::2] = arr >> 4
                    nib[1::2] = arr & 0x0F
                    idx[y, x: x + v] = nib[:v]
                pos += nbytes
                x += v
        idx = idx[::-1].copy()  # RLE wrote bottom-up rows
        top_down = True          # already top-down now
    else:
        raise ValueError(f"unsupported BMP compression {compression}")
    if (idx >= n_colors).any():
        raise ValueError("BMP palette index out of range")
    img = rgb[idx]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` RGB uint8 array as a 24-bit bottom-up BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {px.shape}")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    body = rows.tobytes()
    info = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little") + b"\x00" * 16
    )
    header = b"BM" + (14 + 40 + len(body)).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little")
    return header + info + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit depth, non-interlaced, no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decoder, dependency-free (stdlib ``zlib`` + numpy): walks
    the chunk list, inflates the IDAT stream, and reconstructs all five
    scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec
    (RFC 2083 §6). Supports 8- and 16-BIT (round 12; big-endian
    samples, byte-level filtering per spec) grayscale / gray+alpha /
    RGB / RGBA, PALETTE images (color type 3 at 1/2/4/8-bit packing,
    PLTE + optional tRNS alpha — the common web icon shape), and ADAM7
    interlacing (round 11). Returns ``(h, w, channels)`` (or ``(h, w)``
    for grayscale) — uint8, or uint16 for 16-bit depth; palette returns
    RGB, or RGBA when tRNS is present."""
    import zlib as _zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    color_type = bit_depth = interlace = None
    plte = trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type = body[8], body[9]
            interlace = body[12]
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"tRNS":
            trns = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + data + crc
    if width is None:
        raise ValueError("PNG payload missing IHDR")
    ok = (
        (color_type in _PNG_CHANNELS and bit_depth in (8, 16))
        or (color_type == 3 and bit_depth in (1, 2, 4, 8))
    ) and interlace in (0, 1)
    if not ok:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={bit_depth}, color_type="
            f"{color_type}, interlace={interlace}): 8/16-bit "
            "gray/gray+alpha/RGB/RGBA or 1/2/4/8-bit palette, "
            "non-interlaced or Adam7"
        )
    return _png_pixels(
        bytes(idat), width, height, bit_depth, color_type, interlace,
        plte, trns,
    )


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct the five PNG scanline filters over one (sub-)image.
    ``bpp`` is the filter byte offset (bytes per pixel, min 1 — sub-byte
    palette depths filter on whole bytes per spec)."""
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT stream has wrong length")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, data = lines[:, 0], lines[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f, row = int(filters[y]), data[y].astype(np.int32)
        if f == 0:  # None
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 1:  # Sub: sequential in x, vectorized across channels
            rec = row.copy()
            for x in range(bpp, stride, bpp):
                rec[x : x + bpp] = (rec[x : x + bpp] + rec[x - bpp : x]) & 0xFF
        elif f == 3:  # Average
            rec = row.copy()
            rec[:bpp] = (rec[:bpp] + (prev[:bpp].astype(np.int32) >> 1)) & 0xFF
            for x in range(bpp, stride, bpp):
                avg = (rec[x - bpp : x].astype(np.int32) + prev[x : x + bpp]) >> 1
                rec[x : x + bpp] = (rec[x : x + bpp] + avg) & 0xFF
        elif f == 4:  # Paeth
            rec = row.copy()
            rec[:bpp] = (rec[:bpp] + prev[:bpp]) & 0xFF  # left=0 -> up
            for x in range(bpp, stride, bpp):
                a = rec[x - bpp : x].astype(np.int32)
                b = prev[x : x + bpp].astype(np.int32)
                c = prev[x - bpp : x].astype(np.int32)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[x : x + bpp] = (rec[x : x + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on scanline {y}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.uint8)
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_rows_to_samples(rows: np.ndarray, width: int, bits: int,
                         ch: int) -> np.ndarray:
    """(h, stride_bytes) filtered-out rows -> (h, width*ch) samples,
    unpacking sub-byte palette depths MSB-first per spec."""
    h = rows.shape[0]
    if bits == 8:
        return rows[:, : width * ch]
    if bits == 16:
        # big-endian sample pairs (PNG spec §7.1); filtering already ran
        # on raw bytes, which is exactly the spec's byte-level rule
        b = rows[:, : width * ch * 2].astype(np.uint16)
        return (b[:, 0::2] << 8) | b[:, 1::2]
    unpacked = np.unpackbits(rows, axis=1)
    vals = unpacked.reshape(h, -1, bits)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint16)
    samples = (vals * weights).sum(axis=2)
    return samples[:, : width * ch].astype(np.uint8)


def _png_pixels(idat: bytes, width: int, height: int, bits: int,
                color_type: int, interlace: int, plte, trns) -> np.ndarray:
    import zlib as _zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    try:
        raw = _zlib.decompress(idat)
    except _zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}")

    def stride_of(w: int) -> int:
        return (w * ch * bits + 7) // 8

    bpp = max(1, ch * bits // 8)
    if interlace == 0:
        rows = _png_unfilter(raw, height, stride_of(width), bpp)
        samples = _png_rows_to_samples(rows, width, bits, ch)
        grid = samples.reshape(height, width, ch)
    else:  # Adam7
        grid = np.zeros(
            (height, width, ch),
            dtype=np.uint16 if bits == 16 else np.uint8,
        )
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = stride_of(pw)
            chunk = raw[pos: pos + ph * (stride + 1)]
            pos += ph * (stride + 1)
            rows = _png_unfilter(chunk, ph, stride, bpp)
            samples = _png_rows_to_samples(rows, pw, bits, ch)
            grid[y0::dy, x0::dx] = samples.reshape(ph, pw, ch)
        if pos != len(raw):
            raise ValueError("PNG IDAT stream has wrong length")
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = grid[..., 0]
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("PNG palette index exceeds PLTE size")
        rgb = table[idx]
        if trns is not None:
            if len(trns) > len(table):
                raise ValueError(
                    "PNG tRNS chunk longer than the PLTE palette"
                )
            alpha = np.full(len(table), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.concatenate(
                [rgb, alpha[idx][..., None]], axis=-1
            )
        return rgb
    return grid[..., 0] if ch == 1 else grid


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an array (``(h, w)`` gray, ``(h, w, 2/3/4)``) as a
    non-interlaced PNG — 8-bit for uint8 input, 16-bit (big-endian
    samples, round 12) for uint16. ``filter_type`` applies one filter
    (0-4) to every scanline — used by the tests/oracle to exercise each
    of the decoder's reconstruction paths; filtering operates on raw
    BYTES with a bytes-per-pixel offset, the spec's rule for every
    depth."""
    import zlib as _zlib

    px = np.asarray(pixels)
    depth = 16 if px.dtype == np.uint16 else 8
    if depth == 8:
        px = px.astype(np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if depth == 16:
        flat = (
            np.ascontiguousarray(px.reshape(h, w * ch).astype(">u2"))
            .view(np.uint8).astype(np.int32)
        )
    else:
        flat = px.reshape(h, w * ch).astype(np.int32)
    bpp = ch * depth // 8
    stride = w * bpp
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        left = np.zeros(stride, dtype=np.int32)
        left[bpp:] = row[:-bpp]
        upleft = np.zeros(stride, dtype=np.int32)
        upleft[bpp:] = prev[:-bpp]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = (row - left) & 0xFF
        elif filter_type == 2:
            enc = (row - prev) & 0xFF
        elif filter_type == 3:
            enc = (row - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (row - pred) & 0xFF
        lines.append(filter_type)
        lines += enc.astype(np.uint8).tobytes()
        prev = row

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib as _zlib

    crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
    return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    bit_depth: int = 8,
    trns: np.ndarray | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode a palette PNG (color type 3 — the common web icon/
    screenshot shape): ``indices`` (h, w) into ``palette`` (n, 3), with
    1/2/4/8-bit packing, optional tRNS alpha, optional Adam7 interlace.
    Filter 0 per scanline (the fixture encoder for the decoder's
    palette/sub-byte/Adam7 paths)."""
    import zlib as _zlib

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError(f"palette bit depth must be 1/2/4/8, got {bit_depth}")
    if int(idx.max(initial=0)) >= min(len(pal), 1 << bit_depth):
        raise ValueError("palette index exceeds palette/bit-depth capacity")

    def pack_rows(sub: np.ndarray) -> bytes:
        ph, pw = sub.shape
        out = bytearray()
        for y in range(ph):
            out.append(0)  # filter None
            if bit_depth == 8:
                out += sub[y].tobytes()
            else:
                bits = np.unpackbits(
                    sub[y][:, None], axis=1, count=8
                )[:, 8 - bit_depth:]
                out += np.packbits(bits.reshape(-1)).tobytes()
        return bytes(out)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.size:
                raw += pack_rows(sub)
        raw = bytes(raw)
    else:
        raw = pack_rows(idx)
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([bit_depth, 3, 0, 0, 1 if interlace else 0])
    )
    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", np.asarray(trns, np.uint8).tobytes())
    out += _png_chunk(b"IDAT", _zlib.compress(raw, 6))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def encode_png_adam7(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit truecolor/gray PNG with ADAM7 interlacing
    (filter 0 per scanline) — the fixture encoder for the decoder's
    interlaced path."""
    import zlib as _zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += sub[y].tobytes()
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 1])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to ``(samples, sample_rate)`` where samples is
    an ``int16`` array of shape ``(n_frames, n_channels)``. Walks the RIFF
    chunk list, so extra chunks (LIST/fact/...) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, n_channels, sample_rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            if audio_format != 1:
                raise ValueError(f"only PCM WAV supported (format={audio_format})")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    return samples.reshape(-1, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 array (``(n_frames,)`` or ``(n_frames, n_channels)``)
    as a 16-bit PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_channels = s.shape[1]
    body = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little") + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little") + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little") + b"WAVE" + fmt + data


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """REAL sample-rate conversion for 16-bit PCM WAV (pure numpy): decode,
    per-channel linear interpolation onto the target time grid, re-encode.
    The standard audio-normalization step before feature extraction (e.g.
    everything -> 16 kHz mono-friendly grids)."""
    samples, rate = decode_wav(payload)
    n_in = samples.shape[0]
    n_out = max(1, round(n_in * target_rate / rate))
    src_pos = np.arange(n_out) * (rate / target_rate)
    grid = np.arange(n_in)
    chans = [
        np.interp(src_pos, grid, samples[:, c].astype(np.float64))
        for c in range(samples.shape[1])
    ]
    out = np.stack(chans, axis=1)
    return encode_wav(np.round(out).astype(np.int16), target_rate)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a flat float32 sample array.

    REAL for BMP (24-bit + 4/8-bit palette incl. RLE4/RLE8), 8/16-bit PNG, GIF (incl. the first frame of
    animations — ``sample_frames`` walks full timelines), TIFF
    (baseline+LZW profile, first page — ``decode_tiff_pages`` walks
    multi-page chains), JPEG in every
    mode (baseline SOF0, extended sequential
    SOF1, progressive SOF2, arithmetic SOF9/SOF10/SOF11 via the T.81
    Annex D QM-coder, lossless SOF3 via Annex H prediction,
    hierarchical DHP/SOF5/SOF7 pyramids), lossless WebP (VP8L, RFC
    9649; a full lossy-VP8 key-frame decoder also exists in
    operators/vp8.py but this arbitrary-bytes dispatch keeps refusing
    it until its trained tables are conformance-verified — round 14,
    see decode_webp's docstring), 16-bit PCM WAV, and FLAC (pure-numpy
    decoders dispatched on magic bytes; ``decode_jpeg`` routes on the
    SOF marker). ``fake=True`` forces the deterministic fake decoder
    regardless of format (the test/CI path). Remaining gaps
    (lossy audio / video BITSTREAM decode — their metadata walkers are
    real) raise ``NotImplementedError`` naming the metadata path."""
    if fake:
        return _fake_decode(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)[0].astype(np.float32).ravel()
    if payload[:4] == b"fLaC":
        from evolution_spark.operators.flac import decode_flac

        return decode_flac(payload)[0].astype(np.float32).ravel()
    if payload[4:8] == b"ftyp":
        # ISO-BMFF (MP4/MOV/3GP): the container METADATA + keyframe
        # byte-index path is real (operators/mp4.py,
        # parse_mp4_metadata / keyframe_index); av bitstream decode
        # stays a declared refusal.
        raise NotImplementedError(
            "ISO-BMFF (MP4): codec bitstream decode is refused by "
            "design — use evolution_spark.operators.mp4."
            "parse_mp4_metadata / keyframe_index for the container "
            "metadata path (duration, tracks, resolutions, keyframe "
            "byte offsets)"
        )
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        # EBML magic (WebM/Matroska): the container METADATA + cue-index
        # path is real (operators/webm.py); VP8/VP9/AV1/Opus bitstream
        # decode stays a declared refusal.
        raise NotImplementedError(
            "WebM/Matroska: codec bitstream decode is refused by design "
            "— use evolution_spark.operators.webm.parse_webm_metadata / "
            "cue_index for the container metadata path (duration, "
            "tracks, resolutions, cue byte offsets)"
        )
    if payload[:4] == b"OggS":
        # OGG container: the page-walk METADATA path is real
        # (operators/ogg.py — duration from granule positions, codec id
        # headers); Vorbis/Opus decode stays a declared refusal.
        raise NotImplementedError(
            "OGG (Vorbis/Opus): audio decode is refused by design — use "
            "evolution_spark.operators.ogg.parse_ogg_metadata for the "
            "container metadata path (duration, codec, channels, rate)"
        )
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
    ):
        # MPEG-audio sync word (or an ID3v2-tagged stream): the
        # frame-header METADATA path is real (operators/mp3.py,
        # parse_mp3_metadata — duration/bitrate/rate/mode); lossy PCM
        # synthesis stays a declared refusal.
        raise NotImplementedError(
            "MPEG audio (MP3): PCM decode is refused by design — use "
            "evolution_spark.operators.mp3.parse_mp3_metadata for the "
            "frame-header metadata path (duration, bitrate, sample "
            "rate, channel mode)"
        )
    try:
        # ONE image dispatch table (decode_image_array); this flattens
        return decode_image_array(payload).astype(np.float32).ravel()
    except _UnrecognizedImage:
        pass
    raise NotImplementedError(
        f"decoding kind={kind!r}: only BMP, PNG, GIF, TIFF, JPEG (every "
        "non-arithmetic-lossless mode), PCM WAV and FLAC decode without a "
        "media codec library (PIL/soundfile/av, none installed) — pass "
        "fake=True for the deterministic test decoder"
    )


def cap_payload_partitions(
    df: DataFrame,
    max_payload_mb_per_batch: float,
    payload_col: str = "payload",
) -> DataFrame:
    """EXECUTABLE batch-size guard for payload-heavy decode stages
    (round 13 — this used to be docstring guidance only): bound the
    payload bytes any one task holds, so an Arrow batch handed to a
    Python decode worker can never exceed the cap regardless of row
    count (a batch of 10k x 5 MB TIFFs would otherwise materialize
    50 GB in one worker).

    Shape: (1) one cheap per-input-partition ``sum(length)`` aggregate
    — if EVERY partition is already under the cap, pass through with
    no shuffle at all; (2) otherwise compute each row's EXACT global
    byte offset (driver holds one (pid, bytes) pair per input
    partition — bounded state — whose prefix sums anchor the
    partition-local cumulative offsets computed inside the scan
    stage), assign bin = global_offset // cap, and range-repartition
    on the bin. Bins are exact cap-sized byte bins over a dense key
    space 0..n-1 with one requested partition per bin, so a task's
    payload is bounded by cap plus one row's overhang (a single row
    larger than the cap cannot be split); the final exchange is
    Spark's range partitioner, whose sampled boundaries over dense
    integer keys can in rare skew merge two adjacent bins (2x cap
    worst case). This is deterministic bin-packing, not round-robin-
    in-expectation — Spark's plain ``repartition(n)`` balances only
    on average and was measured 1.5x over its even share on small
    skewed inputs. The input is evaluated twice (sums pass + bucket
    pass), so ``df`` must be deterministic — true for scans and
    deterministic shuffles; a partition id that appears in the
    bucket pass but not the sums pass raises ValueError rather than
    silently anchoring at offset 0 (which would merge bins and
    degrade the cap)."""
    if max_payload_mb_per_batch <= 0:
        raise ValueError("max_payload_mb_per_batch must be positive")
    cap = int(max_payload_mb_per_batch * (1 << 20))
    cap = max(1, cap)
    per_part = df.groupBy(
        F.spark_partition_id().alias("__pid")
    ).agg(F.sum(F.coalesce(F.length(payload_col),
                           F.lit(0))).alias("__b")).collect()
    if not per_part:
        return df
    if all((r["__b"] or 0) <= cap for r in per_part):
        return df
    base: dict = {}
    acc = 0
    for r in sorted(per_part, key=lambda r: r["__pid"]):
        base[int(r["__pid"])] = acc
        acc += int(r["__b"] or 0)
    n = int(max(1, -(-acc // cap)))
    cols = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("__bucket", LongType(), False)]
    )
    with_pid = df.withColumn("__pid", F.spark_partition_id())

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offset = None
        for pdf in batches:
            if len(pdf) and offset is None:
                # exact global anchor for this partition's offsets;
                # a pid unseen in the sums pass means the two
                # evaluations of df did not agree (nondeterministic
                # upstream, task retry with different partitioning,
                # AQE re-coalesce) — anchoring at 0 would silently
                # pile several bins into one task, so fail loudly
                # instead of degrading the cap guarantee
                pid = int(pdf["__pid"].iloc[0])
                if pid not in base:
                    raise ValueError(
                        "cap_payload_partitions: partition id "
                        f"{pid} was not seen in the byte-sums "
                        "pass — the input DataFrame is not "
                        "deterministic across evaluations (see "
                        "docstring); cache() or localCheckpoint() "
                        "the input before capping"
                    )
                offset = base[pid]
            lens = pdf[payload_col].map(
                lambda p: len(p) if p is not None else 0
            ).to_numpy()
            starts = (offset or 0) + np.concatenate(
                ([0], np.cumsum(lens[:-1]))
            ) if len(lens) else np.array([], dtype=np.int64)
            if offset is not None:
                offset += int(lens.sum())
            out = pdf[cols].copy()
            out["__bucket"] = (starts // cap).astype(np.int64)
            yield out

    bucketed = with_pid.mapInPandas(_bucket, out_schema)
    return bucketed.repartitionByRange(n, "__bucket").drop("__bucket")


def extract_features(
    df: DataFrame,
    fake: bool = True,
    max_payload_mb_per_batch: float | None = None,
) -> DataFrame:
    """payload -> fixed-width feature vector via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); batch shape: the pandas iterator
    yields input-partition-sized chunks, and each output row carries a
    FEATURE_DIM float vector. ``max_payload_mb_per_batch`` applies
    :func:`cap_payload_partitions` first (multi-MB payload corpora)."""
    if max_payload_mb_per_batch is not None:
        df = cap_payload_partitions(df, max_payload_mb_per_batch)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                raw = decode_media(bytes(payload), "any", fake=fake)
                # mean-pool into FEATURE_DIM buckets
                pooled = raw[: (len(raw) // FEATURE_DIM) * FEATURE_DIM].reshape(
                    FEATURE_DIM, -1
                ).mean(axis=1)
                feats.append([float(x) for x in pooled])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for 24-bit BMP payloads (pure numpy):
    decode -> index-map sample -> re-encode. The standard decimation/
    upsample kernel; no interpolation library needed."""
    px = decode_bmp(payload)  # (h, w, 3) uint8
    src_h, src_w = px.shape[0], px.shape[1]
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return encode_bmp(px[rows][:, cols])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = True,
    max_payload_mb_per_batch: float | None = None,
) -> DataFrame:
    """Image resize over Arrow-batched mapInPandas.
    ``max_payload_mb_per_batch`` applies :func:`cap_payload_partitions`
    first (this stage holds decoded pixels AND re-encoded output rows).

    REAL for every supported image format when ``fake=False`` (round 11:
    BMP/PNG/GIF/TIFF/JPEG all decode via ``decode_image_array``) —
    spatial nearest-neighbor resample, re-encoded as a valid BMP (the
    canonical raw container for downstream feature extraction).
    ``fake=True`` keeps the deterministic byte-resample stub (the CI
    path for opaque payloads)."""
    if max_payload_mb_per_batch is not None:
        df = cap_payload_partitions(df, max_payload_mb_per_batch)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                    continue
                raw_bytes = bytes(payload)
                if not fake:
                    arr = decode_image_array(raw_bytes)
                    if arr.ndim == 2:
                        arr = np.repeat(arr[..., None], 3, axis=-1)
                    h0, w0 = arr.shape[:2]
                    rows = (np.arange(height) * h0) // height
                    cols = (np.arange(width) * w0) // width
                    out.append(encode_bmp(arr[np.ix_(rows, cols)]))
                    continue
                raw = decode_media(raw_bytes, "image", fake=fake)
                resized = np.resize(raw, target).astype(np.uint8)
                out.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize, _RESIZE_SCHEMA)


_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    fake: bool = True,
    max_payload_mb_per_batch: float | None = None,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (row-expanding
    mapInPandas — the streaming-friendly shape for frame extraction at
    scale). REAL for animated GIFs (``fake=False``): frames sample
    EVENLY across the composited animation timeline via the from-spec
    GIF decoder. True video containers (mp4/webm) still need av and use
    the deterministic fake. ``max_payload_mb_per_batch`` applies
    :func:`cap_payload_partitions` first (animations composite every
    timeline frame in memory)."""
    if max_payload_mb_per_batch is not None:
        df = cap_payload_partitions(df, max_payload_mb_per_batch)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from evolution_spark.operators.gif import decode_gif

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if not fake and payload[:6] in (b"GIF87a", b"GIF89a"):
                    all_frames, _delays = decode_gif(payload)
                    n = all_frames.shape[0]
                    picks = np.unique(
                        np.linspace(0, n - 1, min(n_frames, n)).round()
                        .astype(int)
                    )
                    for i, fi in enumerate(picks):
                        ids.append(media_id)
                        idxs.append(i)
                        frames.append(
                            all_frames[fi].astype(np.uint8).tobytes()
                        )
                    continue
                if (not fake
                        and payload[: len(_PNG_SIG)] == _PNG_SIG):
                    from evolution_spark.operators.apng import (
                        decode_apng,
                        is_apng,
                    )

                    if is_apng(payload):
                        timeline = decode_apng(payload)
                        n = len(timeline)
                        picks = np.unique(
                            np.linspace(0, n - 1, min(n_frames, n))
                            .round().astype(int)
                        )
                        for i, fi in enumerate(picks):
                            ids.append(media_id)
                            idxs.append(i)
                            frames.append(
                                timeline[fi][1][..., :3]
                                .astype(np.uint8).tobytes()
                            )
                        continue
                if (not fake and payload[:4] == b"RIFF"
                        and payload[8:12] == b"WEBP"):
                    from evolution_spark.operators.webp import (
                        decode_webp_animation,
                    )

                    timeline = decode_webp_animation(payload)
                    n = len(timeline)
                    picks = np.unique(
                        np.linspace(0, n - 1, min(n_frames, n)).round()
                        .astype(int)
                    )
                    for i, fi in enumerate(picks):
                        ids.append(media_id)
                        idxs.append(i)
                        frames.append(
                            timeline[fi][1][..., :3].astype(np.uint8)
                            .tobytes()
                        )
                    continue
                raw = decode_media(payload, "video", fake=fake)
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    # deterministic per-frame slice of the fake decode
                    frames.append(np.roll(raw, i).astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_sample, _FRAMES_SCHEMA)


_PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("container", StringType(), True),
        StructField("kind", StringType(), True),
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_us", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("error", StringType(), True),
    ]
)


def _image_dims_header(payload: bytes):
    """(container, width, height) from image HEADERS only — no pixel
    decode (the probe path must stay cheap on 100 MB scans): PNG IHDR,
    BMP info header, GIF logical screen, TIFF IFD tags 256/257, JPEG
    SOFx scan. None for unrecognized magics."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        if len(payload) < 24:
            raise ValueError("PNG IHDR truncated")
        return ("png", int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"))
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("BMP header truncated")
        return ("bmp", int.from_bytes(payload[18:22], "little"),
                int.from_bytes(payload[22:26], "little"))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("GIF screen descriptor truncated")
        return ("gif", int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"))
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from evolution_spark.operators.tiff import _read_ifds

        tags, _bo = _read_ifds(payload)[0][0], None
        if 256 not in tags or 257 not in tags:
            raise ValueError("TIFF missing dimension tags")
        return ("tiff", int(tags[256][0]), int(tags[257][0]))
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker stream desynced")
            marker = payload[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (
                0xC4, 0xC8, 0xCC
            ):
                return ("jpeg",
                        int.from_bytes(payload[pos + 7: pos + 9], "big"),
                        int.from_bytes(payload[pos + 5: pos + 7], "big"))
            size = int.from_bytes(payload[pos + 2: pos + 4], "big")
            pos += 2 + size
        raise ValueError("JPEG has no SOF marker")
    return None


def probe_media(df: DataFrame) -> DataFrame:
    """ONE metadata probe over a mixed corpus — the curation entry
    point: dispatch every payload on its magic bytes to the right walker
    (MP3 frames / MP4 boxes / WebM EBML / OGG pages / WebP RIFF / WAV /
    FLAC STREAMINFO / the image headers) and return one unified row per
    payload with container, kind, codec, resolution, duration, and
    audio params; malformed payloads surface their ValueError text in
    ``error`` instead of failing the job (the quarantine pattern).
    Unknown magics probe as container=None with the byte count only.

    Scale shape: header-only parsing inside Arrow-batched mapInPandas —
    no pixel/sample decode, payload bytes never shuffle."""
    return df.mapInPandas(_probe_batches, _PROBE_SCHEMA)


def probe_one_payload(payload: bytes):
    """Header-only probe of ONE payload (the per-row worker behind
    :func:`probe_media`, module-level so contracts are unit-testable):
    returns (container, kind, codec, width, height, duration_us,
    sample_rate, channels) or raises ValueError."""
    from evolution_spark.operators.mp3 import parse_mp3_metadata
    from evolution_spark.operators.mp4 import parse_mp4_metadata
    from evolution_spark.operators.ogg import parse_ogg_metadata
    from evolution_spark.operators.webm import parse_webm_metadata

    if payload[4:8] == b"ftyp":
        from evolution_spark.operators.mp4 import (
            is_heif_brand,
            parse_heif_metadata,
        )

        if is_heif_brand(payload):
            hm = parse_heif_metadata(payload)
            container = "avif" if hm["brand"].startswith("avi") \
                else "heif"
            return (container, "image", hm["codec"], hm["width"],
                    hm["height"], None, None, None)
        m = parse_mp4_metadata(payload)
        v = next((t for t in m["tracks"] if t["handler"] == "vide"),
                 None)
        a = next((t for t in m["tracks"] if t["handler"] == "soun"),
                 None)
        return ("mp4", "video" if v else "audio",
                (v or a or {}).get("codec"),
                v["width"] if v else None,
                v["height"] if v else None,
                m["duration_us"],
                a["sample_rate"] if a else None,
                a["channels"] if a else None)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        m = parse_webm_metadata(payload)
        v = next((t for t in m["tracks"] if t["track_type"] == 1),
                 None)
        a = next((t for t in m["tracks"] if t["track_type"] == 2),
                 None)
        return (m["doctype"], "video" if v else "audio",
                (v or a or {}).get("codec_id"),
                v["width"] if v else None,
                v["height"] if v else None,
                m["duration_us"],
                a["sample_rate"] if a else None,
                a["channels"] if a else None)
    if payload[:4] == b"OggS":
        m = parse_ogg_metadata(payload)
        return ("ogg", "audio", m["codec"], None, None,
                m["duration_us"], m["sample_rate"], m["channels"])
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
    ):
        m = parse_mp3_metadata(payload)
        return ("mp3", "audio", f"mp3_layer{m['layer']}", None,
                None, m["duration_us"], m["sample_rate"],
                m["channels"])
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from evolution_spark.operators.webp import parse_webp_metadata

        m = parse_webp_metadata(payload)
        codec = {"lossy": "vp8", "lossless": "vp8l"}.get(
            m["flavor"], "vp8x_anim" if m["animated"] else "vp8x"
        )
        dur = (m["duration_ms"] * 1000 if m["duration_ms"] is not None
               else None)
        return ("webp", "image", codec, m["width"], m["height"], dur,
                None, None)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # fmt chunk only — no sample decode. Read wFormatTag and
        # wBitsPerSample so 8/24/32-bit and float WAVs get correct
        # durations and codec labels instead of a silent s16 guess.
        pos, n_frames, rate, ch, tag, bits = 12, None, None, None, \
            None, None
        while pos + 8 <= len(payload):
            cid = payload[pos: pos + 4]
            size = int.from_bytes(payload[pos + 4: pos + 8],
                                  "little")
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("WAV fmt chunk too short")
                tag = int.from_bytes(
                    payload[pos + 8: pos + 10], "little")
                ch = int.from_bytes(
                    payload[pos + 10: pos + 12], "little")
                rate = int.from_bytes(
                    payload[pos + 12: pos + 16], "little")
                bits = int.from_bytes(
                    payload[pos + 22: pos + 24], "little")
                # Validate tag/bits BEFORE any data-chunk math: a
                # sub-byte bits-per-sample (4-bit IMA/MS ADPCM, tags
                # 2/17) would make bits//8 == 0 and divide by zero,
                # failing the task instead of quarantining the row.
                if tag == 1 and bits in (8, 16, 24, 32):
                    codec = ("pcm_u8" if bits == 8
                             else f"pcm_s{bits}le")
                elif tag == 3 and bits in (32, 64):
                    codec = f"pcm_f{bits}le"
                else:
                    raise ValueError(
                        f"WAV format tag {tag} / {bits}-bit "
                        "unrecognized (integer PCM 8/16/24/32 or "
                        "float 32/64)"
                    )
            elif cid == b"data" and rate and ch and bits:
                n_frames = size // (ch * (bits // 8))
            pos += 8 + size + (size & 1)
        if rate is None or n_frames is None:
            raise ValueError("WAV missing fmt/data chunks")
        return ("wav", "audio", codec, None, None,
                n_frames * 1_000_000 // rate, rate, ch)
    if payload[:4] == b"fLaC":
        # STREAMINFO only (the first metadata block) — no frame
        # decode: rate(20) channels-1(3) bps-1(5) total(36) start
        # at byte 18 of the block body
        if len(payload) < 8 + 34:
            raise ValueError("FLAC STREAMINFO truncated")
        body = payload[8: 8 + 34]
        v = int.from_bytes(body[10: 18], "big")
        rate = v >> 44
        ch = ((v >> 41) & 0x7) + 1
        total = v & ((1 << 36) - 1)
        if not rate:
            raise ValueError("FLAC STREAMINFO has zero sample rate")
        return ("flac", "audio", "flac", None, None,
                total * 1_000_000 // rate, rate, ch)
    dims = _image_dims_header(payload)
    if dims is not None:
        container, w_, h_ = dims
        return (container, "image", container, w_, h_, None, None,
                None)
    raise _UnrecognizedImage("unknown media magic")


def _probe_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            if payload is None:
                continue
            payload = bytes(payload)
            try:
                (container, kind, codec, w, h, dur, rate,
                 ch) = probe_one_payload(payload)
                err = None
            except (ValueError, _UnrecognizedImage) as e:
                container = kind = codec = None
                w = h = dur = rate = ch = None
                err = str(e)[:200]
            rows.append((media_id, container, kind, codec, w, h,
                         dur, rate, ch, len(payload), err))
        yield pd.DataFrame(
            rows,
            columns=["media_id", "container", "kind", "codec",
                     "width", "height", "duration_us",
                     "sample_rate", "channels", "n_bytes", "error"],
        )


_KEYFRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("container", StringType(), False),
        StructField("time_ticks", LongType(), True),
        StructField("byte_offset", LongType(), False),
        StructField("n_bytes", LongType(), True),
    ]
)


def sample_keyframe_ranges(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Keyframe BYTE RANGES sampled evenly across each video container's
    sync points — the 100 TB frame-extraction plan: list the ranges
    distributed (this operator, metadata-only, no decode), then
    range-read exactly those bytes instead of fetching whole files.

    MP4 rows come from the stss/stsc/stsz/stco index (exact offset AND
    size per keyframe sample); WebM rows from the Cues index (cluster
    byte offset, relative to the segment body per spec; ``n_bytes`` is
    the span to the next cue or segment end). Non-container payloads
    are skipped. Partition-preserving mapInPandas; payload bytes never
    shuffle — only the id/offset rows come out."""

    def _ranges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from evolution_spark.operators.mp4 import (
            keyframe_index,
            parse_mp4_metadata,
        )
        from evolution_spark.operators.webm import cue_index

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[4:8] == b"ftyp":
                    parse_mp4_metadata(payload)  # structural validation
                    tracks = keyframe_index(payload)
                    if not tracks:
                        continue
                    kfs = tracks[0]
                    picks = np.unique(
                        np.linspace(0, len(kfs) - 1,
                                    min(n_frames, len(kfs))).round()
                        .astype(int)
                    )
                    for i, pi in enumerate(picks):
                        num, off, size = kfs[pi]
                        rows.append((media_id, i, "mp4", num, off, size))
                elif payload[:4] == b"\x1a\x45\xdf\xa3":
                    cues = cue_index(payload)
                    if not cues:
                        continue
                    picks = np.unique(
                        np.linspace(0, len(cues) - 1,
                                    min(n_frames, len(cues))).round()
                        .astype(int)
                    )
                    for i, pi in enumerate(picks):
                        t, _trk, off = cues[pi]
                        nxt = (cues[pi + 1][2] if pi + 1 < len(cues)
                               else None)
                        rows.append((
                            media_id, i, "webm", t, off,
                            (nxt - off) if nxt is not None else None,
                        ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "container",
                         "time_ticks", "byte_offset", "n_bytes"],
            )

    return df.mapInPandas(_ranges, _KEYFRAME_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-level stats over media payloads — pure JVM (no decode):
    per-kind counts, payload sizes, null rates."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("payload").alias("n_with_payload"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )


_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("dhash", LongType(), True),
    ]
)


class _UnrecognizedImage(ValueError):
    """No known image magic — lets ``decode_media`` fall through to its
    own gap message while callers of ``decode_image_array`` still catch
    plain ValueError."""


def decode_image_array(payload: bytes) -> np.ndarray:
    """Any supported IMAGE payload -> ``(h, w, 3)`` or ``(h, w)`` uint8
    array with its spatial shape intact (``decode_media`` flattens):
    BMP, PNG (alpha stripped: RGBA -> RGB, gray+alpha -> gray — dHash/
    resize consumers need color planes, review r11 pass 8), GIF (first
    frame), TIFF (first page), JPEG (every non-arithmetic-lossless
    mode). The ONE image dispatch table; ``decode_media`` delegates
    here."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        arr = decode_png(payload)
        if arr.ndim == 3 and arr.shape[-1] == 4:
            return arr[..., :3]
        if arr.ndim == 3 and arr.shape[-1] == 2:
            return arr[..., 0]
        return arr
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from evolution_spark.operators.gif import decode_gif

        return decode_gif(payload)[0][0]
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from evolution_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from evolution_spark.operators.webp import decode_webp

        # VP8L decodes; lossy VP8 stays refused HERE by default —
        # the RFC 6386 decoder exists (operators/vp8) but its trained
        # tables await external conformance vectors, and this dispatch
        # feeds arbitrary scraped bytes (decode_webp's docstring)
        arr = decode_webp(payload)
        if arr.shape[-1] == 4:
            return arr[..., :3]
        return arr
    raise _UnrecognizedImage(
        "unrecognized image payload (BMP/PNG/GIF/TIFF/JPEG/WebP magic "
        "expected)"
    )


def dhash_bits(payload: bytes, fake: bool = False) -> int:
    """64-bit difference hash (dHash) of one image payload: decode ->
    luma (ITU-R BT.601 weights) -> 9x8 nearest-neighbor downsample ->
    bit b set iff cell[r, c] > cell[r, c+1]. Brightness-invariant by
    construction (a uniform shift leaves every comparison unchanged), so
    re-encoded / re-exposed copies that raw-byte dedup misses hash
    identically; small crops/edits flip only a few bits (hamming-near).
    CROSS-FORMAT since round 11: decodes any supported image payload
    (BMP/PNG/GIF/TIFF/JPEG), so a JPEG re-save of a PNG — the canonical
    scraped-corpus near-dup — hashes hamming-near its original."""
    if fake:
        raw = _fake_decode(payload)
        px = raw[: 9 * 8 * 3].reshape(-1, 3) if raw.size >= 9 * 8 * 3 else None
        if px is None:
            raw = np.resize(raw, 9 * 8 * 3)
            px = raw.reshape(-1, 3)
        gray = px @ np.array([0.299, 0.587, 0.114])
        grid = gray.reshape(8, 9)
    else:
        img = decode_image_array(payload).astype(np.float64)
        if img.ndim == 2:
            gray = img
        else:
            gray = img @ np.array([0.299, 0.587, 0.114])
        h, w = gray.shape
        rows = (np.arange(8) * h) // 8
        cols = (np.arange(9) * w) // 9
        grid = gray[np.ix_(rows, cols)]
    bits = (grid[:, :-1] > grid[:, 1:]).ravel()
    acc = 0
    for b in bits:
        acc = (acc << 1) | int(b)
    # interpret as signed 64-bit so it fits Spark's LongType exactly
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def dhash_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, payload) -> (media_id, dhash) via Arrow-batched
    mapInPandas. Partition-preserving: payloads never shuffle; only the
    16-byte (id, hash) pairs leave the task — the same bytes-stay-put
    discipline as extract_features."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                out.append(
                    dhash_bits(bytes(payload), fake=fake)
                    if payload is not None
                    else None
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "dhash": out})

    return df.mapInPandas(_hash, _DHASH_SCHEMA)


def dhash_near_dups(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate pairs among dHashes with hamming distance
    <= max_hamming.

    Scale: pigeonhole banding (the SimHash trick, operators/dedup.py): the
    64-bit hash splits into 4 x 16-bit bands; any pair within hamming 3
    agrees exactly on >= 1 band, so candidates come from equality
    self-joins on (band, value) — never an all-pairs cross join — and the
    exact popcount check runs only on collided candidates. The 4-band
    pigeonhole only guarantees recall for ``max_hamming <= 3`` (4
    differing bits can land one per band with no band equal), so larger
    values are refused rather than silently losing pairs."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4x16-bit banding "
            "guarantee (<= 3); use more/narrower bands for a looser radius"
        )
    bands = hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "dhash", "bv.band", "bv.val")
    a = bands.select(
        F.col("band"), F.col("val"),
        F.col("media_id").alias("id_a"), F.col("dhash").alias("__ha"),
    )
    b = bands.select(
        F.col("band"), F.col("val"),
        F.col("media_id").alias("id_b"), F.col("dhash").alias("__hb"),
    )
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# JPEG baseline codec (ITU-T T.81, sequential DCT, Huffman) — pure numpy.
# Closes the last real-image NotImplementedError: real corpora are
# JPEG-heavy, and the reference engine has no media path at all.
# --------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (luminance / chrominance), row-major
_JPEG_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,   12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,   14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_JPEG_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_JPEG_HT = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
}


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward C = D @ B @ D.T,
    inverse B = D.T @ C @ D."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    d = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * n + 1) * k / 16.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d


def _jpeg_canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} (Annex C)."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _jpeg_scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex K tables as-is."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int64)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """value -> (category ssss, magnitude bits) per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _parse_dht(body: bytes, into: dict) -> None:
    """Parse a DHT segment body (possibly several tables) into
    ``into[(tc, th)] = {(length, code): symbol}`` — the ONE canonical-
    code parser shared by every Huffman JPEG decoder in the repo."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0xF
        bits = list(body[i + 1: i + 17])
        n = sum(bits)
        vals = list(body[i + 17: i + 17 + n])
        i += 17 + n
        table = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[idx]
                code += 1
                idx += 1
            code <<= 1
        into[(tc, th)] = table


def _split_restart_intervals(entropy: bytes, unstuff: bool = True):
    """Split entropy-coded data on RSTn markers. ``unstuff=True``
    collapses 0xFF00 to 0xFF (the Huffman decoders' bit readers take
    raw bytes); ``unstuff=False`` keeps stuffing intact (the QM
    arithmetic decoder's byte feeder strips it itself, mirroring the
    spec's BYTEIN)."""
    intervals = []
    cur = bytearray()
    i = 0
    n = len(entropy)
    while i < n:
        if entropy[i] == 0xFF and i + 1 < n:
            nxt = entropy[i + 1]
            if nxt == 0x00 and unstuff:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(entropy[i])
        i += 1
    intervals.append(bytes(cur))
    return intervals


def _jpeg_quantized_zigzag(pixels: np.ndarray, quality: int):
    """The ONE encode front end shared by every JPEG encoder in the repo
    (baseline, progressive, arithmetic sequential/progressive): uint8
    pixels -> (per-component quantized zigzag grids, quantization
    tables, gray flag, h, w). RGB->YCbCr, Annex K tables under IJG
    quality scaling, 4:4:4, edge-replicated partial blocks, orthonormal
    DCT. Keeping this single ensures the Huffman and arithmetic fixtures
    code the SAME coefficients — the bit-identity tests depend on it."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not gray and px.shape[2] != 3:
        raise ValueError("JPEG encoders take (h, w) gray or (h, w, 3) RGB")
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [_jpeg_scaled_qt(_JPEG_QT_LUM, quality)]
    if not gray:
        qts.append(_jpeg_scaled_qt(_JPEG_QT_CHR, quality))
    dct = _jpeg_dct_matrix()
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    zzs = []
    for ci, plane in enumerate(planes):
        t = 0 if ci == 0 else 1
        padded = np.full((mcus_y * 8, mcus_x * 8), 128.0)
        padded[:h, :w] = plane
        # edge replication beats zero-padding for ringing, and keeps
        # constant images constant in partial edge blocks
        if h < mcus_y * 8:
            padded[h:, :w] = plane[h - 1, :]
        if w < mcus_x * 8:
            padded[:, w:] = padded[:, w - 1][:, None]
        blocks = padded.reshape(mcus_y, 8, mcus_x, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,yxjk,lk->yxil", dct, blocks - 128.0, dct)
        q = np.round(coefs / qts[t].reshape(1, 1, 8, 8)).astype(np.int64)
        zzs.append(q.reshape(mcus_y, mcus_x, 64)[..., _JPEG_ZIGZAG])
    return zzs, qts, gray, h, w


def encode_jpeg(pixels: np.ndarray, quality: int = 50) -> bytes:
    """Encode a uint8 array (``(h, w)`` grayscale or ``(h, w, 3)`` RGB)
    as a BASELINE sequential JPEG (JFIF, Annex K quantization + Huffman
    tables, 4:4:4 — no chroma subsampling, so block geometry stays
    1 block per 8x8 tile for every component). Forward path: level shift
    -> orthonormal DCT (matrix multiply) -> quantize -> zigzag -> DC
    diff / AC run-length -> canonical Huffman with 0xFF byte stuffing."""
    zzs, qts, gray, h, w = _jpeg_quantized_zigzag(pixels, quality)
    enc_dc = [_jpeg_canonical_codes(*_JPEG_HT[("dc", 0)]),
              _jpeg_canonical_codes(*_JPEG_HT[("dc", 1)])]
    enc_ac = [_jpeg_canonical_codes(*_JPEG_HT[("ac", 0)]),
              _jpeg_canonical_codes(*_JPEG_HT[("ac", 1)])]

    bw = _JpegBitWriter()
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    pred = [0] * len(zzs)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(len(zzs)):
                t = 0 if ci == 0 else 1
                zz = zzs[ci][my, mx]
                # DC: difference from predictor
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bits = _jpeg_magnitude(diff)
                code, ln = enc_dc[t][s]
                bw.write(code, ln)
                if s:
                    bw.write(bits, s)
                # AC: (run, size) pairs with ZRL and EOB
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s, bits = _jpeg_magnitude(v)
                    code, ln = enc_ac[t][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[t][0x00]  # EOB
                    bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        out += seg(0xDB, bytes([t]) + bytes(int(x) for x in qt.ravel()[_JPEG_ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 4:4:4
    out += seg(0xC0, sof)
    for cls, t in (("dc", 0), ("ac", 0)) if gray else (
        ("dc", 0), ("ac", 0), ("dc", 1), ("ac", 1)
    ):
        bits, vals = _JPEG_HT[(cls, t)]
        out += seg(0xC4, bytes([(0 if cls == "dc" else 0x10) | t])
                   + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing already applied."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # T.81 allows the final code to be completed by pad bits
                return 1
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_decode_symbol(br: _JpegBitReader, table: dict) -> int:
    """table: {(length, code): symbol} — canonical Huffman, max 16 bits."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (corrupt entropy stream)")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL BASELINE JPEG decoder, dependency-free (numpy only): marker
    walk -> DQT/DHT/SOF0/SOS(+DRI) -> Huffman-decode each MCU's blocks
    (DC prediction, AC run-length, restart-marker resets) -> dequantize
    -> inverse zigzag -> orthonormal IDCT -> chroma upsample (4:4:4 /
    4:2:2 / 4:2:0 sampling factors) -> YCbCr->RGB. Returns ``(h, w, 3)``
    uint8 for color scans, ``(h, w)`` for grayscale. Progressive (SOF2)
    routes to ``_decode_progressive_jpeg`` (Annex G); arithmetic coding,
    12-bit precision, and hierarchical modes raise — stated limits, not
    silent corruption (ITU-T T.81 §F)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(len, code): sym}
    comps = None  # [(cid, h, v, tq)]
    height = width = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xDE:  # DHP: hierarchical stream — dedicated decoder
            from evolution_spark.operators.jpeg_hier import (
                decode_jpeg_hierarchical,
            )

            return decode_jpeg_hierarchical(payload)
        size = int.from_bytes(payload[pos + 2: pos + 4], "big")
        body = payload[pos + 4: pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:  # 16-bit entries
                    vals = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qt = np.zeros(64, dtype=np.int64)
                qt[_JPEG_ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            _parse_dht(body, huff)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq.
            # SOF1 (extended sequential, Huffman) is frame-identical to
            # baseline at 8-bit precision — same decode path
            if body[0] != 8:
                raise ValueError(f"unsupported JPEG precision {body[0]} (8-bit only)")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:  # SOF2: progressive DCT — dedicated decoder
            return _decode_progressive_jpeg(payload)
        elif marker in (0xC9, 0xCA):  # SOF9/SOF10: arithmetic coding
            from evolution_spark.operators.jpeg_arith import (
                decode_jpeg_arithmetic,
            )

            return decode_jpeg_arithmetic(payload)
        elif marker == 0xC3:  # SOF3: lossless (Annex H predictive)
            from evolution_spark.operators.jpeg_lossless import (
                decode_jpeg_lossless,
            )

            return decode_jpeg_lossless(payload)
        elif marker == 0xCB:  # SOF11: arithmetic lossless (round 12)
            from evolution_spark.operators.jpeg_lossless_arith import (
                decode_jpeg_lossless_arith,
            )

            return decode_jpeg_lossless_arith(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            # NotImplementedError, matching the decode_media contract:
            # callers route declared codec gaps (not corrupt payloads)
            # on this type. Differential frames (SOF5-7/13-15) are only
            # legal INSIDE a DHP hierarchical stream, which routed above.
            raise NotImplementedError(
                f"unsupported JPEG mode SOF{marker - 0xC0} — sequential "
                "(SOF0/SOF1), progressive (SOF2), arithmetic "
                "(SOF9/SOF10/SOF11), lossless (SOF3) and hierarchical "
                "(DHP + SOF5/SOF7) decode; a differential frame outside "
                "a DHP stream is malformed"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS: scan header, entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            # entropy-coded data runs until the next non-RST marker
            entropy_start = pos
            i = pos
            while i + 1 < len(payload):
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,) \
                        and not (0xD0 <= payload[i + 1] <= 0xD7):
                    break
                i += 1
            entropy = payload[entropy_start:i]
            pos = i
            break
        # other markers (APPn, COM) are skipped
    if comps is None or scan is None:
        raise ValueError("JPEG payload missing SOF0/SOS")
    if len(scan) < len(comps):
        # legal per T.81 (one scan per component, non-interleaved MCU
        # geometry) but not implemented — decoding only the first scan
        # with interleaved geometry would return plausible garbage
        raise ValueError(
            f"non-interleaved multi-scan baseline JPEG (first scan covers "
            f"{len(scan)} of {len(comps)} components) is not supported — "
            "single interleaved scan only"
        )

    # split on restart markers; unstuff each interval
    intervals = _split_restart_intervals(entropy)

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    dct = _jpeg_dct_matrix()

    interval_idx = 0
    br = _JpegBitReader(intervals[0])
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError("JPEG entropy stream ends before all MCUs")
                br = _JpegBitReader(intervals[interval_idx])
                pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cs, td, ta in scan:
                ch, cv, tq = by_id[cs]
                for v in range(cv):
                    for hh in range(ch):
                        s = _jpeg_decode_symbol(br, huff[(0, td)])
                        diff = _jpeg_extend(br.read_bits(s), s) if s else 0
                        pred[cs] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_symbol(br, huff[(1, ta)])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow (corrupt scan)")
                            zz[k] = _jpeg_extend(br.read_bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZIGZAG] = zz * qts[tq].ravel()[_JPEG_ZIGZAG]
                        block = dct.T @ coef.reshape(8, 8) @ dct
                        ys = (my * cv + v) * 8
                        xs = (mx * ch + hh) * 8
                        planes[cs][ys:ys + 8, xs:xs + 8] = block + 128.0
    out_planes = []
    for cid, ch, cv, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Progressive JPEG (SOF2, ITU-T T.81 Annex G): real scraped corpora are
# 10-30% progressive, so the baseline-only decoder dead-ended a large
# slice of any web-crawl image column. Spectral selection + successive
# approximation both decode; the encoder below emits a libjpeg-style
# multi-scan script so every decoder path (DC first/refine, AC first with
# EOB runs, AC refinement with correction bits) has a hermetic fixture.
# --------------------------------------------------------------------------


def _jpeg_split_intervals(entropy: bytes) -> list[bytes]:
    """Back-compat alias for :func:`_split_restart_intervals`."""
    return _split_restart_intervals(entropy)


def _decode_progressive_jpeg(payload: bytes) -> np.ndarray:
    """Progressive JPEG decoder (T.81 Annex G, Huffman entropy coding):
    coefficients accumulate across scans — DC first (point-transformed
    diffs) and refinement (one bit per block), AC first per spectral band
    with EOB runs, AC refinement with correction bits — then one
    vectorized dequantize + IDCT + upsample + YCbCr->RGB pass
    reconstructs the image. Matches the baseline decoder's output exactly
    for the same quantized coefficients (progressive is a transmission
    reordering, not a different codec)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    height = width = None
    restart_interval = 0
    scans = []  # (scan_comps, ss, se, ah, al, tables, ri, entropy)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[pos + 2: pos + 4], "big")
        body = payload[pos + 4: pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qt = np.zeros(64, dtype=np.int64)
                qt[_JPEG_ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xC2:
            if body[0] != 8:
                raise ValueError(f"unsupported JPEG precision {body[0]} (8-bit only)")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            i = pos
            while i + 1 < len(payload):
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,) \
                        and not (0xD0 <= payload[i + 1] <= 0xD7):
                    break
                i += 1
            entropy = payload[pos:i]
            pos = i
            # DHT may be redefined between scans: snapshot the tables in
            # force for THIS scan
            scans.append((
                scan_comps, ss, se, ah, al,
                {k: dict(v) for k, v in huff.items()},
                restart_interval, entropy,
            ))
        # other markers (APPn, COM) skipped
    if comps is None or not scans:
        raise ValueError("progressive JPEG payload missing SOF2/SOS")

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    # coefficient accumulators in ZIGZAG order, padded to the interleaved
    # MCU grid (non-interleaved scans cover a <= prefix of it)
    coef = {
        cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
        for cid, ch, cv, tq in comps
    }

    for scan_comps, ss, se, ah, al, tables, ri, entropy in scans:
        intervals = _jpeg_split_intervals(entropy)
        interval_idx = 0
        br = _JpegBitReader(intervals[0])
        pred = {cid: 0 for cid, _, _ in scan_comps}
        eobrun = 0

        def _restart():
            nonlocal interval_idx, br, pred, eobrun
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("JPEG entropy stream ends before all units")
            br = _JpegBitReader(intervals[interval_idx])
            pred = {cid: 0 for cid, _, _ in scan_comps}
            eobrun = 0

        def _dc_unit(cs, td, bby, bbx):
            nonlocal eobrun
            c = coef[cs]
            if ah == 0:
                s = _jpeg_decode_symbol(br, tables[(0, td)])
                diff = _jpeg_extend(br.read_bits(s), s) if s else 0
                pred[cs] += diff
                c[bby, bbx, 0] = pred[cs] << al
            else:
                # refinement: one bit appends the next lower DC bit
                if br.read_bit():
                    c[bby, bbx, 0] |= 1 << al

        def _ac_first(cs, ta, bby, bbx):
            nonlocal eobrun
            c = coef[cs][bby, bbx]
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = _jpeg_decode_symbol(br, tables[(1, ta)])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index overflow (corrupt scan)")
                c[k] = _jpeg_extend(br.read_bits(s), s) << al
                k += 1

        def _ac_refine(cs, ta, bby, bbx):
            nonlocal eobrun
            c = coef[cs][bby, bbx]
            p1 = 1 << al
            m1 = -p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _jpeg_decode_symbol(br, tables[(1, ta)])
                    r, s = rs >> 4, rs & 0xF
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement symbol with size != 1 "
                                "(corrupt scan)"
                            )
                        val = p1 if br.read_bit() else m1
                    while k <= se:
                        if c[k] != 0:
                            # correction bit for an already-nonzero coef
                            if br.read_bit() and not (c[k] & p1):
                                c[k] += p1 if c[k] >= 0 else m1
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        c[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if c[k] != 0:
                        if br.read_bit() and not (c[k] & p1):
                            c[k] += p1 if c[k] >= 0 else m1
                    k += 1
                eobrun -= 1

        if len(scan_comps) > 1 or (ss == 0 and len(scan_comps) == len(comps)):
            # interleaved scan: per the spec only DC scans interleave
            if ss != 0 or se != 0:
                raise ValueError(
                    "interleaved progressive scan with a non-DC band "
                    "(corrupt scan header)"
                )
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and unit and unit % ri == 0:
                        _restart()
                    unit += 1
                    for cs, td, _ in scan_comps:
                        ch, cv, _ = by_id[cs]
                        for v in range(cv):
                            for hh in range(ch):
                                _dc_unit(cs, td, my * cv + v, mx * ch + hh)
        else:
            cs, td, ta = scan_comps[0]
            ch, cv, _ = by_id[cs]
            # non-interleaved geometry: the component's OWN block grid
            # (ceil of its sampling-scaled dimensions), NOT the padded
            # interleaved MCU grid
            comp_w = -(-width * ch // hmax)
            comp_h = -(-height * cv // vmax)
            bx = -(-comp_w // 8)
            by_n = -(-comp_h // 8)
            unit = 0
            for bby in range(by_n):
                for bbx in range(bx):
                    if ri and unit and unit % ri == 0:
                        _restart()
                    unit += 1
                    if ss == 0:
                        if se != 0:
                            raise ValueError(
                                "progressive scan mixing DC and AC bands "
                                "(corrupt scan header)"
                            )
                        _dc_unit(cs, td, bby, bbx)
                    elif ah == 0:
                        _ac_first(cs, ta, bby, bbx)
                    else:
                        _ac_refine(cs, ta, bby, bbx)

    # one vectorized reconstruction pass: dequantize (natural order),
    # IDCT every block, assemble planes, upsample, color-convert
    dct = _jpeg_dct_matrix()
    out_planes = []
    for cid, ch, cv, tq in comps:
        zz = coef[cid]
        nby, nbx, _ = zz.shape
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[..., _JPEG_ZIGZAG] = zz
        nat *= qts[tq].reshape(1, 1, 64)
        blocks = nat.reshape(nby, nbx, 8, 8)
        spatial = np.einsum("ji,yxjk,kl->yxil", dct, blocks, dct) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 50) -> bytes:
    """Encode a uint8 array as a PROGRESSIVE JPEG (SOF2, 4:4:4, Annex K
    tables) with a libjpeg-style scan script that exercises every
    progressive path: DC first (Al=1) -> AC first per component in two
    spectral bands (1-5 then 6-63, Al=1) -> DC refinement (Ah=1) -> AC
    refinement per component (full band, Ah=1->Al=0, correction bits +
    newly-significant insertions). The quantized coefficients are
    IDENTICAL to ``encode_jpeg`` at the same quality, so
    ``decode_jpeg(progressive) == decode_jpeg(baseline)`` exactly — the
    hermetic oracle the tests pin."""
    # same front end as every other encoder: identical coefficients,
    # different transmission
    zzs, qts, gray, h, w = _jpeg_quantized_zigzag(pixels, quality)
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    enc_dc = [_jpeg_canonical_codes(*_JPEG_HT[("dc", 0)]),
              _jpeg_canonical_codes(*_JPEG_HT[("dc", 1)])]
    enc_ac = [_jpeg_canonical_codes(*_JPEG_HT[("ac", 0)]),
              _jpeg_canonical_codes(*_JPEG_HT[("ac", 1)])]
    ncomp = len(zzs)

    def dc_first_scan(al: int) -> bytes:
        bw = _JpegBitWriter()
        pred = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    t = 0 if ci == 0 else 1
                    dc = int(zzs[ci][my, mx, 0]) >> al  # arithmetic shift
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s, bits = _jpeg_magnitude(diff)
                    code, ln = enc_dc[t][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(bits, s)
        return bw.flush()

    def dc_refine_scan(al: int) -> bytes:
        bw = _JpegBitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    bw.write((int(zzs[ci][my, mx, 0]) >> al) & 1, 1)
        return bw.flush()

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        t = 0 if ci == 0 else 1
        bw = _JpegBitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                zz = zzs[ci][my, mx]
                run = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    # AC point transform truncates toward ZERO (T.81
                    # G.1.1.1) — NOT an arithmetic shift
                    v = -((-v) >> al) if v < 0 else v >> al
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s, bits = _jpeg_magnitude(v)
                    code, ln = enc_ac[t][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits, s)
                    run = 0
                if run > 0:
                    code, ln = enc_ac[t][0x00]  # EOB (run length 1)
                    bw.write(code, ln)
        return bw.flush()

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine shape: newly
        # significant coefficients emit (run-of-zero-history, size 1) +
        # sign, already-significant ones buffer a correction bit that
        # flushes after the next Huffman symbol
        t = 0 if ci == 0 else 1
        bw = _JpegBitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                zz = zzs[ci][my, mx]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob_pos = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob_pos = i
                run = 0
                pending: list[int] = []
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob_pos:
                        code, ln = enc_ac[t][0xF0]
                        bw.write(code, ln)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                        run -= 16
                    if a > 1:
                        pending.append(a & 1)
                        continue
                    code, ln = enc_ac[t][(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(zz[ss + i]) > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    run = 0
                if run > 0 or pending:
                    code, ln = enc_ac[t][0x00]
                    bw.write(code, ln)
                    for bit in pending:
                        bw.write(bit, 1)
        return bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        out += seg(0xDB, bytes([t]) + bytes(int(x) for x in qt.ravel()[_JPEG_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive
    for cls, t in (("dc", 0), ("ac", 0)) if gray else (
        ("dc", 0), ("ac", 0), ("dc", 1), ("ac", 1)
    ):
        bits, vals = _JPEG_HT[(cls, t)]
        out += seg(0xC4, bytes([(0 if cls == "dc" else 0x10) | t])
                   + bytes(bits) + bytes(vals))

    def sos(scan_comps: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int, entropy: bytes) -> bytes:
        body = bytes([len(scan_comps)])
        for cs, td, ta in scan_comps:
            body += bytes([cs, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + entropy

    all_dc = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    # scan script (libjpeg-style): coarse DC -> coarse low/high AC bands
    # per component -> DC refinement -> AC refinement per component
    out += sos(all_dc, 0, 0, 0, 1, dc_first_scan(1))
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        out += sos([(ci + 1, 0, t)], 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1))
        out += sos([(ci + 1, 0, t)], 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1))
    out += sos(all_dc, 0, 0, 1, 0, dc_refine_scan(0))
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        out += sos([(ci + 1, 0, t)], 1, 63, 1, 0, ac_refine_scan(ci, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
