"""Multimodal column support: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-preserving
transforms, deterministic fake decoders — is real and tested. Two codecs are
REAL and dependency-free (pure numpy): 24-bit uncompressed BMP and 16-bit PCM
WAV, with matching encoders for round-trip tests and mock-data generation.
Everything else (JPEG/PNG/MP3/video — needs PIL/soundfile/av, none shipped in
this container) raises ``NotImplementedError`` unless ``fake=True`` requests
the deterministic fake (hash-derived pixels/samples), which exercises every
byte of the pipeline except the codec itself.

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
    """Decode a 24-bit uncompressed BMP to an RGB ``uint8`` array of shape
    ``(height, width, 3)``, rows top-down. Handles 4-byte row padding and
    both bottom-up (positive height) and top-down (negative) layouts."""
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
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={compression})")
    top_down, h = height < 0, abs(height)
    stride = (width * 3 + 3) & ~3
    if data_offset + stride * h > len(payload):
        raise ValueError("BMP payload truncated")
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    px = px.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        px = px[::-1]
    return px[..., ::-1].copy()  # stored BGR -> returned RGB


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
    (RFC 2083 §6). Supports 8-bit grayscale / gray+alpha / RGB / RGBA,
    non-interlaced — the shapes ``PIL.Image.save`` and virtually every
    screenshot/web encoder emit. Returns ``(h, w, channels)`` uint8 (or
    ``(h, w)`` for grayscale). Palette (color type 3), 16-bit, and Adam7
    interlace still raise — stated limits, not silent corruption."""
    import zlib as _zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    color_type = bit_depth = interlace = None
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
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + data + crc
    if width is None:
        raise ValueError("PNG payload missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={bit_depth}, color_type="
            f"{color_type}, interlace={interlace}): 8-bit non-interlaced "
            "gray/gray+alpha/RGB/RGBA only"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = _zlib.decompress(bytes(idat))
    stride = width * ch
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
            for x in range(ch, stride, ch):
                rec[x : x + ch] = (rec[x : x + ch] + rec[x - ch : x]) & 0xFF
        elif f == 3:  # Average
            rec = row.copy()
            rec[:ch] = (rec[:ch] + (prev[:ch].astype(np.int32) >> 1)) & 0xFF
            for x in range(ch, stride, ch):
                avg = (rec[x - ch : x].astype(np.int32) + prev[x : x + ch]) >> 1
                rec[x : x + ch] = (rec[x : x + ch] + avg) & 0xFF
        elif f == 4:  # Paeth
            rec = row.copy()
            rec[:ch] = (rec[:ch] + prev[:ch]) & 0xFF  # left=0 -> predictor=up
            for x in range(ch, stride, ch):
                a = rec[x - ch : x].astype(np.int32)
                b = prev[x : x + ch].astype(np.int32)
                c = prev[x - ch : x].astype(np.int32)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[x : x + ch] = (rec[x : x + ch] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on scanline {y}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.uint8)
    img = out.reshape(height, width, ch)
    return img[..., 0] if ch == 1 else img


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array (``(h, w)`` gray, ``(h, w, 2/3/4)``) as an
    8-bit non-interlaced PNG. ``filter_type`` applies one filter (0-4) to
    every scanline — used by the tests/oracle to exercise each of the
    decoder's reconstruction paths."""
    import zlib as _zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        left = np.zeros(stride, dtype=np.int32)
        left[ch:] = row[:-ch]
        upleft = np.zeros(stride, dtype=np.int32)
        upleft[ch:] = prev[:-ch]
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

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
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

    REAL for 24-bit BMP and 16-bit PCM WAV (pure-numpy decoders above,
    dispatched on magic bytes). ``fake=True`` forces the deterministic fake
    decoder regardless of format (the test/CI path). Everything else needs
    PIL (image) / soundfile (audio) / av (video), none of which exist in
    this container, and raises ``NotImplementedError``."""
    if fake:
        return _fake_decode(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload).astype(np.float32).ravel()
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload).astype(np.float32).ravel()
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)[0].astype(np.float32).ravel()
    raise NotImplementedError(
        f"decoding kind={kind!r}: only BMP, PNG and PCM WAV decode without a "
        "media codec library (PIL/soundfile/av, none installed) — pass "
        "fake=True for the deterministic test decoder"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> fixed-width feature vector via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); batch shape: the pandas iterator
    yields input-partition-sized chunks, and each output row carries a
    FEATURE_DIM float vector."""

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


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize over Arrow-batched mapInPandas.

    REAL for 24-bit BMP payloads when ``fake=False`` (magic-byte dispatch
    to the pure-numpy nearest-neighbor ``resize_bmp``; the output payload
    is itself a valid BMP). ``fake=True`` keeps the deterministic
    byte-resample stub for formats whose codecs aren't in this container
    (JPEG/PNG need PIL); swapping in a real library touches only the inner
    function, never the Spark plumbing."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                    continue
                raw_bytes = bytes(payload)
                if not fake and raw_bytes[:2] == b"BM":
                    out.append(resize_bmp(raw_bytes, width, height))
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


def sample_frames(df: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing (STUB codec): one output row per sampled
    frame (row-expanding mapInPandas — the streaming-friendly shape for
    frame extraction at scale)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = decode_media(bytes(payload), "video", fake=fake)
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    # deterministic per-frame slice of the fake decode
                    frames.append(np.roll(raw, i).astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_sample, _FRAMES_SCHEMA)


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


def dhash_bits(payload: bytes, fake: bool = False) -> int:
    """64-bit difference hash (dHash) of one image payload: decode ->
    luma (ITU-R BT.601 weights) -> 9x8 nearest-neighbor downsample ->
    bit b set iff cell[r, c] > cell[r, c+1]. Brightness-invariant by
    construction (a uniform shift leaves every comparison unchanged), so
    re-encoded / re-exposed copies that raw-byte dedup misses hash
    identically; small crops/edits flip only a few bits (hamming-near)."""
    if fake:
        raw = _fake_decode(payload)
        px = raw[: 9 * 8 * 3].reshape(-1, 3) if raw.size >= 9 * 8 * 3 else None
        if px is None:
            raw = np.resize(raw, 9 * 8 * 3)
            px = raw.reshape(-1, 3)
        gray = px @ np.array([0.299, 0.587, 0.114])
        grid = gray.reshape(8, 9)
    else:
        img = decode_bmp(payload).astype(np.float64)
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
