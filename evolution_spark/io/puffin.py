"""Puffin file format (Apache Iceberg's auxiliary-blob container) —
enough of the public spec to carry ``deletion-vector-v1`` blobs, the
format-version-3 replacement for parquet position-delete files.

Layout (Puffin spec): ``Magic Blob₁..Blobₙ Footer`` where Footer =
``Magic FooterPayload FooterPayloadSize(4B LE) Flags(4B) Magic`` and
FooterPayload is UTF-8 JSON ``{"blobs": [BlobMetadata...], "properties":
{...}}``. This writer never compresses the payload (flags = 0); the
reader ALSO decodes zstd-compressed footers (footer flag bit 0, RFC 8878
framing — round 10) so foreign Puffin files read correctly.

``deletion-vector-v1`` blob (Iceberg spec v3 'Deletion Vectors'):
``length(4B BE) magic(D1 D3 39 64) vector crc32(4B BE)`` where length
covers magic+vector, the vector is the 64-bit roaring bitmap in the
standard portable serialization, and the CRC-32 (zlib polynomial) covers
magic+vector. The magic bytes are exactly the little-endian encoding of
Delta's RoaringBitmapArray magic 1681511377 — Iceberg chose Delta's
serialization for cross-format interop — so ``magic+vector`` is
byte-identical to :func:`evolution_spark.io.deletion_vectors.
serialize_roaring64` output and that codec is reused verbatim.

Reference parity note: the reference engine's Iceberg target is a
``todo!()`` (examples/iceberg/src/main.rs:28-30); this module is built
from the public Puffin + Iceberg v3 specs only.
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path

import numpy as np

from evolution_spark.io.deletion_vectors import (
    deserialize_roaring64,
    serialize_roaring64,
)

MAGIC = b"PFA1"


class PuffinFormatError(RuntimeError):
    """Malformed or unsupported Puffin content — refuse loudly, never
    guess (a mis-parsed deletion vector silently resurrects rows)."""


def _dv_blob_bytes(positions) -> tuple[bytes, int]:
    """(serialized deletion-vector-v1 blob, cardinality)."""
    vec = serialize_roaring64(positions)  # = magic + portable roaring64
    return (
        struct.pack(">I", len(vec)) + vec + struct.pack(">I", zlib.crc32(vec)),
        int(len(np.unique(np.asarray(positions, dtype=np.uint64)))),
    )


def write_puffin_dv_file(
    path,
    dvs: dict[str, object],
    snapshot_id: int,
    sequence_number: int,
) -> list[dict]:
    """Write ONE Puffin file holding a ``deletion-vector-v1`` blob per
    referenced data file. ``dvs``: {data_file_path: row positions}.
    Returns per-blob placement the caller records in its delete manifest:
    ``{referenced_data_file, content_offset, content_size_in_bytes,
    cardinality}`` — a v3 reader seeks straight to the blob, so one
    Puffin file amortizes the open cost across every DV of a commit."""
    out = bytearray(MAGIC)
    blob_meta: list[dict] = []
    placements: list[dict] = []
    for data_file in sorted(dvs):
        blob, cardinality = _dv_blob_bytes(dvs[data_file])
        offset = len(out)
        out += blob
        blob_meta.append({
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "offset": offset,
            "length": len(blob),
            "properties": {
                "referenced-data-file": str(data_file),
                "cardinality": str(cardinality),
            },
        })
        placements.append({
            "referenced_data_file": str(data_file),
            "content_offset": offset,
            "content_size_in_bytes": len(blob),
            "cardinality": cardinality,
        })
    payload = json.dumps({"blobs": blob_meta, "properties": {
        "created-by": "evolution-spark-puffin-writer/1.0",
    }}).encode()
    out += MAGIC + payload + struct.pack("<I", len(payload))
    out += b"\x00\x00\x00\x00" + MAGIC  # flags: payload uncompressed
    p = Path(path)
    tmp = p.with_name(f".{p.name}.tmp")
    tmp.write_bytes(bytes(out))
    tmp.replace(p)
    return placements


def read_puffin_dv(path, offset: int, length: int) -> np.ndarray:
    """Decode one ``deletion-vector-v1`` blob at a recorded placement —
    the v3 scan path (manifest carries offset/size, no footer parse
    needed). Validates the blob's length header, magic, and CRC before
    trusting a single position."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    if len(blob) != length:
        raise PuffinFormatError(
            f"puffin blob at {path}:{offset} truncated "
            f"({len(blob)} of {length} bytes)"
        )
    (vec_len,) = struct.unpack_from(">I", blob, 0)
    if vec_len + 8 != length:
        raise PuffinFormatError(
            f"deletion-vector blob length header {vec_len} disagrees with "
            f"manifest content_size_in_bytes {length}"
        )
    vec = blob[4 : 4 + vec_len]
    (crc,) = struct.unpack_from(">I", blob, 4 + vec_len)
    if zlib.crc32(vec) != crc:
        raise PuffinFormatError(
            f"deletion-vector blob CRC mismatch at {path}:{offset} — "
            "refusing corrupt delete data (rows would resurrect)"
        )
    # vec = 4-byte roaring magic + portable roaring64 = the Delta
    # RoaringBitmapArray layout; the shared codec validates the magic
    return deserialize_roaring64(vec)


_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_LZ4F_MAGIC = b"\x04\x22\x4d\x18"


def _zstd_frame_content_size(buf: bytes, path) -> int | None:
    """Decoded size from a zstd frame header (RFC 8878 §3.1.1), or None
    when the frame omits it (pyarrow needs the exact size to decode).
    Truncated headers refuse with the module's error type, never a raw
    IndexError or a size computed from a short slice."""
    try:
        fhd = buf[4]
        fcs_code = fhd >> 6
        single_segment = (fhd >> 5) & 1
        did_code = fhd & 0x03
        pos = 5 + (0 if single_segment else 1)  # window descriptor
        pos += (0, 1, 2, 4)[did_code]           # dictionary id
        if fcs_code == 0:
            return buf[pos] if single_segment else None
        n = (0, 2, 4, 8)[fcs_code]
        field = buf[pos : pos + n]
        if len(field) != n:
            raise IndexError
        val = int.from_bytes(field, "little")
        return val + 256 if fcs_code == 1 else val
    except IndexError:
        raise PuffinFormatError(
            f"{path}: zstd footer frame header is truncated — refusing"
        ) from None


def _lz4_frame_content_size(buf: bytes, path) -> int | None:
    """Decoded size from an LZ4 frame header when the optional
    Content-Size field (FLG bit 3) is present, else None. Truncated
    headers refuse with the module's error type."""
    if len(buf) < 7:
        raise PuffinFormatError(
            f"{path}: lz4 footer frame header is truncated — refusing"
        )
    if not (buf[4] >> 3) & 1:
        return None
    if len(buf) < 14:
        raise PuffinFormatError(
            f"{path}: lz4 footer frame content-size field is truncated — "
            "refusing"
        )
    return int.from_bytes(buf[6:14], "little")


def _decompress_footer_payload(payload: bytes, path) -> bytes:
    """Decompress a Puffin footer payload (flag byte 0 bit 0 set). The
    spec's footer codec is LZ4 (frame format); zstd-compressed footers
    exist in the wild, so both frame magics are recognized. When the
    frame embeds its decoded size, the decode is exact; an LZ4 frame
    WITHOUT one decodes into a generous buffer and the JSON document's
    own end delimits the payload (the footer is a single JSON object, so
    ``raw_decode`` is unambiguous). Unknown codecs refuse loudly."""
    import pyarrow as pa

    if payload[:4] == _ZSTD_MAGIC:
        codec, size = "zstd", _zstd_frame_content_size(payload, path)
        if size is None:
            raise PuffinFormatError(
                f"{path}: zstd footer frame omits its content size — "
                "cannot size the decode buffer; refusing"
            )
    elif payload[:4] == _LZ4F_MAGIC:
        codec, size = "lz4", _lz4_frame_content_size(payload, path)
    else:
        raise PuffinFormatError(
            f"{path}: compressed footer payload with unknown frame magic "
            f"{payload[:4].hex()} — refusing to guess the codec"
        )
    try:
        if size is not None:
            return pa.Codec(codec).decompress(
                payload, decompressed_size=size, asbytes=True
            )
        # LZ4 frame without embedded size: decode into a bounded buffer
        # (escalating hints for very compressible blob indexes) and let
        # the JSON parser delimit the single footer object
        err = None
        for hint in (max(1 << 20, 64 * len(payload)),
                     max(1 << 26, 4096 * len(payload))):
            try:
                return pa.Codec(codec).decompress(
                    payload, decompressed_size=hint, asbytes=True
                )
            except Exception as ex:  # pyarrow raises codec-specific types
                err = ex
        raise err
    except PuffinFormatError:
        raise
    except Exception as ex:
        raise PuffinFormatError(
            f"{path}: {codec} footer payload failed to decompress "
            f"({ex}) — refusing a corrupt or mis-framed footer"
        ) from None


def read_puffin_footer(path) -> dict:
    """Parse a Puffin file's footer payload (blob index + file properties)
    — the discovery path when a placement is NOT known from a manifest.
    Compressed footer payloads (flags bit 0) decode via
    :func:`_decompress_footer_payload` (lz4 per spec; zstd tolerated)."""
    data = Path(path).read_bytes()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinFormatError(f"{path} is not a Puffin file (magic)")
    flags = data[-8:-4]
    (payload_len,) = struct.unpack_from("<I", data, len(data) - 12)
    start = len(data) - 12 - payload_len
    if data[start - 4 : start] != MAGIC:
        raise PuffinFormatError(f"{path}: footer start magic missing")
    raw = data[start : start + payload_len]
    if flags[0] & 0x01:
        raw = _decompress_footer_payload(raw, path)
        # a sized decode is exact; the unsized LZ4 path over-allocates, so
        # parse the FIRST json document and ignore the buffer tail
        obj, _end = json.JSONDecoder().raw_decode(
            raw.decode("utf-8", errors="replace")
        )
        return obj
    return json.loads(raw.decode())
