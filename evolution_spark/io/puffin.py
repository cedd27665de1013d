"""Puffin file format (Apache Iceberg's auxiliary-blob container) —
enough of the public spec to carry ``deletion-vector-v1`` blobs, the
format-version-3 replacement for parquet position-delete files.

Layout (Puffin spec): ``Magic Blob₁..Blobₙ Footer`` where Footer =
``Magic FooterPayload FooterPayloadSize(4B LE) Flags(4B) Magic`` and
FooterPayload is UTF-8 JSON ``{"blobs": [BlobMetadata...], "properties":
{...}}``. This writer never compresses the payload (flags = 0); the
reader refuses compressed footers loudly rather than mis-parsing.

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


def read_puffin_footer(path) -> dict:
    """Parse a Puffin file's footer payload (blob index + file properties)
    — the discovery path when a placement is NOT known from a manifest."""
    data = Path(path).read_bytes()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinFormatError(f"{path} is not a Puffin file (magic)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise PuffinFormatError(
            f"{path}: compressed footer payload is not supported — "
            "refusing to guess the codec"
        )
    (payload_len,) = struct.unpack_from("<I", data, len(data) - 12)
    start = len(data) - 12 - payload_len
    if data[start - 4 : start] != MAGIC:
        raise PuffinFormatError(f"{path}: footer start magic missing")
    return json.loads(data[start : start + payload_len].decode())
