"""EXIF metadata extraction — the camera/orientation/timestamp facts
image curation filters on (dedup by capture time, rotate-normalize by
orientation, camera-model stratification).

EXIF is a TIFF IFD structure (the public TIFF 6.0 layout this repo's
``operators/tiff.py`` already walks) carried three ways: in-band in a
TIFF file (IFD0 itself), in a JPEG APP1 segment prefixed ``Exif\\0\\0``,
or in a WebP ``EXIF`` chunk (same optional prefix). ``parse_exif``
dispatches on the container magic, walks IFD0 plus the Exif sub-IFD
(pointer tag 0x8769), and returns the curation fields; ``build_exif``
writes a spec-shaped buffer for fixtures and the embed helpers splice
it into JPEG/WebP payloads.

Header-only (no pixel decode) — safe in the probe tier.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

ORIENTATION = 0x0112
MAKE = 0x010F
MODEL = 0x0110
DATETIME = 0x0132
EXIF_IFD = 0x8769
GPS_IFD = 0x8825
DT_ORIGINAL = 0x9003
PIXEL_X = 0xA002
PIXEL_Y = 0xA003


def _read_ifd_at(b: bytes, bo: str, off: int) -> dict:
    """One IFD at ``off`` -> {tag: value} (ints resolved, ASCII
    NUL-stripped strings, other types raw bytes)."""
    def u(o: int, n: int) -> int:
        raw = b[o: o + n]
        if len(raw) < n:
            raise ValueError("EXIF IFD truncated")
        return int.from_bytes(raw, bo)

    count = u(off, 2)
    if count > 512:
        raise ValueError(f"EXIF IFD entry count {count} implausible")
    tags = {}
    for e in range(count):
        base = off + 2 + 12 * e
        tag = u(base, 2)
        typ = u(base + 2, 2)
        cnt = u(base + 4, 4)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size > 1 << 20:
            raise ValueError("EXIF value size implausible")
        val_off = base + 8 if size <= 4 else u(base + 8, 4)
        if typ in (1, 3, 4):
            step = _TYPE_SIZES[typ]
            vals = [u(val_off + i * step, step) for i in range(cnt)]
            tags[tag] = vals[0] if cnt == 1 else vals
        elif typ == 2:
            raw = b[val_off: val_off + size]
            if len(raw) < size:
                raise ValueError("EXIF ASCII value truncated")
            tags[tag] = raw.rstrip(b"\x00").decode("utf-8", "replace")
        else:
            tags[tag] = b[val_off: val_off + size]
    return tags


def _tiff_buffer(payload: bytes):
    """Locate the TIFF-structured EXIF buffer inside a JPEG, WebP, or
    TIFF payload. None when the container has no EXIF."""
    payload = bytes(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return payload
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker stream desynced")
            marker = payload[pos + 1]
            if marker == 0xDA:       # SOS: no APP1 past this point
                break
            size = int.from_bytes(payload[pos + 2: pos + 4], "big")
            if marker == 0xE1 and payload[pos + 4: pos + 10] == \
                    b"Exif\x00\x00":
                return payload[pos + 10: pos + 2 + size]
            pos += 2 + size
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from evolution_spark.operators.webp import _chunks

        for f, s, e in _chunks(payload):
            if f == b"EXIF":
                body = payload[s:e]
                if body[:6] == b"Exif\x00\x00":
                    body = body[6:]
                return bytes(body)
        return None
    raise ValueError("parse_exif takes JPEG, WebP, or TIFF payloads")


def parse_exif(payload: bytes) -> dict | None:
    """EXIF curation fields from a JPEG/WebP/TIFF payload, or None
    when the container carries no EXIF block. Raises ValueError on a
    structurally corrupt block (the quarantine-row contract)."""
    b = _tiff_buffer(payload)
    if b is None:
        return None
    if b[:4] == b"II*\x00":
        bo = "little"
    elif b[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("EXIF block missing its TIFF byte-order magic")
    ifd0_off = int.from_bytes(b[4:8], bo)
    ifd0 = _read_ifd_at(b, bo, ifd0_off)
    out = {
        "orientation": ifd0.get(ORIENTATION),
        "make": ifd0.get(MAKE),
        "model": ifd0.get(MODEL),
        "datetime": ifd0.get(DATETIME),
        "datetime_original": None,
        "exif_width": None,
        "exif_height": None,
        "has_gps": GPS_IFD in ifd0,
    }
    if isinstance(out["orientation"], int) and not \
            1 <= out["orientation"] <= 8:
        raise ValueError(f"EXIF orientation {out['orientation']}")
    sub = ifd0.get(EXIF_IFD)
    if isinstance(sub, int):
        exif = _read_ifd_at(b, bo, sub)
        out["datetime_original"] = exif.get(DT_ORIGINAL)
        out["exif_width"] = exif.get(PIXEL_X)
        out["exif_height"] = exif.get(PIXEL_Y)
    return out


# ------------------------------------------------------------ fixtures


def _write_ifd(entries: list[tuple[int, int, list]], data_base: int):
    """(ifd_bytes, data_bytes): entries are (tag, type, values); values
    wider than 4 bytes land in the data area at ``data_base``."""
    ifd = bytearray()
    data = bytearray()
    ifd += len(entries).to_bytes(2, "little")
    for tag, typ, vals in sorted(entries):
        if typ == 2:
            raw = vals[0].encode() + b"\x00"
            cnt = len(raw)
        else:
            step = _TYPE_SIZES[typ]
            raw = b"".join(v.to_bytes(step, "little") for v in vals)
            cnt = len(vals)
        ent = tag.to_bytes(2, "little") + typ.to_bytes(2, "little") \
            + cnt.to_bytes(4, "little")
        if len(raw) <= 4:
            ent += raw + bytes(4 - len(raw))
        else:
            ent += (data_base + len(data)).to_bytes(4, "little")
            data += raw
        ifd += ent
    ifd += (0).to_bytes(4, "little")      # no next IFD
    return bytes(ifd), bytes(data)


def build_exif(orientation: int = 1, make: str = "", model: str = "",
               datetime: str = "", datetime_original: str = "",
               pixel_xy: tuple[int, int] | None = None) -> bytes:
    """A little-endian TIFF EXIF buffer: IFD0 with the curation tags +
    an Exif sub-IFD (0x8769) for DateTimeOriginal / pixel dims."""
    sub_entries = []
    if datetime_original:
        sub_entries.append((DT_ORIGINAL, 2, [datetime_original]))
    if pixel_xy:
        sub_entries.append((PIXEL_X, 4, [pixel_xy[0]]))
        sub_entries.append((PIXEL_Y, 4, [pixel_xy[1]]))
    ifd0_entries = [(ORIENTATION, 3, [orientation])]
    if make:
        ifd0_entries.append((MAKE, 2, [make]))
    if model:
        ifd0_entries.append((MODEL, 2, [model]))
    if datetime:
        ifd0_entries.append((DATETIME, 2, [datetime]))
    # layout: header(8) IFD0 ifd0_data [sub_ifd sub_data]
    n0 = len(ifd0_entries) + (1 if sub_entries else 0)
    ifd0_size = 2 + 12 * n0 + 4
    probe0, data0 = _write_ifd(
        ifd0_entries + ([(EXIF_IFD, 4, [0])] if sub_entries else []),
        8 + ifd0_size,
    )
    sub_off = 8 + ifd0_size + len(data0)
    entries = list(ifd0_entries)
    if sub_entries:
        entries.append((EXIF_IFD, 4, [sub_off]))
    ifd0, data0 = _write_ifd(entries, 8 + ifd0_size)
    out = b"II*\x00" + (8).to_bytes(4, "little") + ifd0 + data0
    if sub_entries:
        sub_size = 2 + 12 * len(sub_entries) + 4
        sub, sub_data = _write_ifd(sub_entries, sub_off + sub_size)
        out += sub + sub_data
    return out


def embed_exif_jpeg(jpeg: bytes, exif: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    body = b"Exif\x00\x00" + exif
    seg = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return jpeg[:2] + seg + jpeg[2:]


def embed_exif_webp(webp: bytes, exif: bytes) -> bytes:
    """Rebuild a lossless WebP as an EXTENDED (VP8X, E-flag) container
    with an EXIF chunk appended."""
    from evolution_spark.operators.webp import _chunks, \
        parse_webp_metadata

    meta = parse_webp_metadata(webp)
    if meta["flavor"] != "lossless":
        raise ValueError("embed_exif_webp takes a lossless WebP")
    chunks = _chunks(webp)
    vp8x = (bytes([0x08]) + b"\x00\x00\x00"
            + (meta["width"] - 1).to_bytes(3, "little")
            + (meta["height"] - 1).to_bytes(3, "little"))
    out = b"VP8X" + (10).to_bytes(4, "little") + vp8x
    for f, s, e in chunks:
        body = webp[s:e]
        out += f + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            out += b"\x00"
    out += b"EXIF" + len(exif).to_bytes(4, "little") + exif
    if len(exif) & 1:
        out += b"\x00"
    return (b"RIFF" + (4 + len(out)).to_bytes(4, "little") + b"WEBP"
            + out)
