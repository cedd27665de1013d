"""OGG container metadata (RFC 3533 pages; Vorbis I / OggOpus
identification headers) — NO audio decode.

The last of the common scraped-corpus audio containers (after WAV,
FLAC, MP3): the page structure is public (RFC 3533 §6 — 'OggS' capture
pattern, 64-bit little-endian granule position, stream serial, page
sequence, CRC, segment lacing table) and so are the codec id headers
(Vorbis I spec §4.2.2: ``\\x01vorbis`` + version + channels +
sample rate; RFC 7845 §5.1: ``OpusHead`` + version + channels +
pre-skip + input rate). Duration comes from the LAST page's granule
position — total PCM samples at the codec's granule rate (always
48 kHz for Opus, the stream rate for Vorbis), minus the Opus pre-skip —
so walking pages yields exact duration without touching a single audio
packet. Decode stays a declared refusal in ``decode_media``.

``build_ogg`` is a fixture builder: spec-shaped pages (real lacing,
real CRC-32 per RFC 3533 §6.1 with the 0x04C11DB7 polynomial, zero
initial value, no reflection) around deterministic filler packets.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

import struct

# RFC 3533 §6.1: CRC-32, generator 0x04C11DB7, init 0, no final XOR,
# no bit reflection (differs from zlib.crc32 on all three counts)
_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ byte]
    return crc


def _parse_page(b: bytes, pos: int):
    """Parse one page header at ``pos``; returns a dict (with
    ``body_start``/``next``) or raises ValueError."""
    if b[pos: pos + 4] != b"OggS":
        raise ValueError(f"bad OGG capture pattern at byte {pos}")
    if pos + 27 > len(b):
        raise ValueError("OGG page header truncated")
    (version, htype, granule, serial, seq, crc, nseg) = struct.unpack_from(
        "<BBqIIIB", b, pos + 4
    )
    if version != 0:
        raise ValueError(f"unsupported OGG stream structure version {version}")
    lace_end = pos + 27 + nseg
    if lace_end > len(b):
        raise ValueError("OGG lacing table truncated")
    lacing = b[pos + 27: lace_end]
    body_len = sum(lacing)
    if lace_end + body_len > len(b):
        raise ValueError("OGG page body truncated")
    # verify the page CRC with the crc field zeroed (RFC 3533 §6.1)
    page = bytearray(b[pos: lace_end + body_len])
    page[22:26] = b"\x00\x00\x00\x00"
    if _ogg_crc(bytes(page)) != crc:
        raise ValueError(f"OGG page CRC mismatch at byte {pos}")
    return {
        "htype": htype,
        "granule": granule,
        "serial": serial,
        "seq": seq,
        "lacing": lacing,
        "body_start": lace_end,
        "next": lace_end + body_len,
    }


def parse_ogg_metadata(payload: bytes) -> dict:
    """Walk every page of a (single-stream) OGG file and return exact
    metadata: ``codec`` ('vorbis'/'opus'), ``channels``,
    ``sample_rate`` (the codec's input rate), ``pre_skip`` (Opus, else
    0), ``n_pages``, ``last_granule``, ``total_samples`` (granule
    units minus pre-skip) and ``duration_us`` (at the granule rate —
    48 kHz for Opus, the stream rate for Vorbis). Raises ValueError on
    structural problems, CRC mismatches, or multiplexed streams."""
    b = bytes(payload)
    pos = 0
    first = _parse_page(b, 0)
    if not first["htype"] & 0x02:
        raise ValueError("first OGG page is not a beginning-of-stream page")
    body = b[first["body_start"]: first["next"]]
    if body[:7] == b"\x01vorbis":
        codec = "vorbis"
        if len(body) < 16:
            raise ValueError("Vorbis identification header truncated")
        channels = body[11]
        rate = int.from_bytes(body[12:16], "little")
        pre_skip = 0
        granule_rate = rate
    elif body[:8] == b"OpusHead":
        codec = "opus"
        if len(body) < 19:
            raise ValueError("OpusHead truncated")
        channels = body[9]
        pre_skip = int.from_bytes(body[10:12], "little")
        rate = int.from_bytes(body[12:16], "little")
        granule_rate = 48000  # RFC 7845 §4: granules always at 48 kHz
    else:
        raise ValueError(
            "unrecognized OGG codec id header (vorbis/opus only)"
        )
    serial = first["serial"]
    n_pages = 1
    last_granule = first["granule"]
    expect_seq = first["seq"] + 1
    pos = first["next"]
    saw_eos = False
    while pos < len(b):
        page = _parse_page(b, pos)
        if page["serial"] != serial:
            raise ValueError(
                "multiplexed OGG (second stream serial) is not supported"
            )
        if page["seq"] != expect_seq:
            raise ValueError(
                f"OGG page sequence gap: expected {expect_seq}, "
                f"got {page['seq']} (lost pages)"
            )
        expect_seq += 1
        n_pages += 1
        if page["granule"] != -1:
            last_granule = page["granule"]
        saw_eos = bool(page["htype"] & 0x04)
        pos = page["next"]
    if not saw_eos:
        raise ValueError("OGG stream ends without an end-of-stream page")
    total = max(0, last_granule - pre_skip)
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "pre_skip": pre_skip,
        "n_pages": n_pages,
        "last_granule": last_granule,
        "total_samples": total,
        "duration_us": total * 1_000_000 // granule_rate,
    }


def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list[bytes]) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        body += pkt
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)  # final lace < 255 terminates the packet
    hdr = b"OggS" + struct.pack(
        "<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing)
    ) + bytes(lacing)
    page = bytearray(hdr + body)
    crc = _ogg_crc(bytes(page))
    page[22:26] = crc.to_bytes(4, "little")
    return bytes(page)


def build_ogg(
    codec: str,
    total_samples: int,
    rate: int = 48000,
    channels: int = 2,
    pre_skip: int = 312,
    n_audio_pages: int = 3,
    page_bytes: int = 120,
    serial: int = 0x1234,
    seed: int = 0,
) -> bytes:
    """Build a spec-shaped single-stream OGG for the metadata walker
    (NOT an encode: audio packets are deterministic filler; only page
    structure, id headers, granules and CRCs are real). ``total_samples``
    is the POST-pre-skip sample count the walker should report."""
    if codec == "vorbis":
        id_pkt = (b"\x01vorbis" + bytes(4) + bytes([channels])
                  + rate.to_bytes(4, "little") + bytes(16) + b"\x01")
        pre = 0
    elif codec == "opus":
        id_pkt = (b"OpusHead" + bytes([1, channels])
                  + pre_skip.to_bytes(2, "little")
                  + rate.to_bytes(4, "little") + bytes(3))
        pre = pre_skip
    else:
        raise ValueError("codec must be 'vorbis' or 'opus'")
    out = bytearray(_page(serial, 0, 0, 0x02, [id_pkt]))  # BOS
    # comment/setup header page (granule 0, no audio yet)
    out += _page(serial, 1, 0, 0,
                 [b"\x03vorbis\x00" if codec == "vorbis"
                  else b"OpusTags\x00"])
    final_granule = total_samples + pre
    for p in range(n_audio_pages):
        frac = (p + 1) / n_audio_pages
        granule = final_granule if p == n_audio_pages - 1 else int(
            final_granule * frac
        )
        pkt = bytes((seed * 17 + p * 29 + j) % 251
                    for j in range(page_bytes))
        htype = 0x04 if p == n_audio_pages - 1 else 0
        out += _page(serial, 2 + p, granule, htype, [pkt])
    return bytes(out)
