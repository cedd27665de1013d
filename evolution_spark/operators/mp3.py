"""MP3 (MPEG audio) frame-header metadata walker — NO lossy decode.

Scraped corpora carry far more MP3 than lossless audio, but a from-spec
synthesis-filterbank decoder is out of scope; what curation pipelines
actually need from the payload is metadata — duration, bitrate profile,
sample rate, channel mode — all of which live in the 32-bit frame
headers whose layout is public (ISO/IEC 11172-3 §2.4.1.3 for MPEG-1;
ISO/IEC 13818-3 for MPEG-2 LSF; the de-facto MPEG-2.5 extension uses
the remaining version code). This module walks every frame header,
skipping ID3v2 (syncsafe-size) prefixes and ID3v1 128-byte tails, and
returns exact totals; PCM extraction stays a declared refusal in
``decode_media``.

Header layout (32 bits, big-endian):
  AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
  A sync (11 x 1), B version (00=MPEG2.5 01=reserved 10=MPEG2 11=MPEG1),
  C layer (01=III 10=II 11=I), D protection (0 = CRC-16 follows),
  E bitrate index, F sample-rate index, G padding, H private,
  I channel mode (00 stereo 01 joint 10 dual 11 mono), J mode ext,
  K copyright, L original, M emphasis.

Frame sizes (bitrate in bit/s): Layer I uses 4-byte slots,
``(12*bitrate//rate + padding) * 4``; Layers II/III use 1-byte slots,
``spf//8 * bitrate // rate + padding`` where spf (samples per frame) is
384 for Layer I, 1152 for Layer II, and 1152 (MPEG-1) / 576 (MPEG-2 and
2.5) for Layer III.

Fixture building: ``build_mp3`` emits structurally valid frame
sequences with deterministic filler payloads — it is a METADATA fixture
generator, not an encoder; the filler is never interpreted because the
walker skips by computed frame length.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

# bitrate tables in kbit/s, indexed [1..14]; 0 = free format (refused),
# 15 = invalid. Keyed by (version_group, layer): version_group 1 =
# MPEG-1, 2 = MPEG-2/2.5 (both LSF groups share tables).
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

# sample rates by version code (00=2.5, 10=2, 11=1) and 2-bit index
_RATES = {
    0b11: (44100, 48000, 32000),  # MPEG-1
    0b10: (22050, 24000, 16000),  # MPEG-2
    0b00: (11025, 12000, 8000),   # MPEG-2.5
}
_VERSION_NAME = {0b11: "1", 0b10: "2", 0b00: "2.5"}
_MODE_NAME = {0b00: "stereo", 0b01: "joint_stereo",
              0b10: "dual_channel", 0b11: "mono"}


def _samples_per_frame(version_code: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version_code == 0b11 else 576


def _frame_length(version_code: int, layer: int, bitrate_kbps: int,
                  rate: int, padding: int) -> int:
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // rate + padding) * 4
    spf = _samples_per_frame(version_code, layer)
    return spf // 8 * bps // rate + padding


def _parse_header(b: bytes, pos: int):
    """Parse the 4 header bytes at ``pos``; returns a dict or raises
    ValueError for anything that is not a valid frame header."""
    if pos + 4 > len(b):
        raise ValueError("MP3 frame header truncated")
    h = int.from_bytes(b[pos: pos + 4], "big")
    if h >> 21 != 0x7FF:
        raise ValueError(f"bad MP3 frame sync at byte {pos}")
    version_code = (h >> 19) & 0b11
    if version_code == 0b01:
        raise ValueError("reserved MPEG version code")
    layer_code = (h >> 17) & 0b11
    if layer_code == 0b00:
        raise ValueError("reserved MPEG layer code")
    layer = 4 - layer_code  # 01 -> III, 10 -> II, 11 -> I
    protection = (h >> 16) & 1
    br_idx = (h >> 12) & 0b1111
    if br_idx == 0:
        raise ValueError("free-format MP3 bitrate is not supported")
    if br_idx == 0b1111:
        raise ValueError("invalid MP3 bitrate index 15")
    sr_idx = (h >> 10) & 0b11
    if sr_idx == 0b11:
        raise ValueError("reserved MP3 sample-rate index")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 0b11
    group = 1 if version_code == 0b11 else 2
    bitrate = _BITRATES[(group, layer)][br_idx]
    rate = _RATES[version_code][sr_idx]
    return {
        "version_code": version_code,
        "layer": layer,
        "crc": protection == 0,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "mode": mode,
        "frame_len": _frame_length(version_code, layer, bitrate, rate,
                                   padding),
        "spf": _samples_per_frame(version_code, layer),
    }


def _id3v2_size(b: bytes) -> int:
    """Size of an ID3v2 prefix (0 if none): 'ID3' + ver(2) + flags(1) +
    4-byte syncsafe size, plus optional footer flag (bit 4)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    if any(x & 0x80 for x in b[6:10]):
        raise ValueError("ID3v2 size bytes are not syncsafe")
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    footer = 10 if b[5] & 0x10 else 0
    return 10 + size + footer


def _xing_offset(version_code: int, mode: int) -> int:
    """Byte offset of a Xing/Info tag inside the first frame, after the
    header and Layer-III side info (ISO 11172-3 §2.4.1.7 sizes)."""
    if version_code == 0b11:  # MPEG-1
        side = 17 if mode == 0b11 else 32
    else:
        side = 9 if mode == 0b11 else 17
    return 4 + side


def parse_mp3_metadata(payload: bytes) -> dict:
    """Walk every MPEG-audio frame header and return exact metadata.

    Returns keys: ``version`` ('1'/'2'/'2.5'), ``layer`` (1/2/3),
    ``sample_rate``, ``channels``, ``channel_mode``, ``n_frames``,
    ``total_samples``, ``duration_us`` (floor of samples/rate),
    ``bitrate_kbps_min/max/sum`` (exact ints — avg = sum/n_frames),
    ``vbr``, ``has_id3v2``, ``has_id3v1``, ``has_xing``,
    ``xing_frames`` (None unless a Xing/Info frame count is present).

    Strict walk: frames must be back-to-back (after any ID3v2 prefix);
    a final partial frame or an ID3v1 'TAG' tail is tolerated, anything
    else raises ValueError. Version/layer/rate must not change
    mid-stream (true of every real encoder)."""
    payload = bytes(payload)
    pos = _id3v2_size(payload)
    has_id3v2 = pos > 0
    end = len(payload)
    has_id3v1 = end - pos >= 128 and payload[end - 128: end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    if pos + 4 > end:
        raise ValueError("no MP3 frame data after tags")

    first = _parse_header(payload, pos)
    n_frames = 0
    total_samples = 0
    br_min = br_max = None
    br_sum = 0
    has_xing = False
    xing_frames = None
    while pos + 4 <= end:
        hdr = _parse_header(payload, pos)
        for k in ("version_code", "layer", "sample_rate", "mode"):
            if hdr[k] != first[k]:
                raise ValueError(f"MP3 stream changes {k} mid-stream")
        if pos + hdr["frame_len"] > end:
            break  # truncated final frame: not counted, like stream rippers
        if n_frames == 0:
            # a protected frame carries a 2-byte CRC between header and
            # side info, shifting the Xing tag by 2
            off = (pos + _xing_offset(hdr["version_code"], hdr["mode"])
                   + (2 if hdr["crc"] else 0))
            tag = payload[off: off + 4]
            if tag in (b"Xing", b"Info"):
                has_xing = True
                flags = int.from_bytes(payload[off + 4: off + 8], "big")
                if flags & 1:
                    xing_frames = int.from_bytes(
                        payload[off + 8: off + 12], "big")
        n_frames += 1
        total_samples += hdr["spf"]
        br = hdr["bitrate_kbps"]
        br_sum += br
        br_min = br if br_min is None else min(br_min, br)
        br_max = br if br_max is None else max(br_max, br)
        pos += hdr["frame_len"]
    if n_frames == 0:
        raise ValueError("MP3 payload contains no complete frame")
    rate = first["sample_rate"]
    return {
        "version": _VERSION_NAME[first["version_code"]],
        "layer": first["layer"],
        "sample_rate": rate,
        "channels": 1 if first["mode"] == 0b11 else 2,
        "channel_mode": _MODE_NAME[first["mode"]],
        "n_frames": n_frames,
        "total_samples": total_samples,
        "duration_us": total_samples * 1_000_000 // rate,
        "bitrate_kbps_min": br_min,
        "bitrate_kbps_max": br_max,
        "bitrate_kbps_sum": br_sum,
        "vbr": br_min != br_max,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
        "has_xing": has_xing,
        "xing_frames": xing_frames,
    }


def build_mp3(
    n_frames: int,
    version: str = "1",
    layer: int = 3,
    bitrate_indices=9,
    sr_idx: int = 0,
    mode: int = 0,
    pad_alternate: bool = True,
    id3v2: bytes | None = None,
    id3v1: bool = False,
    xing: bool = False,
    seed: int = 0,
) -> bytes:
    """Build a structurally valid MPEG-audio stream for metadata tests.

    NOT an encoder: frame payloads are deterministic filler (never
    interpreted — the walker skips by computed frame length).
    ``bitrate_indices`` is a single index or a per-frame sequence (a
    varying sequence yields a VBR stream). ``pad_alternate`` sets the
    padding bit on every odd frame so frame-length handling of the
    padding slot is exercised. ``xing`` plants a Xing tag with the frame
    count in the first frame's ancillary area."""
    vcode = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    lcode = {1: 0b11, 2: 0b10, 3: 0b01}[layer]
    if isinstance(bitrate_indices, int):
        bitrate_indices = [bitrate_indices] * n_frames
    if len(bitrate_indices) != n_frames:
        raise ValueError("bitrate_indices length must equal n_frames")
    group = 1 if vcode == 0b11 else 2
    rate = _RATES[vcode][sr_idx]
    out = bytearray()
    if id3v2 is not None:
        if len(id3v2) >= 1 << 28:
            raise ValueError("ID3v2 body too large for syncsafe size")
        sz = len(id3v2)
        out += b"ID3\x03\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
             sz & 0x7F]
        ) + id3v2
    for f in range(n_frames):
        br_idx = bitrate_indices[f]
        if not 1 <= br_idx <= 14:
            raise ValueError(f"bitrate index {br_idx} outside [1, 14]")
        padding = 1 if (pad_alternate and f % 2 == 1) else 0
        bitrate = _BITRATES[(group, layer)][br_idx]
        flen = _frame_length(vcode, layer, bitrate, rate, padding)
        hdr = bytearray(4)
        hdr[0] = 0xFF
        hdr[1] = 0xE0 | (vcode << 3) | (lcode << 1) | 1  # no CRC
        hdr[2] = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        hdr[3] = (mode & 0b11) << 6
        body = bytearray(
            (seed * 31 + f * 7 + j) % 251 for j in range(flen - 4)
        )
        if f == 0 and xing:
            off = _xing_offset(vcode, mode) - 4  # body-relative
            if off + 12 > len(body):
                raise ValueError("first frame too small for a Xing tag")
            body[off: off + 4] = b"Xing"
            body[off + 4: off + 8] = (1).to_bytes(4, "big")  # FRAMES flag
            body[off + 8: off + 12] = n_frames.to_bytes(4, "big")
        out += hdr + body
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


_ID3_ENCODINGS = {
    0: "latin-1",        # ISO-8859-1
    1: "utf-16",         # UTF-16 with BOM
    2: "utf-16-be",      # UTF-16BE, no BOM (v2.4)
    3: "utf-8",          # v2.4
}


_ID3V22_MAP = {  # v2.2 3-byte ids -> the v2.3/2.4 names callers key on
    b"TT2": "TIT2", b"TP1": "TPE1", b"TAL": "TALB", b"TCO": "TCON",
    b"TYE": "TYER", b"TRK": "TRCK",
}


def _parse_id3v22(b: bytes, total: int) -> dict:
    """ID3v2.2 frames (round 13 — was presence-only): 3-byte ids,
    3-byte big-endian sizes, no per-frame flags; text frames carry the
    same leading-encoding-byte layout (latin-1 / UTF-16-BOM only in
    v2.2). Known ids normalize to their v2.3 names so the curation
    join keys (TIT2/TPE1/TALB) work across tag versions."""
    out: dict = {"_version": "2.2"}
    pos = 10
    end = min(total, len(b))
    while pos + 6 <= end:
        fid = b[pos: pos + 3]
        if fid == b"\x00\x00\x00":
            break  # padding
        if not all(0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A
                   for c in fid):
            raise ValueError(f"ID3v2.2 frame id {fid!r} malformed")
        size = int.from_bytes(b[pos + 3: pos + 6], "big")
        body = b[pos + 6: pos + 6 + size]
        if len(body) < size:
            raise ValueError(f"ID3v2.2 frame {fid!r} overruns the tag")
        pos += 6 + size
        if not fid.startswith(b"T") or size < 1:
            continue
        if body[0] not in (0, 1):
            raise ValueError(
                f"ID3v2.2 frame {fid!r} has encoding {body[0]} "
                "(v2.2 allows latin-1/UTF-16 only)"
            )
        try:
            text = body[1:].decode(_ID3_ENCODINGS[body[0]])
        except UnicodeDecodeError as exc:
            raise ValueError(
                f"ID3v2.2 frame {fid!r} text corrupt: {exc}")
        key = _ID3V22_MAP.get(fid, fid.decode("ascii"))
        out[key] = text.rstrip("\x00")
    return out


def parse_id3v2_tags(payload: bytes) -> dict:
    """Parse the TEXT frames of an ID3v2.2/2.3/2.4 prefix into a dict
    of frame-id -> decoded string (T*** frames only — the curation
    fields: TIT2 title, TPE1 artist, TALB album, TCON genre, TDRC/TYER
    year...; v2.2 3-byte ids normalize to these names). Returns {}
    when no ID3v2 tag is present; raises ValueError on structural
    corruption (bad syncsafe bytes, frame overruns). v2.4 per-frame
    unsynchronisation and compression are refused by omission (the
    frame is skipped with its flag noted under ``_skipped``) rather
    than mis-decoded."""
    b = bytes(payload)
    total = _id3v2_size(b)
    if total == 0:
        return {}
    if len(b) < 10:
        raise ValueError("ID3v2 header truncated")
    ver = b[3]
    if ver == 2:
        return _parse_id3v22(b, total)
    if ver not in (3, 4):
        # future/unknown layout — report presence without frames
        # rather than mis-parsing
        return {"_version": f"2.{ver}"}
    flags = b[5]
    pos = 10
    end = min(total - (10 if flags & 0x10 else 0), len(b))
    if flags & 0x40:  # extended header: skip by its own size field
        if pos + 4 > end:
            raise ValueError("ID3v2 extended header truncated")
        ext = int.from_bytes(b[pos: pos + 4], "big")
        if ver == 4:  # syncsafe in v2.4
            ext = ((ext & 0x7F000000) >> 3 | (ext & 0x7F0000) >> 2
                   | (ext & 0x7F00) >> 1 | (ext & 0x7F))
        pos += ext if ver == 4 else ext + 4
    out: dict = {"_version": f"2.{ver}"}
    skipped = []
    while pos + 10 <= end:
        fid = b[pos: pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A
                   for c in fid):
            raise ValueError(f"ID3v2 frame id {fid!r} malformed")
        size = int.from_bytes(b[pos + 4: pos + 8], "big")
        if ver == 4:
            if any(x & 0x80 for x in b[pos + 4: pos + 8]):
                raise ValueError("ID3v2.4 frame size not syncsafe")
            size = ((b[pos + 4] << 21) | (b[pos + 5] << 14)
                    | (b[pos + 6] << 7) | b[pos + 7])
        fflags = int.from_bytes(b[pos + 8: pos + 10], "big")
        body = b[pos + 10: pos + 10 + size]
        if len(body) < size:
            raise ValueError(f"ID3v2 frame {fid!r} overruns the tag")
        pos += 10 + size
        if not fid.startswith(b"T") or size < 1:
            continue
        if fflags & 0x00FF:  # compression/encryption/unsync per frame
            skipped.append(fid.decode("ascii"))
            continue
        enc = _ID3_ENCODINGS.get(body[0])
        if enc is None:
            raise ValueError(
                f"ID3v2 frame {fid!r} has unknown text encoding "
                f"{body[0]}"
            )
        try:
            text = body[1:].decode(enc)
        except UnicodeDecodeError as exc:
            raise ValueError(f"ID3v2 frame {fid!r} text corrupt: {exc}")
        out[fid.decode("ascii")] = text.rstrip("\x00")
    if skipped:
        out["_skipped"] = skipped
    return out


def build_id3v2(frames: dict, version: int = 3, encoding: int = 3,
                padding: int = 24) -> bytes:
    """Fixture builder: an ID3v2.3/2.4 tag from frame-id -> text."""
    body = bytearray()
    for fid, text in frames.items():
        raw = bytes([encoding]) + text.encode(_ID3_ENCODINGS[encoding])
        size = len(raw)
        if version == 4:
            enc_size = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                              (size >> 7) & 0x7F, size & 0x7F])
        else:
            enc_size = size.to_bytes(4, "big")
        body += fid.encode("ascii") + enc_size + b"\x00\x00" + raw
    body += bytes(padding)
    sz = len(body)
    return (b"ID3" + bytes([version, 0, 0])
            + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                     (sz >> 7) & 0x7F, sz & 0x7F]) + bytes(body))
