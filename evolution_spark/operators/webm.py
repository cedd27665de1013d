"""WebM / Matroska (EBML) container metadata + cue index — NO codec
decode.

The EBML structure is public (RFC 8794; element ids/semantics from the
public Matroska/WebM specs): every element is a variable-length-integer
id (the VINT length marker kept, so ids compare as the spec writes
them) + a VINT size (marker stripped) + payload; container elements
nest children back-to-back. This module walks
EBML-header → Segment → Info/Tracks/Cues and extracts what video
curation needs — duration, per-track type/codec/resolution/audio
params, and the CUE index (time → byte position of cluster), the
Matroska analogue of MP4's stss/stco keyframe index that a distributed
frame sampler range-reads. VP8/VP9/AV1/Opus bitstream decode stays a
declared refusal in ``decode_media``.

``build_webm`` is a fixture builder: spec-shaped EBML with deterministic
filler clusters, NOT encoded video — the walker never interprets block
payloads.

Element ids used (Matroska spec):
  1A45DFA3 EBML  4286 DocType
  18538067 Segment
  1549A966 Info    2AD7B1 TimestampScale (ns/tick, default 1,000,000)
                   4489 Duration (float, ticks)
  1654AE6B Tracks  AE TrackEntry  D7 TrackNumber  83 TrackType
                   86 CodecID  E0 Video (B0 PixelWidth, BA PixelHeight)
                   E1 Audio (B5 SamplingFrequency, 9F Channels)
  1C53BB6B Cues    BB CuePoint  B3 CueTime
                   B7 CueTrackPositions (F7 CueTrack,
                                         F1 CueClusterPosition)
  1F43B675 Cluster

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

import struct


def _read_vint(b: bytes, pos: int, keep_marker: bool):
    """Read one EBML VINT at ``pos``; returns (value, next_pos). Element
    IDs keep the length-marker bit (compare as spec constants); sizes
    strip it."""
    if pos >= len(b):
        raise ValueError("EBML VINT truncated")
    first = b[pos]
    if first == 0:
        raise ValueError("invalid EBML VINT (zero first byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(b):
        raise ValueError("EBML VINT truncated")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | b[pos + i]
    return v, pos + length


def _walk(b: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) over [start, end)."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"EBML element 0x{eid:X} size out of bounds")
        yield eid, pos, pos + size
        pos += size


def _child(b: bytes, start: int, end: int, wanted: int):
    for eid, s, e in _walk(b, start, end):
        if eid == wanted:
            return s, e
    return None


def _uint(b: bytes, s: int, e: int) -> int:
    return int.from_bytes(b[s:e], "big")


def _float(b: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", b[s:e])[0]
    if n == 8:
        return struct.unpack(">d", b[s:e])[0]
    raise ValueError(f"EBML float of width {n} (4 or 8 only)")


def parse_webm_metadata(payload: bytes) -> dict:
    """Parse Matroska/WebM container metadata: doctype, duration, and
    per-track facts. Raises ValueError on structural problems."""
    b = bytes(payload)
    head = _child(b, 0, len(b), 0x1A45DFA3)
    if head is None:
        raise ValueError("not an EBML payload (no EBML header)")
    doctype = "matroska"  # the spec default when DocType is absent
    dt = _child(b, head[0], head[1], 0x4286)
    if dt is not None:
        doctype = b[dt[0]: dt[1]].decode("ascii", "replace")
    seg = _child(b, 0, len(b), 0x18538067)
    if seg is None:
        raise ValueError("EBML payload without a Segment element")

    info = _child(b, seg[0], seg[1], 0x1549A966)
    if info is None:
        raise ValueError("Segment without an Info element")
    scale_ns = 1_000_000
    ts = _child(b, info[0], info[1], 0x2AD7B1)
    if ts is not None:
        scale_ns = _uint(b, *ts)
    duration_ticks = None
    du = _child(b, info[0], info[1], 0x4489)
    if du is not None:
        duration_ticks = _float(b, *du)

    tracks = []
    tr = _child(b, seg[0], seg[1], 0x1654AE6B)
    if tr is not None:
        for eid, s, e in _walk(b, tr[0], tr[1]):
            if eid != 0xAE:
                continue
            t: dict = {"track_number": None, "track_type": None,
                       "codec_id": None, "width": None, "height": None,
                       "sample_rate": None, "channels": None}
            for cid, cs, ce in _walk(b, s, e):
                if cid == 0xD7:
                    t["track_number"] = _uint(b, cs, ce)
                elif cid == 0x83:
                    t["track_type"] = _uint(b, cs, ce)
                elif cid == 0x86:
                    t["codec_id"] = b[cs:ce].decode("ascii", "replace")
                elif cid == 0xE0:
                    v = _child(b, cs, ce, 0xB0)
                    t["width"] = _uint(b, *v) if v else None
                    v = _child(b, cs, ce, 0xBA)
                    t["height"] = _uint(b, *v) if v else None
                elif cid == 0xE1:
                    v = _child(b, cs, ce, 0xB5)
                    t["sample_rate"] = (
                        int(_float(b, *v)) if v else None
                    )
                    v = _child(b, cs, ce, 0x9F)
                    t["channels"] = _uint(b, *v) if v else None
            tracks.append(t)

    n_clusters = sum(
        1 for eid, _, _ in _walk(b, seg[0], seg[1]) if eid == 0x1F43B675
    )
    return {
        "doctype": doctype,
        "timestamp_scale_ns": scale_ns,
        "duration_ticks": duration_ticks,
        "duration_us": (
            int(duration_ticks * scale_ns / 1000)
            if duration_ticks is not None else None
        ),
        "n_tracks": len(tracks),
        "tracks": tracks,
        "n_clusters": n_clusters,
    }


def cue_index(payload: bytes):
    """The Cues (seek) index: (time_ticks, track, cluster_byte_offset)
    triples, cluster offsets relative to the Segment body start per
    spec — what a frame sampler range-reads. Empty list when the file
    carries no Cues element."""
    b = bytes(payload)
    seg = _child(b, 0, len(b), 0x18538067)
    if seg is None:
        raise ValueError("EBML payload without a Segment element")
    cues = _child(b, seg[0], seg[1], 0x1C53BB6B)
    if cues is None:
        return []
    out = []
    for eid, s, e in _walk(b, cues[0], cues[1]):
        if eid != 0xBB:
            continue
        tm = _child(b, s, e, 0xB3)
        if tm is None:
            raise ValueError("CuePoint without CueTime")
        time_ticks = _uint(b, *tm)
        for cid, cs, ce in _walk(b, s, e):
            if cid != 0xB7:
                continue
            trk = _child(b, cs, ce, 0xF7)
            pos = _child(b, cs, ce, 0xF1)
            if pos is None:
                raise ValueError("CueTrackPositions without position")
            out.append((
                time_ticks,
                _uint(b, *trk) if trk else None,
                _uint(b, *pos),
            ))
    return out


def _enc_vint_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_vint_size(size: int) -> bytes:
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:  # all-ones is reserved
            return (size | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def build_webm(
    duration_ticks: float,
    video: dict | None = None,
    audio: dict | None = None,
    cue_times=(),
    n_clusters: int = 2,
    cluster_bytes: int = 64,
    timestamp_scale_ns: int = 1_000_000,
    doctype: str = "webm",
    seed: int = 0,
) -> bytes:
    """Build a spec-shaped Matroska/WebM container for the metadata
    walker (NOT a playable encode: clusters hold deterministic filler).
    ``video`` is ``{"width", "height", "codec"}``; ``audio`` is
    ``{"rate", "channels", "codec"}``; ``cue_times`` plants one CuePoint
    per tick value, each pointing at a real cluster offset."""
    head = _el(0x1A45DFA3, _el(0x4286, doctype.encode()))
    entries = b""
    num = 1
    if video:
        entries += _el(0xAE,
                       _el_uint(0xD7, num) + _el_uint(0x83, 1)
                       + _el(0x86, video.get("codec", "V_VP9").encode())
                       + _el(0xE0, _el_uint(0xB0, video["width"])
                             + _el_uint(0xBA, video["height"])))
        num += 1
    if audio:
        entries += _el(0xAE,
                       _el_uint(0xD7, num) + _el_uint(0x83, 2)
                       + _el(0x86, audio.get("codec", "A_OPUS").encode())
                       + _el(0xE1,
                             _el(0xB5, struct.pack(
                                 ">f", float(audio["rate"])))
                             + _el_uint(0x9F, audio["channels"])))
    info = _el(0x1549A966,
               _el_uint(0x2AD7B1, timestamp_scale_ns)
               + _el(0x4489, struct.pack(">d", float(duration_ticks))))
    tracks = _el(0x1654AE6B, entries)

    clusters = []
    for c in range(n_clusters):
        body = bytes((seed * 41 + c * 13 + j) % 251
                     for j in range(cluster_bytes))
        clusters.append(_el(0x1F43B675, body))

    # cues point at cluster offsets RELATIVE to the segment body; build
    # the segment twice — cue element size is stable because offsets are
    # padded to 4 bytes
    def seg_body(cues_el: bytes) -> bytes:
        return info + tracks + cues_el + b"".join(clusters)

    def cues_for(offsets: list[int]) -> bytes:
        pts = b""
        for t, off in zip(cue_times, offsets):
            pts += _el(0xBB,
                       _el_uint(0xB3, t)
                       + _el(0xB7, _el_uint(0xF7, 1)
                             + _el(0xF1, off.to_bytes(4, "big"))))
        return _el(0x1C53BB6B, pts) if cue_times else b""

    placeholder = cues_for([0] * len(cue_times))
    base = len(info) + len(tracks) + len(placeholder)
    offsets = []
    pos = base
    for i, cl in enumerate(clusters):
        if i < len(cue_times):
            offsets.append(pos)
        pos += len(cl)
    # fewer clusters than cue times: repeat the last cluster offset
    while len(offsets) < len(cue_times):
        offsets.append(offsets[-1] if offsets else base)
    cues = cues_for(offsets)
    assert len(cues) == len(placeholder)
    return head + _el(0x18538067, seg_body(cues))
