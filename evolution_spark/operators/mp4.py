"""MP4 / ISO-BMFF container metadata + keyframe byte index — NO codec
decode.

Video curation at corpus scale needs container-level facts — duration,
track layout, codec fourcc, resolutions, and where the sync samples
(keyframes) live in the byte stream so a frame sampler can range-read
just those — none of which needs a video decoder. The box (atom)
structure is public (ISO/IEC 14496-12): every box is
``size(4, big-endian) + type(4)`` with ``size == 1`` meaning a 64-bit
largesize follows and ``size == 0`` meaning to-end-of-file; containers
(moov/trak/mdia/minf/stbl) nest children back-to-back.

This module walks ftyp → moov → per-trak mdhd/hdlr/tkhd → stbl and
reconstructs the sample layout from the four sample tables:

* ``stts``  decode deltas → total samples + track duration cross-check
* ``stss``  sync-sample numbers (ABSENT means every sample is sync)
* ``stsc``  sample→chunk runs (first_chunk, samples_per_chunk)
* ``stsz``  per-sample byte sizes (or one constant size)
* ``stco``/``co64`` chunk byte offsets (32/64-bit)

``keyframe_index`` turns those into exact (sample_number, file_offset,
size) triples per video track: sample j lives in the chunk its stsc run
assigns, at chunk_offset + the sizes of the samples that precede it in
that chunk. Actual frame decode (avc1/hev1 bitstreams) stays a declared
refusal in ``decode_media``.

``build_mp4`` is a fixture builder: it emits a spec-shaped container
(ftyp/moov with full visual+audio sample entries/mdat) whose mdat holds
deterministic filler, NOT encoded video — the walker never interprets
sample bytes.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

import struct


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("ISO-BMFF box header truncated")
        size = int.from_bytes(b[pos: pos + 4], "big")
        btype = b[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("ISO-BMFF largesize truncated")
            size = int.from_bytes(b[pos + 8: pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"ISO-BMFF box {btype!r} size out of bounds")
        yield btype, body, pos + size
        pos += size


def _child(b: bytes, start: int, end: int, wanted: bytes):
    for t, s, e in _walk_boxes(b, start, end):
        if t == wanted:
            return s, e
    return None


def _fullbox(b: bytes, s: int):
    """Return (version, flags, body_start) for a full box at s."""
    return b[s], int.from_bytes(b[s + 1: s + 4], "big"), s + 4


def _count(b: bytes, p: int, e: int, entry: int, what: str) -> int:
    """Read a 4-byte entry count and bound it by the box body — a
    corrupt count must refuse, not allocate or run off the buffer."""
    n = int.from_bytes(b[p: p + 4], "big")
    if p + 4 + n * entry > e:
        raise ValueError(f"{what} count {n} exceeds its box size")
    return n


def _read_stts(b: bytes, s: int, e: int):
    _, _, p = _fullbox(b, s)
    n = _count(b, p, e, 8, "stts")
    p += 4
    total, dur = 0, 0
    for _ in range(n):
        cnt, delta = struct.unpack_from(">II", b, p)
        total += cnt
        dur += cnt * delta
        p += 8
    return total, dur


def _read_stss(b: bytes, s: int, e: int):
    _, _, p = _fullbox(b, s)
    n = _count(b, p, e, 4, "stss")
    p += 4
    return [int.from_bytes(b[p + 4 * i: p + 4 * i + 4], "big")
            for i in range(n)]


def _read_stsc(b: bytes, s: int, e: int):
    _, _, p = _fullbox(b, s)
    n = _count(b, p, e, 12, "stsc")
    p += 4
    runs = []
    for _ in range(n):
        first, spc, _sdi = struct.unpack_from(">III", b, p)
        runs.append((first, spc))
        p += 12
    return runs


def _read_stsz(b: bytes, s: int, e: int):
    _, _, p = _fullbox(b, s)
    if p + 8 > e:
        raise ValueError("stsz box truncated")
    const, n = struct.unpack_from(">II", b, p)
    p += 8
    if const:
        if n > (1 << 28):
            raise ValueError(f"stsz sample count {n} implausible")
        return [const] * n
    if p + 4 * n > e:
        raise ValueError(f"stsz count {n} exceeds its box size")
    return [int.from_bytes(b[p + 4 * i: p + 4 * i + 4], "big")
            for i in range(n)]


def _read_stco(b: bytes, s: int, e: int, wide: bool):
    _, _, p = _fullbox(b, s)
    w = 8 if wide else 4
    n = _count(b, p, e, w, "stco/co64")
    p += 4
    return [int.from_bytes(b[p + w * i: p + w * i + w], "big")
            for i in range(n)]


def _sample_layout(sizes, stsc_runs, chunk_offsets):
    """Map each sample to its absolute byte offset via stsc/stco.

    stsc runs are (first_chunk 1-based, samples_per_chunk); a run covers
    chunks up to the next run's first_chunk - 1, the last run up to the
    stco chunk count."""
    n_chunks = len(chunk_offsets)
    spc_by_chunk = []
    prev_first = 0
    for ridx, (first, spc) in enumerate(stsc_runs):
        if first <= prev_first:
            raise ValueError(
                "stsc first_chunk values must be strictly increasing"
            )
        prev_first = first
        last = (stsc_runs[ridx + 1][0] - 1 if ridx + 1 < len(stsc_runs)
                else n_chunks)
        if first > n_chunks + 1 or last > n_chunks:
            raise ValueError(
                f"stsc run references chunk {max(first, last)} beyond "
                f"the stco count {n_chunks}"
            )
        spc_by_chunk.extend(spc for _ in range(first, last + 1))
    offsets = []
    sample = 0
    for c, spc in enumerate(spc_by_chunk):
        off = chunk_offsets[c]
        for _ in range(spc):
            if sample >= len(sizes):
                return offsets  # partial last chunk
            offsets.append(off)
            off += sizes[sample]
            sample += 1
    if sample < len(sizes):
        raise ValueError("stsc/stco cover fewer samples than stsz")
    return offsets


def _need(x, what: str):
    if x is None:
        raise ValueError(f"ISO-BMFF structure missing {what}")
    return x


def _parse_track(b: bytes, s: int, e: int) -> dict:
    tk = _child(b, s, e, b"tkhd")
    if tk is None:
        raise ValueError("trak without tkhd")
    v, _, p = _fullbox(b, tk[0])
    if v == 1:
        track_id = int.from_bytes(b[p + 16: p + 20], "big")
        p_end = p + 32
    else:
        track_id = int.from_bytes(b[p + 8: p + 12], "big")
        p_end = p + 20
    # reserved(8) layer(2) alt(2) volume(2) reserved(2) matrix(36)
    wh = p_end + 8 + 2 + 2 + 2 + 2 + 36
    width = int.from_bytes(b[wh: wh + 4], "big") >> 16
    height = int.from_bytes(b[wh + 4: wh + 8], "big") >> 16

    md = _child(b, s, e, b"mdia")
    if md is None:
        raise ValueError("trak without mdia")
    mh = _need(_child(b, md[0], md[1], b"mdhd"), "mdhd")
    v, _, p = _fullbox(b, mh[0])
    if v == 1:
        timescale = int.from_bytes(b[p + 16: p + 20], "big")
        duration = int.from_bytes(b[p + 20: p + 28], "big")
    else:
        timescale = int.from_bytes(b[p + 8: p + 12], "big")
        duration = int.from_bytes(b[p + 12: p + 16], "big")
    hd = _need(_child(b, md[0], md[1], b"hdlr"), "hdlr")
    _, _, p = _fullbox(b, hd[0])
    handler = b[p + 4: p + 8].decode("ascii", "replace")

    mi = _need(_child(b, md[0], md[1], b"minf"), "minf")
    st = _need(_child(b, mi[0], mi[1], b"stbl"), "stbl")
    sd = _need(_child(b, st[0], st[1], b"stsd"), "stsd")
    _, _, p = _fullbox(b, sd[0])
    codec = None
    channels = sample_rate = None
    if int.from_bytes(b[p: p + 4], "big") > 0:
        entry_s = p + 4
        codec = b[entry_s + 4: entry_s + 8].decode("ascii", "replace")
        if handler == "soun":
            # AudioSampleEntry: reserved(6) dri(2) reserved(8)
            # channelcount(2) samplesize(2) predef(2) reserved(2)
            # samplerate(4, 16.16)
            q = entry_s + 8 + 6 + 2 + 8
            channels = int.from_bytes(b[q: q + 2], "big")
            # channelcount(2) samplesize(2) pre_defined(2) reserved(2)
            sample_rate = int.from_bytes(b[q + 8: q + 12], "big") >> 16

    n_samples, stts_dur = _read_stts(
        b, *_need(_child(b, st[0], st[1], b"stts"), "stts"))
    ss = _child(b, st[0], st[1], b"stss")
    sync = _read_stss(b, *ss) if ss else None
    sizes = _read_stsz(b, *_need(_child(b, st[0], st[1], b"stsz"),
                                 "stsz"))
    runs = _read_stsc(b, *_need(_child(b, st[0], st[1], b"stsc"),
                                "stsc"))
    co = _child(b, st[0], st[1], b"stco")
    wide = False
    if co is None:
        co = _child(b, st[0], st[1], b"co64")
        wide = True
    if co is None:
        raise ValueError("stbl without stco/co64")
    chunk_offsets = _read_stco(b, *co, wide)
    if len(sizes) != n_samples:
        raise ValueError("stsz count differs from stts sample count")
    return {
        "track_id": track_id,
        "handler": handler,
        "codec": codec,
        "timescale": timescale,
        "duration": duration,
        "duration_us": duration * 1_000_000 // timescale if timescale
        else None,
        "stts_duration": stts_dur,
        "width": width,
        "height": height,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "n_keyframes": len(sync) if sync is not None else n_samples,
        "sync_samples": sync,
        "sizes": sizes,
        "stsc_runs": runs,
        "chunk_offsets": chunk_offsets,
        "n_chunks": len(chunk_offsets),
    }


def parse_mp4_metadata(payload: bytes) -> dict:
    """Parse ISO-BMFF container metadata: brand, movie timescale and
    duration, and per-track handler/codec/resolution/sample counts.

    Raises ValueError on structural problems (truncated boxes, missing
    ftyp/moov/mvhd, inconsistent sample tables)."""
    b = bytes(payload)
    ft = _child(b, 0, len(b), b"ftyp")
    if ft is None:
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    brand = b[ft[0]: ft[0] + 4].decode("ascii", "replace")
    mv = _child(b, 0, len(b), b"moov")
    if mv is None:
        raise ValueError("ISO-BMFF payload without a moov box")
    mh = _child(b, mv[0], mv[1], b"mvhd")
    if mh is None:
        raise ValueError("moov without mvhd")
    v, _, p = _fullbox(b, mh[0])
    if v == 1:
        timescale = int.from_bytes(b[p + 16: p + 20], "big")
        duration = int.from_bytes(b[p + 20: p + 28], "big")
    else:
        timescale = int.from_bytes(b[p + 8: p + 12], "big")
        duration = int.from_bytes(b[p + 12: p + 16], "big")
    tracks = [
        _parse_track(b, s, e)
        for t, s, e in _walk_boxes(b, mv[0], mv[1])
        if t == b"trak"
    ]
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_us": duration * 1_000_000 // timescale if timescale
        else None,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def keyframe_index(payload: bytes, handler: str = "vide"):
    """Exact keyframe byte index for each track of the given handler:
    a list (per matching track) of (sample_number 1-based, file_offset,
    size) triples — what a distributed frame sampler range-reads.

    A track without an stss box treats EVERY sample as sync
    (ISO 14496-12 §8.6.2)."""
    meta = parse_mp4_metadata(payload)
    out = []
    for tr in meta["tracks"]:
        if tr["handler"] != handler:
            continue
        offsets = _sample_layout(tr["sizes"], tr["stsc_runs"],
                                 tr["chunk_offsets"])
        sync = tr["sync_samples"]
        nums = sync if sync is not None else range(1, tr["n_samples"] + 1)
        n_samples = tr["n_samples"]
        for n in nums:
            if not 1 <= n <= n_samples:
                raise ValueError(
                    f"stss sample number {n} outside 1..{n_samples}"
                )
        out.append([
            (n, offsets[n - 1], tr["sizes"][n - 1]) for n in nums
        ])
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def build_mp4(
    video_sizes: list[int],
    keyframe_every: int = 3,
    samples_per_chunk: int = 4,
    width: int = 64,
    height: int = 48,
    video_timescale: int = 600,
    video_delta: int = 100,
    audio: dict | None = None,
    movie_timescale: int = 1000,
    seed: int = 0,
) -> bytes:
    """Build a spec-shaped MP4 for the metadata walker (NOT a playable
    encode: mdat holds deterministic filler). ``audio``, if given, is
    ``{"n": int, "rate": int, "channels": int, "size": int}`` and adds
    an all-sync mp4a track whose chunks follow the video bytes."""
    nv = len(video_sizes)
    v_dur = nv * video_delta
    movie_dur = v_dur * movie_timescale // video_timescale
    a_sizes = []
    if audio:
        a_sizes = [audio["size"]] * audio["n"]
        a_dur = audio["n"] * 256
        movie_dur = max(movie_dur,
                        a_dur * movie_timescale // audio["rate"])

    def chunked(sizes, spc):
        return [sizes[i: i + spc] for i in range(0, len(sizes), spc)]

    v_chunks = chunked(video_sizes, samples_per_chunk)
    a_chunks = chunked(a_sizes, 6)

    def stbl(codec_entry, sizes, spc, sync, chunk_offs):
        stsd = _full(b"stsd", 0, 0, (1).to_bytes(4, "big") + codec_entry)
        stts = _full(b"stts", 0, 0,
                     (1).to_bytes(4, "big")
                     + struct.pack(">II", len(sizes),
                                   video_delta if sync is not None else 256))
        boxes = [stsd, stts]
        if sync is not None:
            boxes.append(_full(
                b"stss", 0, 0,
                len(sync).to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sync)))
        boxes.append(_full(
            b"stsc", 0, 0,
            (1).to_bytes(4, "big") + struct.pack(">III", 1, spc, 1)))
        boxes.append(_full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(s.to_bytes(4, "big") for s in sizes)))
        boxes.append(_full(
            b"stco", 0, 0,
            len(chunk_offs).to_bytes(4, "big")
            + b"".join(o.to_bytes(4, "big") for o in chunk_offs)))
        return _box(b"stbl", b"".join(boxes))

    visual_entry = (
        (86).to_bytes(4, "big") + b"avc1" + bytes(6)
        + (1).to_bytes(2, "big") + bytes(16)
        + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        + (0x480000).to_bytes(4, "big") * 2 + bytes(4)
        + (1).to_bytes(2, "big") + bytes(32)
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
    )
    audio_entry = b""
    if audio:
        audio_entry = (
            (36).to_bytes(4, "big") + b"mp4a" + bytes(6)
            + (1).to_bytes(2, "big") + bytes(8)
            + audio["channels"].to_bytes(2, "big")
            + (16).to_bytes(2, "big") + bytes(4)
            + (audio["rate"] << 16).to_bytes(4, "big")
        )

    def tkhd(track_id, dur, w, h, volume):
        return _full(
            b"tkhd", 0, 7,
            bytes(8) + track_id.to_bytes(4, "big") + bytes(4)
            + dur.to_bytes(4, "big") + bytes(8)
            + bytes(2) + bytes(2) + volume.to_bytes(2, "big") + bytes(2)
            + b"\x00\x01\x00\x00" + bytes(12)
            + b"\x00\x01\x00\x00" + bytes(12) + b"\x40\x00\x00\x00"
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"))

    def mdhd(timescale, dur):
        return _full(b"mdhd", 0, 0,
                     bytes(8) + timescale.to_bytes(4, "big")
                     + dur.to_bytes(4, "big") + b"\x55\xc4" + bytes(2))

    def hdlr(handler, name):
        return _full(b"hdlr", 0, 0,
                     bytes(4) + handler + bytes(12) + name + b"\x00")

    dinf = _box(b"dinf", _full(
        b"dref", 0, 0,
        (1).to_bytes(4, "big") + _full(b"url ", 0, 1, b"")))

    sync = [f + 1 for f in range(nv) if f % keyframe_every == 0]

    # mdat layout: header(8) + video chunks + audio chunks; stco needs
    # absolute offsets, so moov size must be known first — build moov
    # with placeholder offsets, then rebuild with real ones (size is
    # unaffected because counts don't change).
    def build_moov(v_offs, a_offs):
        v_stbl = stbl(visual_entry, video_sizes,
                      samples_per_chunk, sync, v_offs)
        v_minf = _box(b"minf", _full(b"vmhd", 0, 1, bytes(8)) + dinf
                      + v_stbl)
        v_mdia = _box(b"mdia", mdhd(video_timescale, v_dur)
                      + hdlr(b"vide", b"VideoHandler") + v_minf)
        v_trak = _box(b"trak", tkhd(1, movie_dur, width, height, 0)
                      + v_mdia)
        traks = v_trak
        if audio:
            a_stbl = stbl(audio_entry, a_sizes, 6, None, a_offs)
            a_minf = _box(b"minf", _full(b"smhd", 0, 0, bytes(4)) + dinf
                          + a_stbl)
            a_mdia = _box(b"mdia", mdhd(audio["rate"], audio["n"] * 256)
                          + hdlr(b"soun", b"SoundHandler") + a_minf)
            traks += _box(b"trak", tkhd(2, movie_dur, 0, 0, 0x0100)
                          + a_mdia)
        mvhd = _full(
            b"mvhd", 0, 0,
            bytes(8) + movie_timescale.to_bytes(4, "big")
            + movie_dur.to_bytes(4, "big") + b"\x00\x01\x00\x00"
            + b"\x01\x00" + bytes(10)
            + b"\x00\x01\x00\x00" + bytes(12)
            + b"\x00\x01\x00\x00" + bytes(12) + b"\x40\x00\x00\x00" + bytes(24)
            + (3 if audio else 2).to_bytes(4, "big"))
        return _box(b"moov", mvhd + traks)

    ftyp = _box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big")
                + b"isommp42")
    placeholder = build_moov([0] * len(v_chunks), [0] * len(a_chunks))
    mdat_data = len(ftyp) + len(placeholder) + 8
    v_offs, pos = [], mdat_data
    for ch in v_chunks:
        v_offs.append(pos)
        pos += sum(ch)
    a_offs = []
    for ch in a_chunks:
        a_offs.append(pos)
        pos += sum(ch)
    moov = build_moov(v_offs, a_offs)
    assert len(moov) == len(placeholder)
    total = sum(video_sizes) + sum(a_sizes)
    filler = bytes((seed * 37 + j) % 251 for j in range(total))
    return ftyp + moov + _box(b"mdat", filler)


# --------------------------------------------------------- HEIF / AVIF

_HEIF_CODECS = {b"heic": "hevc", b"heix": "hevc", b"hevs": "hevc",
                b"avif": "av1", b"avis": "av1"}
_HEIF_BRANDS = frozenset(
    [b"heic", b"heix", b"hevs", b"mif1", b"msf1", b"avif", b"avis"]
)


def is_heif_brand(payload: bytes) -> bool:
    """True when an ISO-BMFF payload's major brand is a HEIF/AVIF image
    (so the probe routes it to :func:`parse_heif_metadata` instead of
    the movie walker — these files carry meta/ipco, not moov)."""
    return payload[4:8] == b"ftyp" and payload[8:12] in _HEIF_BRANDS


def parse_heif_metadata(payload: bytes) -> dict:
    """HEIF/AVIF image metadata from the ISO-BMFF item structure
    (ISO/IEC 23008-12): ftyp brand -> codec family, meta/iprp/ipco
    'ispe' properties -> dimensions. The PRIMARY item's ispe is chosen
    via pitm + ipma association when present (thumbnails carry their
    own smaller ispe), else the largest-area ispe. HEVC/AV1 intra
    decode stays a declared refusal in ``decode_media``."""
    b = bytes(payload)
    ft = _child(b, 0, len(b), b"ftyp")
    if ft is None or b[ft[0]: ft[0] + 4] not in _HEIF_BRANDS:
        raise ValueError("not a HEIF/AVIF payload (ftyp brand)")
    major = b[ft[0]: ft[0] + 4]
    compat = [b[p: p + 4] for p in range(ft[0] + 8, ft[1], 4)]
    codec = _HEIF_CODECS.get(major)
    if codec is None:
        for br in compat:
            if br in _HEIF_CODECS:
                codec = _HEIF_CODECS[br]
                break
    mt = _child(b, 0, len(b), b"meta")
    if mt is None:
        raise ValueError("HEIF payload without a meta box")
    _, _, p = _fullbox(b, mt[0])      # meta is a FullBox
    ip = _child(b, p, mt[1], b"iprp")
    if ip is None:
        raise ValueError("HEIF meta without iprp")
    co = _child(b, ip[0], ip[1], b"ipco")
    if co is None:
        raise ValueError("HEIF iprp without ipco")
    props = list(_walk_boxes(b, co[0], co[1]))   # 1-based property ids
    ispes = {}
    for idx, (t, s, e) in enumerate(props, start=1):
        if t == b"ispe":
            _, _, q = _fullbox(b, s)
            if q + 8 > e:
                raise ValueError("HEIF ispe truncated")
            ispes[idx] = (int.from_bytes(b[q: q + 4], "big"),
                          int.from_bytes(b[q + 4: q + 8], "big"))
    if not ispes:
        raise ValueError("HEIF ipco has no ispe property")
    width = height = None
    pit = _child(b, p, mt[1], b"pitm")
    ipma = _child(b, ip[0], ip[1], b"ipma")
    if pit is not None and ipma is not None:
        v, _, q = _fullbox(b, pit[0])
        primary = int.from_bytes(b[q: q + (2 if v == 0 else 4)], "big")
        v, flags, q = _fullbox(b, ipma[0])
        n = int.from_bytes(b[q: q + 4], "big")
        if n > (ipma[1] - q):
            raise ValueError("HEIF ipma entry count exceeds its box")
        q += 4
        box_end = ipma[1]
        for _ in range(n):
            iid_len = 2 if v == 0 else 4
            if q + iid_len + 1 > box_end:
                raise ValueError("HEIF ipma entry truncated")
            iid = int.from_bytes(b[q: q + iid_len], "big")
            q += iid_len
            assoc_n = b[q]
            q += 1
            for _ in range(assoc_n):
                step = 2 if flags & 1 else 1
                if q + step > box_end:
                    raise ValueError("HEIF ipma association truncated")
                if flags & 1:
                    prop = int.from_bytes(b[q: q + 2], "big") & 0x7FFF
                    q += 2
                else:
                    prop = b[q] & 0x7F
                    q += 1
                if iid == primary and prop in ispes:
                    width, height = ispes[prop]
    if width is None:
        width, height = max(ispes.values(), key=lambda wh: wh[0] * wh[1])
    return {
        "brand": major.decode("ascii", "replace"),
        "codec": codec,
        "width": width,
        "height": height,
        "n_ispe": len(ispes),
        "animated": major in (b"avis", b"hevs", b"msf1"),
    }


def build_heif(brand: str = "heic", width: int = 64, height: int = 48,
               thumb: tuple[int, int] | None = None) -> bytes:
    """Spec-shaped HEIF/AVIF fixture for the metadata walker: ftyp +
    meta{hdlr, pitm, iprp{ipco{ispe...}, ipma}} — NO coded image data
    (the walker never reads item payloads)."""
    bb = brand.encode("ascii")
    ftyp = _box(b"ftyp", bb + (0).to_bytes(4, "big") + bb + b"mif1")
    hdlr = _full(b"hdlr", 0, 0,
                 (0).to_bytes(4, "big") + b"pict" + bytes(12) + b"\x00")
    pitm = _full(b"pitm", 0, 0, (1).to_bytes(2, "big"))
    ispe_main = _full(b"ispe", 0, 0,
                      width.to_bytes(4, "big") + height.to_bytes(4, "big"))
    props = [ispe_main]
    if thumb:
        props.append(_full(
            b"ispe", 0, 0,
            thumb[0].to_bytes(4, "big") + thumb[1].to_bytes(4, "big")))
    ipco = _box(b"ipco", b"".join(props))
    # item 1 (primary) -> property 1; item 2 (thumb) -> property 2
    entries = (1).to_bytes(2, "big") + bytes([1, 1])
    n = 1
    if thumb:
        entries += (2).to_bytes(2, "big") + bytes([1, 2])
        n = 2
    ipma = _full(b"ipma", 0, 0, n.to_bytes(4, "big") + entries)
    iprp = _box(b"iprp", ipco + ipma)
    meta = _full(b"meta", 0, 0, hdlr + pitm + iprp)
    return ftyp + meta
