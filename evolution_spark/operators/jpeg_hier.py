"""Hierarchical JPEG (ITU-T T.81 §13 / Annex J: DHP, EXP, differential
frames SOF5/SOF7).

A hierarchical stream is a PYRAMID: a DHP segment declares the full-size
frame geometry, a first NON-differential frame codes the coarsest level
(any supported mode — SOF0 sequential or SOF3 lossless here), and each
following DIFFERENTIAL frame refines it: an optional EXP segment doubles
the reference horizontally/vertically (the Annex J interpolation filter:
even outputs copy, odd outputs average the two neighbors with rounding,
edge replicated), then the frame codes target - reference. Supported
differential modes: SOF5 (differential sequential DCT, Huffman — DC
coded with ZERO prediction and NO level shift, IDCT output added to the
reference) and SOF7 (differential lossless — per-sample differences,
zero prediction, modulo-2^16). A final SOF7 frame makes the whole
pyramid EXACT, which is the encoder fixture strategy: losslessness
again gives the strongest oracle (decode(encode(x)) == x on noise).

Color frames follow the repo-wide JPEG convention: 3 components are
JFIF YCbCr (the encoder forward-transforms, the decoder inverts), so a
color pyramid is exact only up to the color transform; grayscale
pyramids are bit-exact end-to-end.

Conformance note: no foreign hierarchical JPEG was available in this
container (the mode is essentially extinct in the wild); the frame
orchestration, differential semantics and interpolation filter follow
the spec text, validated by round-trip and by the spec-required
property that a lossless-final pyramid reproduces the input exactly.

Remaining JPEG refusals after this module: the differential-
progressive / differential-arithmetic variants (SOF6/13/14/15), which
no known encoder ever emitted. SOF11 (arithmetic lossless) was lifted
in round 12 by ``jpeg_lossless_arith.py``, carrying a provenance note
on the 2-D conditioning layout in place of round 11's refusal.

Ref parity: the reference has no image codecs (extension surface)."""

from __future__ import annotations

import numpy as np

_DIFF_HUFF = (0xC5,)      # differential sequential DCT (Huffman)
_DIFF_LOSSLESS = (0xC7,)  # differential lossless (Huffman)
_NONDIFF = (0xC0, 0xC1, 0xC3)


def _upsample_1d(arr: np.ndarray, axis: int) -> np.ndarray:
    """Annex J interpolation: out[2i] = in[i], out[2i+1] =
    (in[i] + in[i+1] + 1) >> 1 with the last neighbor replicated."""
    a = np.asarray(arr, dtype=np.int64)
    a = np.moveaxis(a, axis, 0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    odd = (a + nxt + 1) >> 1
    out = np.empty((a.shape[0] * 2,) + a.shape[1:], dtype=np.int64)
    out[0::2] = a
    out[1::2] = odd
    return np.moveaxis(out, 0, axis)


def expand_reference(ref: np.ndarray, horiz: bool, vert: bool) -> np.ndarray:
    out = ref
    if horiz:
        out = _upsample_1d(out, 1)
    if vert:
        out = _upsample_1d(out, 0)
    return out


def _segment_frames(payload: bytes):
    """Split a hierarchical stream into (dhp, [frame dicts]) where each
    frame carries its SOF marker/body, accumulated tables, optional EXP
    flags, scan header and entropy bytes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    dhp = None
    frames = []
    cur = None
    pending_exp = None
    tables = {"dqt": {}, "dht": {}, "dri": 0}
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        size = int.from_bytes(payload[pos + 2: pos + 4], "big")
        body = payload[pos + 4: pos + 2 + size]
        pos += 2 + size
        if marker == 0xDE:  # DHP: frame-level geometry
            dhp = body
        elif marker == 0xDF:  # EXP: expand reference before next frame
            pending_exp = (body[0] >> 4, body[0] & 0xF)
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                n = 64 if pq == 0 else 128
                tables["dqt"][tq] = (pq, body[i:i + n])
                i += n
        elif marker == 0xC4:  # DHT
            from evolution_spark.operators.multimodal import _parse_dht

            _parse_dht(body, tables["dht"])
        elif marker == 0xDD:
            tables["dri"] = int.from_bytes(body[0:2], "big")
        elif marker in _NONDIFF + _DIFF_HUFF + _DIFF_LOSSLESS:
            cur = {
                "sof": marker, "body": body, "exp": pending_exp,
                "dqt": dict(tables["dqt"]), "dht": dict(tables["dht"]),
                "dri": tables["dri"], "scans": [],
            }
            pending_exp = None
            frames.append(cur)
        elif marker in (0xC2, 0xC6, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"hierarchical frame mode SOF{marker - 0xC0} is not "
                "supported — non-differential SOF0/SOF1/SOF3 first "
                "frames and differential SOF5/SOF7 refinements only"
            )
        elif marker == 0xDA:  # SOS
            if cur is None:
                raise ValueError("SOS before any frame header")
            # tables may legally arrive between SOF and SOS — refresh
            # the frame's snapshot at scan time
            cur["dqt"] = dict(tables["dqt"])
            cur["dht"] = dict(tables["dht"])
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss = body[1 + 2 * ns]
            al = body[3 + 2 * ns] & 0xF
            i = pos
            while i + 1 < len(payload):
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,) \
                        and not (0xD0 <= payload[i + 1] <= 0xD7):
                    break
                i += 1
            cur["scans"].append((scan, ss, al, payload[pos:i]))
            cur["dri_scan"] = tables["dri"]
            pos = i
        # APPn/COM skipped
    if dhp is None:
        raise ValueError("hierarchical payload missing DHP")
    if not frames:
        raise ValueError("hierarchical payload has no frames")
    return dhp, frames


def _split_intervals(entropy: bytes) -> list[bytes]:
    from evolution_spark.operators.multimodal import _split_restart_intervals

    return _split_restart_intervals(entropy)


def _frame_comps(body: bytes):
    precision = body[0]
    height = int.from_bytes(body[1:3], "big")
    width = int.from_bytes(body[3:5], "big")
    ncomp = body[5]
    comps = []
    for c in range(ncomp):
        cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
        comps.append((cid, hv >> 4, hv & 0xF, tq))
    return precision, height, width, comps


def _decode_dct_frame(frame, differential: bool):
    """Sequential-DCT frame decode to per-component FLOAT planes
    (no color transform, no clipping). Differential frames code DC with
    ZERO prediction and no level shift; non-differential frames are the
    baseline semantics."""
    from evolution_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _JpegBitReader,
        _jpeg_decode_symbol,
        _jpeg_dct_matrix,
        _jpeg_extend,
    )

    precision, height, width, comps = _frame_comps(frame["body"])
    if precision != 8:
        raise ValueError(f"unsupported precision {precision} (8-bit only)")
    if len(frame["scans"]) != 1:
        raise ValueError(
            "hierarchical DCT frames must carry one interleaved scan"
        )
    scan, _ss, _al, entropy = frame["scans"][0]
    if len(scan) != len(comps):
        raise ValueError("non-interleaved hierarchical DCT scan")
    qts = {}
    for tq, (pq, raw) in frame["dqt"].items():
        vals = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            if pq == 0
            else np.frombuffer(raw, dtype=">u2").astype(np.int64)
        )
        qt = np.zeros(64, dtype=np.int64)
        qt[_JPEG_ZIGZAG] = vals
        qts[tq] = qt.reshape(8, 8)
    huff = frame["dht"]
    restart = frame.get("dri_scan", 0)
    intervals = _split_intervals(entropy)

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    dct = _jpeg_dct_matrix()
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros(
            (mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64
        )
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}

    interval_idx = 0
    br = _JpegBitReader(intervals[0])
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    shift = 0.0 if differential else 128.0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "hierarchical entropy stream ends early"
                    )
                br = _JpegBitReader(intervals[interval_idx])
                pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cs, td, ta in scan:
                ch, cv, tq = by_id[cs]
                for v in range(cv):
                    for hh in range(ch):
                        s = _jpeg_decode_symbol(br, huff[(0, td)])
                        diff = (
                            _jpeg_extend(br.read_bits(s), s) if s else 0
                        )
                        zz = np.zeros(64, dtype=np.int64)
                        if differential:
                            zz[0] = diff  # T.81 13.3: no DC prediction
                        else:
                            pred[cs] += diff
                            zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_symbol(br, huff[(1, ta)])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "AC index overflow (corrupt scan)"
                                )
                            zz[k] = _jpeg_extend(br.read_bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_JPEG_ZIGZAG] = (
                            zz * qts[tq].ravel()[_JPEG_ZIGZAG]
                        )
                        block = dct.T @ coef.reshape(8, 8) @ dct
                        ys = (my * cv + v) * 8
                        xs = (mx * ch + hh) * 8
                        planes[cs][ys:ys + 8, xs:xs + 8] = block + shift
    out = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(
            np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1
        )
        out.append(p[:height, :width])
    return out, height, width


def _decode_lossless_frame(frame, differential: bool, refs=None):
    """SOF3/SOF7 frame to per-component int64 planes. Differential
    frames code target - reference directly (zero prediction, mod 2^16
    applied against the reference by the caller)."""
    from evolution_spark.operators.multimodal import (
        _JpegBitReader,
        _jpeg_decode_symbol,
        _jpeg_extend,
    )
    from evolution_spark.operators.jpeg_lossless import _predict

    precision, height, width, comps = _frame_comps(frame["body"])
    if precision != 8:
        # the hierarchical composition/clip path is 8-bit; mis-decoding
        # a 16-bit medical pyramid to clipped uint8 would be silent
        # corruption (review r11 pass 5)
        raise ValueError(
            f"unsupported hierarchical lossless precision {precision} "
            "(8-bit only; standalone SOF3 supports 16-bit)"
        )
    for _cid, ch, cv, _tq in comps:
        if (ch, cv) != (1, 1):
            raise ValueError(
                "subsampled lossless hierarchical components are not "
                "supported (1x1 only)"
            )
    if len(frame["scans"]) != 1:
        raise ValueError("hierarchical lossless frames need exactly "
                         "one scan")
    scan, sel, al, entropy = frame["scans"][0]
    if len(scan) != len(comps):
        raise ValueError("non-interleaved hierarchical lossless scan")
    huff = frame["dht"]
    restart = frame.get("dri_scan", 0)
    intervals = _split_intervals(entropy)
    planes = [
        np.zeros((height, width), dtype=np.int64) for _ in comps
    ]
    br = _JpegBitReader(intervals[0])
    interval_idx = 0
    fresh = [True] * len(comps)
    mcu = 0
    for y in range(height):
        for x in range(width):
            if restart and mcu and mcu % restart == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "hierarchical entropy stream ends early"
                    )
                br = _JpegBitReader(intervals[interval_idx])
                fresh = [True] * len(comps)
            mcu += 1
            for ci, (cs, td, _ta) in enumerate(scan):
                s = _jpeg_decode_symbol(br, huff[(0, td)])
                if s == 16:
                    diff = 32768
                elif s:
                    diff = _jpeg_extend(br.read_bits(s), s)
                else:
                    diff = 0
                if differential:
                    # zero prediction: the value IS the residual
                    planes[ci][y, x] = (
                        int(refs[ci][y, x]) + diff
                    ) & 0xFFFF
                else:
                    pred = _predict(
                        planes[ci], y, x, sel, precision, al, fresh[ci]
                    )
                    planes[ci][y, x] = (pred + diff) & 0xFFFF
                fresh[ci] = False
    if not differential and al:
        planes = [p << al for p in planes]
    return planes, height, width


def decode_jpeg_hierarchical(payload: bytes) -> np.ndarray:
    """Decode a hierarchical (DHP) JPEG: non-differential first frame
    (SOF0/SOF1 sequential or SOF3 lossless), then differential
    refinements (SOF5 DCT / SOF7 lossless), each optionally preceded by
    an EXP reference expansion. Returns the repo-wide JPEG contract:
    uint8 ``(h, w)`` gray or ``(h, w, 3)`` RGB (YCbCr inverted)."""
    dhp, frames = _segment_frames(payload)
    _p, out_h, out_w, dhp_comps = _frame_comps(dhp)
    refs = None  # per-component int64/float planes, full precision
    for fi, frame in enumerate(frames):
        sof = frame["sof"]
        differential = sof in _DIFF_HUFF + _DIFF_LOSSLESS
        if fi == 0 and differential:
            raise ValueError("first hierarchical frame must be "
                             "non-differential")
        if fi > 0 and not differential:
            raise ValueError("later hierarchical frames must be "
                             "differential")
        if frame["exp"] is not None:
            if refs is None:
                raise ValueError("EXP before any reference exists")
            eh, ev = frame["exp"]
            refs = [
                expand_reference(np.round(r).astype(np.int64),
                                 bool(eh), bool(ev))
                for r in refs
            ]
        if sof in (0xC0, 0xC1, 0xC5):
            planes, fh, fw = _decode_dct_frame(frame, differential)
            if differential:
                refs = [
                    r[:fh, :fw].astype(np.float64) + p
                    for r, p in zip(refs, planes)
                ]
            else:
                refs = planes
        else:  # SOF3 / SOF7
            if sof == 0xC7:
                iref = [
                    np.round(r).astype(np.int64) for r in refs
                ]
                planes, fh, fw = _decode_lossless_frame(
                    frame, True, refs=iref
                )
            else:
                planes, fh, fw = _decode_lossless_frame(frame, False)
            refs = [p.astype(np.float64) for p in planes]
    out = [np.clip(np.round(r), 0, 255)[:out_h, :out_w] for r in refs]
    if len(out) == 1:
        return out[0].astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


def _encode_lossless_frame_bytes(planes, differential, refs,
                                 sof_marker, predictor=1):
    """Huffman entropy + SOF/DHT/SOS segments for one lossless(-diff)
    frame over int64 planes."""
    from evolution_spark.operators.jpeg_lossless import (
        _LOSSLESS_BITS,
        _LOSSLESS_VALS,
        _predict,
    )
    from evolution_spark.operators.multimodal import (
        _JpegBitWriter,
        _jpeg_canonical_codes,
        _jpeg_magnitude,
    )

    h, w = planes[0].shape
    enc = _jpeg_canonical_codes(_LOSSLESS_BITS, _LOSSLESS_VALS)
    bw = _JpegBitWriter()
    fresh = [True] * len(planes)
    for y in range(h):
        for x in range(w):
            for ci, plane in enumerate(planes):
                if differential:
                    diff = int(plane[y, x]) - int(refs[ci][y, x])
                else:
                    pred = _predict(plane, y, x, predictor, 8, 0,
                                    fresh[ci])
                    diff = int(plane[y, x]) - pred
                fresh[ci] = False
                diff = ((diff + 32768) & 0xFFFF) - 32768
                if diff == -32768:  # the fold's only 16-bit extreme
                    code, ln = enc[16]
                    bw.write(code, ln)
                else:
                    s, bits = _jpeg_magnitude(diff)
                    code, ln = enc[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(bits, s)
    entropy = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray()
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for c in range(len(planes)):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(sof_marker, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_LOSSLESS_BITS)
               + bytes(_LOSSLESS_VALS))
    sos = bytes([len(planes)])
    for c in range(len(planes)):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0 if differential else predictor, 0, 0])
    out += seg(0xDA, sos)
    out += entropy
    return bytes(out)


def encode_jpeg_hierarchical(
    pixels: np.ndarray, levels: int = 2, quality: int = 50,
    dct_base: bool = True,
) -> bytes:
    """Encode a hierarchical pyramid: levels-1 downsamplings by 2 (2x2
    mean), coarsest level as the non-differential frame (SOF0 sequential
    DCT at ``quality`` when ``dct_base`` else SOF3 lossless), then per
    level an EXP doubling + a differential frame — SOF5 (DCT residual)
    for intermediate levels and SOF7 (lossless residual) for the FINAL
    level, which makes the whole pyramid reproduce the input EXACTLY
    (grayscale; color is exact up to the YCbCr transform)."""
    from evolution_spark.operators.multimodal import encode_jpeg

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [np.clip(np.round(c), 0, 255) for c in (y, cb, cr)]
    h, w = comps[0].shape
    if levels < 2:
        raise ValueError("hierarchical needs >= 2 levels")
    if h % (1 << (levels - 1)) or w % (1 << (levels - 1)):
        raise ValueError(
            f"dimensions must be divisible by 2^(levels-1)="
            f"{1 << (levels - 1)} (EXP doubles exactly)"
        )

    # pyramid: level 0 = coarsest
    pyramid = [comps]
    for _ in range(levels - 1):
        prev = pyramid[0]
        pyramid.insert(0, [
            c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2).mean((1, 3))
            for c in prev
        ])

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    dhp = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    dhp += bytes([len(comps)])
    for c in range(len(comps)):
        dhp += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xDE, dhp)

    base = [np.clip(np.round(c), 0, 255).astype(np.uint8)
            for c in pyramid[0]]
    if dct_base and not gray:
        # a color DCT base would re-apply the YCbCr transform the
        # pyramid already lives in — color pyramids use a lossless base
        dct_base = False
    if dct_base:
        # reuse the sequential encoder, then strip SOI/EOI/APP0 and
        # inline its SOF0..entropy segments as the first frame
        frame = encode_jpeg(base[0], quality=quality)
        out += _strip_wrapper(frame)
        # reference = what the DECODER reconstructs (lossy)
        refs, _fh, _fw = _decode_dct_frame(
            _segment_frames(bytes(out) + b"\xff\xd9")[1][0], False
        )
        refs = [np.round(r) for r in refs]
    else:
        first = _encode_lossless_frame_bytes(
            [b.astype(np.int64) for b in base], False, None, 0xC3
        )
        out += first
        refs = [b.astype(np.float64) for b in base]

    for li in range(1, levels):
        target = pyramid[li]
        out += seg(0xDF, bytes([0x11]))  # EXP: double both directions
        refs = [
            expand_reference(np.round(r).astype(np.int64), True, True)
            .astype(np.float64)
            for r in refs
        ]
        if li < levels - 1:
            # intermediate: DCT residual frame (SOF5)
            resid = [t - r for t, r in zip(target, refs)]
            frame_bytes, rec = _encode_dct_diff_frame(resid, quality)
            out += frame_bytes
            refs = [r + d for r, d in zip(refs, rec)]
        else:
            # final: lossless residual frame (SOF7) -> exact
            tgt_i = [np.round(t).astype(np.int64) for t in target]
            ref_i = [np.round(r).astype(np.int64) for r in refs]
            out += _encode_lossless_frame_bytes(
                tgt_i, True, ref_i, 0xC7
            )
            refs = [t.astype(np.float64) for t in tgt_i]
    out += b"\xff\xd9"
    return bytes(out)


def _strip_wrapper(frame: bytes) -> bytes:
    """Drop SOI/EOI and APP0 from a standalone sequential JPEG so its
    segments inline as a hierarchical frame."""
    pos = 2
    keep = bytearray()
    while pos + 2 <= len(frame):
        marker = frame[pos + 1]
        if marker == 0xD9:
            break
        size = int.from_bytes(frame[pos + 2: pos + 4], "big")
        end = pos + 2 + size
        if marker != 0xE0:
            keep += frame[pos:end]
        if marker == 0xDA:
            # entropy data follows until EOI
            keep += frame[end:-2]
            break
        pos = end
    return bytes(keep)


def _encode_dct_diff_frame(residuals, quality):
    """SOF5 differential sequential frame over float residual planes.
    Returns (frame bytes, per-plane RECONSTRUCTED residuals — what a
    decoder will add, so the encoder's reference tracks the decoder)."""
    from evolution_spark.operators.multimodal import (
        _JPEG_HT,
        _JPEG_QT_LUM,
        _JPEG_ZIGZAG,
        _JpegBitWriter,
        _jpeg_canonical_codes,
        _jpeg_dct_matrix,
        _jpeg_magnitude,
        _jpeg_scaled_qt,
    )

    h, w = residuals[0].shape
    if h % 8 or w % 8:
        # MCU-pad with ZERO residual (the decoder crops to frame dims)
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = []
        for r in residuals:
            p = np.zeros((ph, pw), dtype=r.dtype)
            p[:h, :w] = r
            padded.append(p)
        frame_bytes, rec = _encode_dct_diff_frame(padded, quality)
        # rewrite the SOF dims to the REAL frame size (scan geometry is
        # MCU-padded either way) and crop the reconstruction
        i = frame_bytes.find(b"\xff\xc5")
        body_at = i + 4
        fixed = bytearray(frame_bytes)
        fixed[body_at + 1: body_at + 3] = h.to_bytes(2, "big")
        fixed[body_at + 3: body_at + 5] = w.to_bytes(2, "big")
        return bytes(fixed), [r[:h, :w] for r in rec]
    qt = _jpeg_scaled_qt(_JPEG_QT_LUM, quality)
    dct = _jpeg_dct_matrix()
    enc_dc = _jpeg_canonical_codes(*_JPEG_HT[("dc", 0)])
    enc_ac = _jpeg_canonical_codes(*_JPEG_HT[("ac", 0)])
    bw = _JpegBitWriter()
    mcus_y, mcus_x = h // 8, w // 8
    recon = [np.zeros_like(r) for r in residuals]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, resid in enumerate(residuals):
                tile = resid[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                coef = dct @ tile @ dct.T  # NO level shift (differential)
                q = np.round(coef / qt).astype(np.int64)
                zz = q.ravel()[_JPEG_ZIGZAG]
                # DC: zero prediction in differential frames
                s, bits = _jpeg_magnitude(int(zz[0]))
                code, ln = enc_dc[s]
                bw.write(code, ln)
                if s:
                    bw.write(bits, s)
                run = 0
                last_nz = (
                    int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                )
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s, bits = _jpeg_magnitude(v)
                    code, ln = enc_ac[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[0x00]
                    bw.write(code, ln)
                # decoder-visible reconstruction of this block
                dq = np.zeros(64, dtype=np.float64)
                dq[_JPEG_ZIGZAG] = zz * qt.ravel()[_JPEG_ZIGZAG]
                recon[ci][my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = (
                    dct.T @ dq.reshape(8, 8) @ dct
                )
    entropy = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray()
    out += seg(0xDB, bytes([0]) + bytes(
        int(x) for x in qt.ravel()[_JPEG_ZIGZAG]
    ))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(residuals)])
    for c in range(len(residuals)):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC5, sof)
    for cls, t in (("dc", 0), ("ac", 0)):
        bits, vals = _JPEG_HT[(cls, t)]
        out += seg(0xC4, bytes([(0 if cls == "dc" else 0x10) | t])
                   + bytes(bits) + bytes(vals))
    sos = bytes([len(residuals)])
    for c in range(len(residuals)):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    return bytes(out), recon
