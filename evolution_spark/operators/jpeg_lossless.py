"""Lossless JPEG (ITU-T T.81 Annex H, SOF3 — Huffman predictive).

A different coding process from the DCT modes: no quantization, no DCT —
each sample is predicted from decoded neighbors (the 7 Annex H
predictors) and the difference is Huffman-coded with DC-style
magnitude categories (SSSS up to 16, where 16 codes 32768 with no extra
bits). The dominant real-world carrier is medical imagery (DICOM
transfer syntaxes 1.2.840.10008.1.2.4.57/.70), which uses 8- and 16-bit
single-component frames with selection value 1 — both covered.

Decoder contract: ``(h, w)`` for one component, ``(h, w, n)`` for
interleaved multi-component frames (lossless JPEG defines NO color
transform — components return as stored). dtype uint8 for P<=8 else
uint16. The matching encoder gives every path a hermetic round-trip
fixture; losslessness means decode(encode(x)) == x EXACTLY for
arbitrary input, the strongest oracle any codec here has.

Measured envelope (BASELINE v4.9): the sample-serial prediction +
Huffman loop runs ~200 ms per MB of decoded samples (49 ms at
512x512 gray) — a frame larger than ~0.5 MB decoded crosses
100 ms/payload; batch accordingly for large medical frames.

Prediction reset rule: the first sample of the scan and the first
sample after each RSTn use the default prediction 2^(P-Pt-1) (H.1.1);
all other samples follow the line rules (first line -> predictor 1,
first column -> predictor 2, else the scan's selection value).

Like the arithmetic module, the entropy loop is inherently sequential
(each prediction needs the previous decoded sample), so this is a
scalar-Python completeness path; DCT-mode JPEGs stay on the vectorized
decoders. Ref parity: the reference has no image codecs (extension
surface)."""

from __future__ import annotations

import numpy as np

# canonical DC-style Huffman table covering categories 0..16 (17 symbols
# of length 5; the all-ones length-5 code stays reserved per C.2)
_LOSSLESS_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LOSSLESS_VALS = list(range(17))


def _predict(plane, y, x, sel, p, pt, fresh):
    """Annex H.1.1: prediction for sample (y, x). ``fresh`` marks the
    first sample of the scan / restart interval."""
    if fresh:
        return 1 << (p - pt - 1)
    if y == 0:
        return int(plane[y, x - 1])  # first line: predictor 1
    if x == 0:
        return int(plane[y - 1, x])  # first column: predictor 2
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    c = int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor selection {sel}")


def decode_jpeg_lossless(payload: bytes) -> np.ndarray:
    """Decode an SOF3 lossless JPEG: one interleaved scan (all sampling
    factors 1x1) or a single-component scan; 2..16-bit precision; DRI
    restarts; point transform."""
    from evolution_spark.operators.multimodal import (
        _JpegBitReader,
        _jpeg_decode_symbol,
        _jpeg_extend,
        _parse_dht,
        _split_restart_intervals,
    )

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    precision = height = width = None
    restart_interval = 0
    scan = sel = pt = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        size = int.from_bytes(payload[pos + 2: pos + 4], "big")
        body = payload[pos + 4: pos + 2 + size]
        pos += 2 + size
        if marker == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif marker == 0xC3:  # SOF3
            precision = body[0]
            if not 2 <= precision <= 16:
                raise ValueError(f"invalid lossless precision {precision}")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, _tq = body[6 + 3 * c: 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled lossless components are not supported "
                        "(all sampling factors must be 1x1)"
                    )
                comps.append(cid)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4))
            sel = body[1 + 2 * ns]       # Ss = predictor selection
            pt = body[3 + 2 * ns] & 0xF  # Al = point transform
            i = pos
            while i + 1 < len(payload):
                if payload[i] == 0xFF and payload[i + 1] not in (0x00,) \
                        and not (0xD0 <= payload[i + 1] <= 0xD7):
                    break
                i += 1
            entropy = payload[pos:i]
            pos = i
            break
    if comps is None or scan is None:
        raise ValueError("JPEG payload missing SOF3/SOS")
    if len(scan) != len(comps):
        raise ValueError(
            "non-interleaved multi-scan lossless JPEG is not supported — "
            "single scan only"
        )
    if not 1 <= sel <= 7:
        raise ValueError(f"invalid lossless predictor selection {sel}")
    if not 0 <= pt < precision:
        raise ValueError(
            f"invalid point transform Pt={pt} for precision {precision}"
        )

    # split restart intervals (stuffing removed, like the DCT decoders)
    intervals = _split_restart_intervals(entropy)

    planes = {
        cs: np.zeros((height, width), dtype=np.int64) for cs, _ in scan
    }
    br = _JpegBitReader(intervals[0])
    interval_idx = 0
    fresh = {cs: True for cs, _ in scan}
    mcu = 0
    for y in range(height):
        for x in range(width):
            if restart_interval and mcu and mcu % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "lossless entropy stream ends before all samples"
                    )
                br = _JpegBitReader(intervals[interval_idx])
                fresh = {cs: True for cs, _ in scan}
            mcu += 1
            for cs, td in scan:
                s = _jpeg_decode_symbol(br, huff[(0, td)])
                if s == 16:  # H.1.2.2: codes 32768 with no extra bits
                    diff = 32768
                elif s:
                    diff = _jpeg_extend(br.read_bits(s), s)
                else:
                    diff = 0
                pred = _predict(
                    planes[cs], y, x, sel, precision, pt, fresh[cs]
                )
                fresh[cs] = False
                planes[cs][y, x] = (pred + diff) & 0xFFFF
    dtype = np.uint8 if precision <= 8 else np.uint16
    out = [
        (planes[cs] << pt).astype(np.int64).astype(dtype) for cs, _ in scan
    ]
    if len(out) == 1:
        return out[0]
    return np.stack(out, axis=-1)


def encode_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
    precision: int | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w)`` or ``(h, w, n)`` integer samples as an SOF3
    lossless JPEG (interleaved single scan, 1x1 sampling). ``precision``
    defaults to 8 for uint8 input, 16 otherwise. ``point_transform``
    shifts samples right by Pt before coding (the decoder shifts back —
    lossy by design; Pt=0 is the lossless default)."""
    from evolution_spark.operators.multimodal import (
        _JpegBitWriter,
        _jpeg_canonical_codes,
        _jpeg_magnitude,
    )

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[..., None]
    h, w, ncomp = px.shape
    if precision is None:
        precision = 8 if px.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError(f"invalid lossless precision {precision}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid predictor {predictor}")
    pt = int(point_transform)
    if not 0 <= pt < precision:
        raise ValueError(
            f"invalid point transform Pt={pt} for precision {precision}"
        )
    planes = [
        (px[..., c].astype(np.int64) >> pt) for c in range(ncomp)
    ]

    enc = _jpeg_canonical_codes(_LOSSLESS_BITS, _LOSSLESS_VALS)
    parts: list[bytes] = []
    bw = _JpegBitWriter()
    fresh = [True] * ncomp
    mcu = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                parts.append(bw.flush())
                parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _JpegBitWriter()
                fresh = [True] * ncomp
            mcu += 1
            for c in range(ncomp):
                pred = _predict(
                    planes[c], y, x, predictor, precision, pt, fresh[c]
                )
                fresh[c] = False
                diff = int(planes[c][y, x]) - pred
                # modulo-2^16 representative with |diff| <= 32768
                diff = ((diff + 32768) & 0xFFFF) - 32768
                if diff == -32768:  # the fold's only 16-bit extreme
                    code, ln = enc[16]
                    bw.write(code, ln)  # category 16: no extra bits
                else:
                    s, bits = _jpeg_magnitude(diff)
                    code, ln = enc[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(bits, s)
    parts.append(bw.flush())
    entropy = b"".join(parts)

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(body) + 2).to_bytes(2, "big") + body
        )

    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC3, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_LOSSLESS_BITS) + bytes(_LOSSLESS_VALS),
    )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
