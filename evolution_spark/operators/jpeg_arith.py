"""Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder, Annex F models).

Closes the engine's LAST declared refusal: ``decode_jpeg`` previously
refused SOF9/SOF10 (arithmetic sequential/progressive) scans. Both now
decode, and ``encode_jpeg_arithmetic`` emits real SOF9 streams so every
decoder path has a hermetic round-trip fixture (the repo-wide codec test
strategy — same as the baseline/progressive Huffman pair).

Implementation provenance (public sources only):

- Interval arithmetic, conditional MPS/LPS exchange, renormalization,
  byte stuffing (0xFF always followed by 0x00 in entropy data) and the
  flush rule (largest number of trailing zero bits inside the final
  interval, trailing zero bytes dropped) follow ITU-T T.81 Annex D.
- The probability-estimation state machine is Table D.3 (113 adaptive
  states + the non-adaptive "fixed" 0.5 bin used for AC signs), as also
  reproduced in the public-domain IJG listing. No independent
  arithmetic-coded JPEG sample was available in this container to
  cross-validate byte-exactness against a foreign encoder; conformance
  is established by encoder/decoder round-trip at every quality tier,
  adaptive-state exercise tests, and structural checks.
- The binary-decision decomposition of DC differences and AC
  coefficients (zero/sign/log2-magnitude-category/magnitude-bits trees,
  DC context conditioning on the previous diff class with the L/U
  bounds, AC band conditioning with the Kx split) follows T.81 §F.1.4
  (encoder) / §F.2 (decoder) and the DAC-marker defaults (L=0, U=1,
  Kx=5).

The coder is inherently sequential (each binary decision updates the
adaptive state the next one reads), so this is a pure-Python hot loop by
necessity — fine at the scale it runs: arithmetic-coded JPEGs are
vanishingly rare in real corpora (patents kept every mainstream encoder
on Huffman), so this path exists for COMPLETENESS of the decode surface;
the common SOF0/SOF2 paths stay on the vectorized numpy decoders.

Ref parity: the reference has no image codecs at all — this whole module
exceeds it (SURVEY.md LLM-pipeline extension surface).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# T.81 Table D.3: Qe value, Next_Index_LPS, Next_Index_MPS, Switch_MPS.
# Index 113 is the non-adaptive fixed bin (Qe = 0x5A1D, never moves).
# --------------------------------------------------------------------------
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
)


class _QMDecoder:
    """T.81 D.2 arithmetic decoder over ONE entropy-coded interval
    (restart markers are split off by the caller, exactly like the
    Huffman decoders). State bins are bytearrays packing
    ``(mps << 7) | state_index``. Past the end of data (or a marker) the
    feeder supplies zero bits — the spec's convention; the final
    decisions of a scan legitimately read past the last real byte."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.ended = False
        self._cur = 0
        self._nbits = 0
        self.a = 0x10000
        c = 0
        for _ in range(16):
            c = (c << 1) | self._next_bit()
        self.c = c

    def _next_byte(self) -> int:
        if self.ended or self.pos >= len(self.data):
            self.ended = True
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            # swallow fill bytes; 0x00 = stuffed (data byte 0xFF),
            # anything else is a marker -> zero feed from here on
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            while nxt == 0xFF:
                self.pos += 1
                nxt = (
                    self.data[self.pos] if self.pos < len(self.data) else None
                )
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            self.ended = True
            return 0
        return b

    def _next_bit(self) -> int:
        if self._nbits == 0:
            self._cur = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._cur >> self._nbits) & 1

    def decode(self, bank: bytearray, i: int) -> int:
        sv = bank[i]
        mps = sv >> 7
        qe, nlps, nmps, sw = _QE[sv & 0x7F]
        a1 = self.a - qe
        if self.c < a1:
            if a1 & 0x8000:
                self.a = a1
                return mps
            # renormalizing MPS interval: conditional exchange
            if a1 < qe:
                d = 1 - mps
                if sw:
                    mps = d
                bank[i] = (mps << 7) | nlps
            else:
                d = mps
                bank[i] = (mps << 7) | nmps
            self.a = a1
        else:
            self.c -= a1
            if a1 < qe:
                d = mps
                bank[i] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if sw:
                    mps = d
                bank[i] = (mps << 7) | nlps
            self.a = qe
        a, c = self.a, self.c
        while a < 0x8000:
            a <<= 1
            c = (c << 1) | self._next_bit()
        self.a, self.c = a, c
        return d

    def decode_fixed(self) -> int:
        """The non-adaptive 0.5 bin (AC sign decisions)."""
        qe = 0x5A1D
        a1 = self.a - qe
        if self.c < a1:
            if a1 & 0x8000:
                self.a = a1
                return 0
            d = 1 if a1 < qe else 0
            self.a = a1
        else:
            self.c -= a1
            d = 0 if a1 < qe else 1
            self.a = qe
        a, c = self.a, self.c
        while a < 0x8000:
            a <<= 1
            c = (c << 1) | self._next_bit()
        self.a, self.c = a, c
        return d


class _QMEncoder:
    """T.81 D.1 arithmetic encoder. The interval base accumulates in a
    sliding integer window (``low``/``nbits``) with carries rippled into
    the already-flushed bytes — byte-identical to the spec's stacked-0xFF
    carry machinery, provably so because both compute the same infinite-
    precision base. Byte stuffing (0x00 after every 0xFF) is applied at
    flush."""

    def __init__(self):
        self.a = 0x10000
        self.low = 0
        self.nbits = 16
        self.out = bytearray()

    def _add(self, x: int) -> None:
        self.low += x
        if self.low >> self.nbits:
            self.low &= (1 << self.nbits) - 1
            self._carry()

    def _carry(self) -> None:
        # ripple +1 into the flushed bytes; terminates before the start
        # because the infinite-precision base stays below 1.0 (the
        # interval invariant base + a <= 2^total_bits)
        i = len(self.out) - 1
        while self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def _renorm(self) -> None:
        a, low, nbits = self.a, self.low, self.nbits
        out = self.out
        while a < 0x8000:
            a <<= 1
            low <<= 1
            nbits += 1
            if nbits >= 32:
                while nbits >= 24:
                    out.append((low >> (nbits - 8)) & 0xFF)
                    nbits -= 8
                low &= (1 << nbits) - 1
        self.a, self.low, self.nbits = a, low, nbits

    def encode(self, bank: bytearray, i: int, bit: int) -> None:
        sv = bank[i]
        mps = sv >> 7
        qe, nlps, nmps, sw = _QE[sv & 0x7F]
        a1 = self.a - qe
        if bit == mps:
            if a1 & 0x8000:
                self.a = a1
                return
            if a1 < qe:  # conditional exchange: MPS takes the top
                self._add(a1)
                self.a = qe
            else:
                self.a = a1
            bank[i] = (mps << 7) | nmps
        else:
            if a1 < qe:  # conditional exchange: LPS takes the bottom
                self.a = a1
            else:
                self._add(a1)
                self.a = qe
            if sw:
                mps = 1 - mps
            bank[i] = (mps << 7) | nlps
        self._renorm()

    def encode_fixed(self, bit: int) -> None:
        qe = 0x5A1D
        a1 = self.a - qe
        if bit == 0:
            if a1 & 0x8000:
                self.a = a1
                return
            if a1 < qe:
                self._add(a1)
                self.a = qe
            else:
                self.a = a1
        else:
            if a1 < qe:
                self.a = a1
            else:
                self._add(a1)
                self.a = qe
        self._renorm()

    def finish(self) -> bytes:
        # D.1.8: the in-interval value with the most trailing zero bits.
        # The chosen value can straddle a flushed-byte boundary (the
        # interval may span a carry) — ripple it like any other add.
        t = (self.low + self.a - 1) & ~0xFFFF
        if t < self.low:
            t += 0x8000
        self.low = t
        if self.low >> self.nbits:
            self.low &= (1 << self.nbits) - 1
            self._carry()
        pad = (8 - self.nbits % 8) % 8
        self.low <<= pad
        self.nbits += pad
        while self.nbits > 0:
            self.out.append((self.low >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.low &= (1 << max(self.nbits, 0)) - 1 if self.nbits else 0
        while self.out and self.out[-1] == 0:
            self.out.pop()
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


# --------------------------------------------------------------------------
# Statistical models (T.81 F.1.4 / F.2): binary-decision decomposition of
# DC differences and AC coefficients over adaptive state banks.
# DC bank: 64 bins per table (4 per conditioning context x 5 contexts,
# magnitude-category tree at 20, magnitude bits at category+14).
# AC bank: 256 bins per table (3 per band index, low/high category trees
# at 189/217 split on Kx, magnitude bits at category+14).
# --------------------------------------------------------------------------

_DC_TREE = 20
_AC_TREE_LO = 189
_AC_TREE_HI = 217


def _decode_dc_diff(dec, bank, ctx, lo, up):
    """One DC difference; returns (diff, new conditioning context)."""
    if dec.decode(bank, ctx) == 0:
        return 0, 0
    sign = dec.decode(bank, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(bank, st)
    if m:
        st = _DC_TREE
        while dec.decode(bank, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow (corrupt scan)")
            st += 1
    if m < ((1 << lo) >> 1):
        new_ctx = 0
    elif m > ((1 << up) >> 1):
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(bank, st):
            v |= m
    v += 1
    return (-v if sign else v), new_ctx


def _encode_dc_diff(enc, bank, ctx, diff, lo, up):
    """Mirror of :func:`_decode_dc_diff`; returns the new context."""
    if diff == 0:
        enc.encode(bank, ctx, 0)
        return 0
    enc.encode(bank, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(bank, ctx + 1, sign)
    st = ctx + 2 + sign
    v = abs(diff) - 1
    if v == 0:
        enc.encode(bank, st, 0)
        m = 0
    else:
        enc.encode(bank, st, 1)
        m = 1
        st = _DC_TREE
        while v >= (m << 1):
            enc.encode(bank, st, 1)
            m <<= 1
            st += 1
        enc.encode(bank, st, 0)
    if m < ((1 << lo) >> 1):
        new_ctx = 0
    elif m > ((1 << up) >> 1):
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(bank, st, 1 if v & mm else 0)
    return new_ctx


def _decode_ac_block(dec, bank, zz, ss, se, kx, shift=0):
    """AC coefficients ``ss..se`` of one block into ``zz`` (zigzag
    order), values scaled by ``1 << shift`` (progressive Al)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(bank, st):
            return  # EOB
        while dec.decode(bank, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC index overflow (corrupt scan)")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(bank, st)
        if m and dec.decode(bank, st):
            m = 2
            st = _AC_TREE_LO if k <= kx else _AC_TREE_HI
            while dec.decode(bank, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("AC magnitude overflow (corrupt scan)")
                st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(bank, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << shift
        k += 1


def _encode_ac_block(enc, bank, zz, ss, se, kx, shift=0):
    """Mirror of :func:`_decode_ac_block` (values pre-scaled: the caller
    passes coefficients already divided by ``1 << shift``)."""
    nz = [k for k in range(ss, se + 1) if zz[k]]
    last = nz[-1] if nz else ss - 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > last:
            enc.encode(bank, st, 1)  # EOB
            return
        enc.encode(bank, st, 0)
        while zz[k] == 0:
            enc.encode(bank, st + 1, 0)
            st += 3
            k += 1
        enc.encode(bank, st + 1, 1)
        val = int(zz[k])
        sign = 1 if val < 0 else 0
        enc.encode_fixed(sign)
        st += 2
        v = abs(val) - 1
        if v == 0:
            enc.encode(bank, st, 0)
            m = 0
        else:
            enc.encode(bank, st, 1)
            if v == 1:
                enc.encode(bank, st, 0)
                m = 1
            else:
                enc.encode(bank, st, 1)
                m = 2
                st = _AC_TREE_LO if k <= kx else _AC_TREE_HI
                while v >= (m << 1):
                    enc.encode(bank, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(bank, st, 0)
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(bank, st, 1 if v & mm else 0)
        k += 1


def _split_restart_intervals(entropy: bytes) -> list[bytes]:
    """Split on RSTn markers, stuffing left INTACT (the QM decoder's
    byte feeder strips it, matching the spec's BYTEIN) — the shared
    splitter with unstuff=False."""
    from evolution_spark.operators.multimodal import (
        _split_restart_intervals as _split,
    )

    return _split(entropy, unstuff=False)


def _parse_markers(payload: bytes):
    """Shared marker walk for SOF9/SOF10 payloads: returns (frame, scans)
    where frame carries geometry/tables/conditioning and scans the list
    of (scan header, entropy bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    from evolution_spark.operators.multimodal import _JPEG_ZIGZAG

    pos = 2
    qts: dict[int, np.ndarray] = {}
    comps = None
    height = width = None
    progressive = False
    restart_interval = 0
    # DAC conditioning defaults (T.81 F.1.4.4.1.4 / F.1.4.4.2.1)
    dc_cond = {t: (0, 1) for t in range(4)}
    ac_cond = {t: 5 for t in range(4)}
    scans = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[pos + 2: pos + 4], "big")
        body = payload[pos + 4: pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(
                        body[i:i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(
                        body[i:i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                qt = np.zeros(64, dtype=np.int64)
                qt[_JPEG_ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0xF
                cs = body[i + 1]
                i += 2
                if tc == 0:
                    lo, up = cs & 0xF, cs >> 4
                    if lo > up or up > 15:
                        raise ValueError(
                            f"invalid DAC DC conditioning L={lo} U={up}"
                        )
                    dc_cond[tb] = (lo, up)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"invalid DAC AC Kx={cs}")
                    ac_cond[tb] = cs
        elif marker in (0xC9, 0xCA):  # SOF9 / SOF10
            if body[0] != 8:
                raise ValueError(
                    f"unsupported JPEG precision {body[0]} (8-bit only)"
                )
            progressive = marker == 0xCA
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS + entropy data
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            i = pos
            while i + 1 < len(payload):
                if (
                    payload[i] == 0xFF
                    and payload[i + 1] != 0x00
                    and not (0xD0 <= payload[i + 1] <= 0xD7)
                ):
                    break
                i += 1
            # DRI/DAC are SNAPSHOTTED per scan (B.2.4.4: tables/misc
            # segments between scans redefine them for LATER scans only)
            scans.append((
                {"comps": scan, "ss": ss, "se": se, "ah": ah, "al": al,
                 "dri": restart_interval, "dc_cond": dict(dc_cond),
                 "ac_cond": dict(ac_cond)},
                payload[pos:i],
            ))
            pos = i
        # other markers (APPn, COM) skipped
    if comps is None or not scans:
        raise ValueError("JPEG payload missing SOF9/SOF10 or SOS")
    return {
        "height": height, "width": width, "comps": comps, "qts": qts,
        "progressive": progressive,
    }, scans


def decode_jpeg_arithmetic(payload: bytes) -> np.ndarray:
    """Decode an arithmetic-coded JPEG: SOF9 (sequential, one interleaved
    scan) and SOF10 (progressive: spectral selection + successive
    approximation, per-scan stats reset per G.1.2/T.81). Returns
    ``(h, w, 3)`` uint8 for color, ``(h, w)`` for grayscale — same
    contract as the Huffman decoders."""
    frame, scans = _parse_markers(payload)
    comps = frame["comps"]
    height, width = frame["height"], frame["width"]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    blocks_of = {}
    for cid, ch, cv, _ in comps:
        bw = mcus_x * ch
        bh = mcus_y * cv
        blocks_of[cid] = np.zeros((bh, bw, 64), dtype=np.int64)

    if frame["progressive"]:
        _decode_progressive_scans(frame, scans, blocks_of, by_id,
                                  mcus_x, mcus_y)
    else:
        if len(scans) != 1 or len(scans[0][0]["comps"]) != len(comps):
            raise ValueError(
                "non-interleaved multi-scan sequential JPEG is not "
                "supported — single interleaved scan only (same limit "
                "as the Huffman path)"
            )
        _decode_sequential_scan(frame, scans[0], blocks_of, by_id,
                                mcus_x, mcus_y)

    from evolution_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_dct_matrix,
    )

    dct = _jpeg_dct_matrix()
    planes = []
    for cid, ch, cv, tq in comps:
        blocks = blocks_of[cid]
        bh, bw = blocks.shape[:2]
        qt = frame["qts"][tq].ravel()[_JPEG_ZIGZAG]
        coefs = np.zeros((bh, bw, 64), dtype=np.float64)
        coefs[..., _JPEG_ZIGZAG] = blocks * qt
        coefs = coefs.reshape(bh, bw, 8, 8)
        # batch IDCT: (bh, bw, 8, 8) x dct both sides
        spat = np.einsum("ki,yxkl,lj->yxij", dct, coefs, dct) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_sequential_scan(frame, scan_pair, blocks_of, by_id,
                            mcus_x, mcus_y):
    hdr, entropy = scan_pair
    scan = hdr["comps"]
    if (hdr["ss"], hdr["se"], hdr["ah"], hdr["al"]) != (0, 63, 0, 0):
        raise ValueError("sequential scan must cover Ss=0..Se=63, Ah=Al=0")
    comps = frame["comps"]
    intervals = _split_restart_intervals(entropy)
    restart = hdr["dri"]
    dc_cond, ac_cond = hdr["dc_cond"], hdr["ac_cond"]

    def fresh():
        dc_banks = {td: bytearray(64) for _, td, _ in scan}
        ac_banks = {ta: bytearray(256) for _, _, ta in scan}
        dc_ctx = {cid: 0 for cid, *_ in comps}
        pred = {cid: 0 for cid, *_ in comps}
        return dc_banks, ac_banks, dc_ctx, pred

    interval_idx = 0
    dec = _QMDecoder(intervals[0])
    dc_banks, ac_banks, dc_ctx, pred = fresh()
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "JPEG entropy stream ends before all MCUs"
                    )
                dec = _QMDecoder(intervals[interval_idx])
                dc_banks, ac_banks, dc_ctx, pred = fresh()
            mcu_count += 1
            for cs, td, ta in scan:
                ch, cv, _ = by_id[cs]
                lo, up = dc_cond[td]
                kx = ac_cond[ta]
                for v in range(cv):
                    for hh in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        diff, dc_ctx[cs] = _decode_dc_diff(
                            dec, dc_banks[td], dc_ctx[cs], lo, up
                        )
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        _decode_ac_block(dec, ac_banks[ta], zz, 1, 63, kx)
                        blocks_of[cs][my * cv + v, mx * ch + hh] = zz


def _decode_progressive_scans(frame, scans, blocks_of, by_id,
                              mcus_x, mcus_y):
    """SOF10: each scan refines the coefficient planes (spectral
    selection + successive approximation). Statistics reset per scan and
    per restart interval (T.81 G.1.2 applies the Annex F models per
    scan)."""
    comps = frame["comps"]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    for hdr, entropy in scans:
        scan = hdr["comps"]
        ss, se, ah, al = hdr["ss"], hdr["se"], hdr["ah"], hdr["al"]
        restart = hdr["dri"]
        dc_cond, ac_cond = hdr["dc_cond"], hdr["ac_cond"]
        intervals = _split_restart_intervals(entropy)
        is_dc = ss == 0
        if is_dc and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        interleaved = len(scan) > 1
        if not is_dc and interleaved:
            raise ValueError("progressive AC scans must be single-component")

        # geometry: interleaved scans walk MCUs; single-component scans
        # walk that component's REAL block grid (T.81 A.2.2 — no MCU
        # padding)
        if interleaved:
            units_y, units_x = mcus_y, mcus_x
        else:
            cs0 = scan[0][0]
            ch0, cv0, _ = by_id[cs0]
            units_x = -(-(frame["width"] * ch0) // (8 * hmax))
            units_y = -(-(frame["height"] * cv0) // (8 * vmax))

        def fresh():
            dc_banks = {td: bytearray(64) for _, td, _ in scan}
            ac_banks = {ta: bytearray(256) for _, _, ta in scan}
            dc_ctx = {cid: 0 for cid, *_ in comps}
            pred = {cid: 0 for cid, *_ in comps}
            return dc_banks, ac_banks, dc_ctx, pred

        interval_idx = 0
        dec = _QMDecoder(intervals[0])
        dc_banks, ac_banks, dc_ctx, pred = fresh()
        unit = 0
        for uy in range(units_y):
            for ux in range(units_x):
                if restart and unit and unit % restart == 0:
                    interval_idx += 1
                    if interval_idx >= len(intervals):
                        raise ValueError(
                            "JPEG entropy stream ends before all units"
                        )
                    dec = _QMDecoder(intervals[interval_idx])
                    dc_banks, ac_banks, dc_ctx, pred = fresh()
                unit += 1
                for cs, td, ta in scan:
                    ch, cv, _ = by_id[cs]
                    if is_dc:
                        lo, up = dc_cond[td]
                        for v in range(cv if interleaved else 1):
                            for hh in range(ch if interleaved else 1):
                                by = uy * cv + v if interleaved else uy
                                bx = ux * ch + hh if interleaved else ux
                                blk = blocks_of[cs][by, bx]
                                if ah == 0:  # first DC scan
                                    diff, dc_ctx[cs] = _decode_dc_diff(
                                        dec, dc_banks[td], dc_ctx[cs],
                                        lo, up,
                                    )
                                    pred[cs] += diff
                                    blk[0] = pred[cs] << al
                                else:  # DC refinement: one fixed bit
                                    if dec.decode_fixed():
                                        blk[0] |= 1 << al
                    else:
                        blk = blocks_of[cs][uy, ux]
                        if ah == 0:  # AC first scan for this band
                            _decode_ac_block(
                                dec, ac_banks[ta], blk, ss, se,
                                ac_cond[ta], shift=al,
                            )
                        else:  # AC refinement
                            _decode_ac_refine(
                                dec, ac_banks[ta], blk, ss, se, al
                            )


def encode_jpeg_arithmetic_progressive(
    pixels: np.ndarray, quality: int = 50
) -> bytes:
    """SOF10 encoder (hermetic fixtures for every progressive-arithmetic
    decode path): libjpeg-style scan script — interleaved DC first
    (Al=1), per-component AC first 1..63 (Al=1), interleaved DC
    refinement (Ah=1, Al=0), per-component AC refinement (Ah=1, Al=0)."""
    from evolution_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_quantized_zigzag,
    )

    # the ONE shared front end (same coefficients as every encoder)
    coefs, qts, gray, h, w = _jpeg_quantized_zigzag(pixels, quality)
    ncomp = len(coefs)
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)

    scan_payloads = []

    # scan 1: interleaved DC first, Al=1 (point transform = arithmetic
    # shift of the signed DC value, T.81 G.1.2.1)
    enc = _QMEncoder()
    dc_banks = [bytearray(64) for _ in range(min(ncomp, 2))]
    dc_ctx = [0] * ncomp
    pred = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                v = int(coefs[ci][my, mx, 0]) >> 1
                diff = v - pred[ci]
                pred[ci] = v
                dc_ctx[ci] = _encode_dc_diff(
                    enc, dc_banks[t], dc_ctx[ci], diff, 0, 1
                )
    sos1 = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos1 += bytes([ci + 1, t << 4])
    scan_payloads.append((sos1 + bytes([0, 0, 0x01]), enc.finish()))

    # scans 2..: per-component AC first 1..63, Al=1
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        enc = _QMEncoder()
        bank = bytearray(256)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                zz = coefs[ci][my, mx]
                shifted = np.sign(zz) * (np.abs(zz) >> 1)
                _encode_ac_block(enc, bank, shifted, 1, 63, 5)
        sos = bytes([1, ci + 1, t]) + bytes([1, 63, 0x01])
        scan_payloads.append((sos, enc.finish()))

    # DC refinement: one fixed bit per block, Ah=1 Al=0
    enc = _QMEncoder()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                enc.encode_fixed(int(coefs[ci][my, mx, 0]) & 1)
    sos_dcr = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos_dcr += bytes([ci + 1, t << 4])
    scan_payloads.append((sos_dcr + bytes([0, 0, 0x10]), enc.finish()))

    # AC refinement per component, Ah=1 Al=0
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        enc = _QMEncoder()
        bank = bytearray(256)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                _encode_ac_refine(enc, bank, coefs[ci][my, mx], 1, 63, 0)
        sos = bytes([1, ci + 1, t]) + bytes([1, 63, 0x10])
        scan_payloads.append((sos, enc.finish()))

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(body) + 2).to_bytes(2, "big") + body
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        out += seg(
            0xDB,
            bytes([t]) + bytes(int(x) for x in qt.ravel()[_JPEG_ZIGZAG]),
        )
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xCA, sof)  # SOF10: arithmetic progressive
    dac = b""
    for t in range(min(ncomp, 2)):
        dac += bytes([t, 0x10])
        dac += bytes([0x10 | t, 5])
    out += seg(0xCC, dac)
    for sos, entropy in scan_payloads:
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _decode_ac_refine(dec, bank, zz, ss, se, al):
    """AC successive-approximation refinement (T.81 G.2 / Figure G.10
    model): the EOB decision is tested only past EOBx (the last index
    nonzero BEFORE this scan); already-nonzero coefficients take a
    correction bit (bin st+2), zero ones a newly-nonzero decision
    (bin st+1) with a fixed-bin sign."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(bank, st):
            return  # EOB
        while True:
            if zz[k]:
                if dec.decode(bank, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(bank, st + 1):
                zz[k] = m1 if dec.decode_fixed() else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refinement overrun (corrupt scan)")
        k += 1


def _encode_ac_refine(enc, bank, zz, ss, se, al):
    """Mirror of :func:`_decode_ac_refine` over FULL-precision
    coefficients ``zz``: history = magnitude beyond the current bit
    (``|v| >> (al+1)`` nonzero), correction bit = ``(|v| >> al) & 1``."""

    def mag(k):
        t = int(zz[k])
        return (t if t >= 0 else -t) >> al

    ke = se
    while ke > 0 and mag(ke) == 0:
        ke -= 1
    kex = ke
    while kex > 0 and (mag(kex) >> 1) == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(bank, st, 1)  # EOB
                return
            enc.encode(bank, st, 0)
        while True:
            t = mag(k)
            if t:
                if t >> 1:  # previously nonzero: correction bit
                    enc.encode(bank, st + 2, t & 1)
                else:  # newly nonzero this scan
                    enc.encode(bank, st + 1, 1)
                    enc.encode_fixed(1 if zz[k] < 0 else 0)
                break
            enc.encode(bank, st + 1, 0)
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refinement overrun (encoder bug)")
        k += 1


def encode_jpeg_arithmetic(
    pixels: np.ndarray,
    quality: int = 50,
    restart_interval: int = 0,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """Encode uint8 pixels (``(h, w)`` gray / ``(h, w, 3)`` RGB) as an
    ARITHMETIC-coded sequential JPEG (SOF9): Annex K quantization, 4:4:4,
    one interleaved scan, explicit DAC. ``restart_interval`` emits
    DRI+RSTn with full coder/statistics resets; ``dc_cond``/``ac_kx``
    override the default conditioning (exercised through the DAC
    marker). Exists chiefly to give :func:`decode_jpeg_arithmetic`
    hermetic fixtures — the round-trip IS the conformance test available
    in this container."""
    from evolution_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_quantized_zigzag,
    )

    # the ONE shared front end — arithmetic and Huffman fixtures code
    # the same coefficients (the bit-identity tests pin this)
    zzs, qts, gray, h, w = _jpeg_quantized_zigzag(pixels, quality)
    n_tables = 1 if gray else 2
    lo, up = dc_cond
    entropy_parts: list[bytes] = []

    def fresh():
        return (
            _QMEncoder(),
            [bytearray(64) for _ in range(n_tables)],
            [bytearray(256) for _ in range(n_tables)],
            [0] * len(zzs),
            [0] * len(zzs),
        )

    enc, dc_banks, ac_banks, dc_ctx, pred = fresh()
    mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                entropy_parts.append(enc.finish())
                entropy_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                enc, dc_banks, ac_banks, dc_ctx, pred = fresh()
            mcu_count += 1
            for ci in range(len(zzs)):
                t = 0 if ci == 0 else 1
                zz = zzs[ci][my, mx]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                dc_ctx[ci] = _encode_dc_diff(
                    enc, dc_banks[t], dc_ctx[ci], diff, lo, up
                )
                _encode_ac_block(enc, ac_banks[t], zz, 1, 63, ac_kx)
    entropy_parts.append(enc.finish())
    entropy = b"".join(entropy_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + (len(body) + 2).to_bytes(2, "big") + body
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t, qt in enumerate(qts):
        out += seg(
            0xDB,
            bytes([t]) + bytes(int(x) for x in qt.ravel()[_JPEG_ZIGZAG]),
        )
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC9, sof)  # SOF9: arithmetic sequential
    dac = b""
    for t in range(n_tables):
        dac += bytes([t, (up << 4) | lo])  # DC table t conditioning
        dac += bytes([0x10 | t, ac_kx])    # AC table t band split
    out += seg(0xCC, dac)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
