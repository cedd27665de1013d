"""WebP (RIFF) container metadata + from-spec VP8L lossless codec.

WebP is the most common image format in modern scraped web corpora
after JPEG/PNG, and arrives in three flavors inside one RIFF
container (public container spec; lossless bitstream per RFC 9649):

  "VP8 "  lossy VP8 key frame  -> metadata here; full decode exists
          (operators/vp8, RFC 6386) behind an explicit opt-in gate
  "VP8L"  lossless             -> FULL decode/encode in this module
  "VP8X"  extended             -> canvas/flags/animation metadata
                                  (ALPH/ANIM/ANMF/EXIF/XMP chunks)

``parse_webp_metadata`` walks the RIFF chunk list header-only (the
probe path). ``decode_vp8l``/``encode_vp8l`` implement the RFC 9649
lossless bitstream: LSB-first bit packing, canonical prefix codes
(DEFLATE convention, RFC 1951 §3.2.2), meta prefix groups, color
cache, LZ77 backward references with the 120-entry short-distance
plane map, and all four transforms (predictor / color /
subtract-green / color-indexing with sub-byte bundling).

Provenance honesty (no network in this environment; everything from
the published spec as studied): two layout facts are implementer-read
and called out at their code sites — (a) the top-right prediction
pixel for the rightmost column is the LEFTMOST pixel of the SAME row
(the spec standardizes the contiguous-row-buffer behavior), and
(b) the short-distance plane table is GENERATED from its definition
(the 120 nearest (dx, dy) neighbors with dy in 0..7, ordered by
squared Euclidean distance, ties by larger dy first, then smaller
|dx|, positive dx before negative) rather than transcribed. Both are
exercised only by this module's own encoder round-trips; a foreign
libwebp stream using them decodes per this reading.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- bits


class _BitReader:
    """LSB-first bit reader over bytes (VP8L convention)."""

    __slots__ = ("b", "pos", "n")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos  # bit position
        self.n = len(b) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.pos + nbits > self.n:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        p = self.pos
        for i in range(nbits):
            v |= ((self.b[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + nbits
        return v

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("VP8L bitstream truncated")
        v = (self.b[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return v


class _BitWriter:
    __slots__ = ("bits", "acc", "nacc")

    def __init__(self):
        self.bits = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.nacc
        self.nacc += nbits
        while self.nacc >= 8:
            self.bits.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def done(self) -> bytes:
        if self.nacc:
            self.bits.append(self.acc & 0xFF)
            self.acc, self.nacc = 0, 0
        return bytes(self.bits)


# ------------------------------------------------- canonical prefix code

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _canonical_table(lengths):
    """DEFLATE-canonical decode table: {(length, code): symbol} with
    codes assigned in (length, symbol) order, read MSB-first."""
    max_len = max(lengths, default=0)
    if max_len == 0:
        raise ValueError("VP8L prefix code has no symbols")
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1:
        # single-symbol code: zero bits per symbol
        return {"single": used[0][1]}, 0
    bl_count = [0] * (max_len + 1)
    for ln, _ in used:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    if code + bl_count[max_len] > (1 << max_len):
        raise ValueError("VP8L prefix code over-subscribed")
    table = {}
    for ln, sym in sorted(used):
        table[(ln, next_code[ln])] = sym
        next_code[ln] += 1
    return table, max_len


def _read_code(br: _BitReader, table_maxlen) -> int:
    table, max_len = table_maxlen
    if "single" in table:
        return table["single"]
    code = 0
    for ln in range(1, max_len + 1):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("VP8L prefix code desynced")


def _read_prefix_code(br: _BitReader, alphabet_size: int):
    """One prefix code: the 'simple' 1/2-symbol form or the
    code-length-coded normal form (RFC 9649 §5.2.1)."""
    if br.bit():  # simple
        n_sym = br.read(1) + 1
        first_8bit = br.bit()
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if n_sym == 1:
            lengths[s0] = 1
            return {"single": s0}, 0
        s1 = br.read(8)
        if s1 >= alphabet_size or s1 == s0:
            raise ValueError("VP8L simple-code symbol invalid")
        # simple codes assign 0/1 in READ order (not canonical-sorted):
        # a stream with s0 > s1 would otherwise decode swapped
        return {(1, 0): s0, (1, 1): s1}, 1
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_table = _canonical_table(cl_lengths)
    if br.bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev = 8
    while len(lengths) < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = _read_code(br, cl_table)
        if s < 16:
            lengths.append(s)
            if s:
                prev = s
        elif s == 16:
            lengths.extend([prev] * (3 + br.read(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:  # 18
            lengths.extend([0] * (11 + br.read(7)))
    if len(lengths) > alphabet_size:
        raise ValueError("VP8L code-length repeats overflow the alphabet")
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _canonical_table(lengths)


# -------------------------------------------------- LZ77 value coding


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decode (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """(code, extra_bits, extra_value) inverse of :func:`_prefix_value`."""
    if value < 1:
        raise ValueError("prefix values are >= 1")
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    if rest < (1 << (nbits - 1)):
        return 2 * nbits, nbits - 1, rest
    return 2 * nbits + 1, nbits - 1, rest - (1 << (nbits - 1))


def _plane_codes():
    """The 120 short-distance (dx, dy) neighbors, generated from the
    definition (see module docstring, provenance note (b))."""
    cand = [(dx, dy) for dy in range(8) for dx in range(-8, 9)
            if (dy > 0 or dx > 0)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                             abs(p[0]), 0 if p[0] >= 0 else 1))
    return cand[:120]


_PLANE = _plane_codes()


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _PLANE[dist_code - 1]
    return max(1, dy * xsize + dx)


# -------------------------------------------------------- ARGB decode


def _hash_argb(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_argb(br: _BitReader, w: int, h: int, allow_meta: bool):
    """One entropy-coded ARGB image (RFC 9649 §5): optional color
    cache, optional meta prefix groups (main image only), 5 prefix
    codes per group, literals + LZ77 + cache refs. Returns a python
    list of w*h uint32 ARGB values."""
    if w <= 0 or h <= 0:
        raise ValueError("VP8L image dimensions must be positive")
    if w * h > (1 << 26):
        raise ValueError("VP8L dimensions exceed the decode guard")
    cache_bits = 0
    if br.bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.bit():
        meta_bits = br.read(3) + 2
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_argb(br, ew, eh, False)
        meta = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_size),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))
    out = [0] * (w * h)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            gidx = meta[(y >> meta_bits) * ((w + (1 << meta_bits) - 1)
                                            >> meta_bits)
                        + (x >> meta_bits)]
            if gidx >= n_groups:
                raise ValueError("VP8L meta prefix index out of range")
            g_code, r_code, b_code, a_code, d_code = groups[gidx]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = _read_code(br, g_code)
        if s < 256:
            red = _read_code(br, r_code)
            blue = _read_code(br, b_code)
            alpha = _read_code(br, a_code)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            if cache is not None:
                cache[_hash_argb(argb, cache_bits)] = argb
            pos += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(_read_code(br, d_code), br)
            dist = _map_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            if pos + length > total:
                raise ValueError("VP8L backward reference past end")
            for _ in range(length):
                argb = out[pos - dist]
                out[pos] = argb
                if cache is not None:
                    cache[_hash_argb(argb, cache_bits)] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache reference without a cache")
            idx = s - 280
            if idx >= len(cache):
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------- transforms


def _sub3(a, b, c):
    return abs(b - c) - abs(a - c)


def _select(t, l, tl):
    p = (_sub3((t >> 24) & 0xFF, (l >> 24) & 0xFF, (tl >> 24) & 0xFF)
         + _sub3((t >> 16) & 0xFF, (l >> 16) & 0xFF, (tl >> 16) & 0xFF)
         + _sub3((t >> 8) & 0xFF, (l >> 8) & 0xFF, (tl >> 8) & 0xFF)
         + _sub3(t & 0xFF, l & 0xFF, tl & 0xFF))
    return t if p <= 0 else l


def _avg2(a, b):
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _clamp_add_sub_full(l, t, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(l, t, tl):
    out = 0
    for sh in (24, 16, 8, 0):
        a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) // 2
        d = a - ((tl >> sh) & 0xFF)
        # C truncating division (toward zero), as the reference decoder
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= max(0, min(255, a + half)) << sh
    return out


def _apply_inverse_predictor(pix, w, h, size_bits, pred_img):
    bw = (w + (1 << size_bits) - 1) >> size_bits
    add = lambda p, q: ((((p & 0x00FF00FF) + (q & 0x00FF00FF))
                         & 0x00FF00FF)
                        | (((p & 0xFF00FF00) + (q & 0xFF00FF00))
                           & 0xFF00FF00)) & 0xFFFFFFFF
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[pos - 1]           # L
        elif x == 0:
            pred = pix[pos - w]           # T
        else:
            mode = (pred_img[(y >> size_bits) * bw + (x >> size_bits)]
                    >> 8) & 0xFF
            L = pix[pos - 1]
            T = pix[pos - w]
            TL = pix[pos - w - 1]
            # provenance note (a): TR for the rightmost column is the
            # LEFTMOST pixel of the SAME row (contiguous-buffer rule)
            TR = pix[pos - w + 1] if x + 1 < w else pix[pos - x]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_sub_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_sub_half(L, T, TL)
            else:
                raise ValueError(f"VP8L predictor mode {mode}")
        pix[pos] = add(pix[pos], pred)
    return pix


def _cte_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 multiply >> 5 (RFC 9649 §4.2.3)."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _apply_inverse_color_transform(pix, w, h, size_bits, cte_img):
    bw = (w + (1 << size_bits) - 1) >> size_bits
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = cte_img[(y >> size_bits) * bw + (x >> size_bits)]
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        p = pix[pos]
        a = (p >> 24) & 0xFF
        r = (p >> 16) & 0xFF
        g = (p >> 8) & 0xFF
        b = p & 0xFF
        r = (r + _cte_delta(g2r, g)) & 0xFF
        b = (b + _cte_delta(g2b, g)) & 0xFF
        b = (b + _cte_delta(r2b, r)) & 0xFF
        pix[pos] = (a << 24) | (r << 16) | (g << 8) | b
    return pix


def _apply_inverse_subtract_green(pix):
    for pos, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pix[pos] = (p & 0xFF00FF00) | (r << 16) | b
    return pix


def _apply_inverse_color_indexing(pix, w, h, palette, packed_w):
    n = len(palette)
    if n <= 2:
        ppb, width_bits = 8, 1
    elif n <= 4:
        ppb, width_bits = 4, 2
    elif n <= 16:
        ppb, width_bits = 2, 4
    else:
        ppb, width_bits = 1, 8
    out = [0] * (w * h)
    mask = (1 << width_bits) - 1
    for y in range(h):
        for x in range(w):
            packed = pix[y * packed_w + x // ppb]
            idx = ((packed >> 8) >> (width_bits * (x % ppb))) & mask
            if idx >= n:
                raise ValueError("VP8L palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# ---------------------------------------------------------- main codec


def decode_vp8l(body: bytes) -> np.ndarray:
    """Decode a VP8L chunk body (starting at the 0x2f signature) to an
    ``(h, w, 4)`` uint8 RGBA array (RFC 9649)."""
    if not body or body[0] != 0x2F:
        raise ValueError("not a VP8L stream (bad signature)")
    br = _BitReader(body, pos=8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.bit()  # alpha_is_used hint (informative)
    if br.read(3) != 0:
        raise ValueError("VP8L version must be 0")
    if w * h > (1 << 26):
        raise ValueError("VP8L dimensions exceed the decode guard")
    transforms = []
    seen = set()
    eff_w = w
    while br.bit():
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(t)
        if t == 0:  # predictor
            sb = br.read(3) + 2
            bw = (eff_w + (1 << sb) - 1) >> sb
            bh = (h + (1 << sb) - 1) >> sb
            transforms.append(("pred", sb, _decode_argb(br, bw, bh,
                                                        False)))
        elif t == 1:  # color
            sb = br.read(3) + 2
            bw = (eff_w + (1 << sb) - 1) >> sb
            bh = (h + (1 << sb) - 1) >> sb
            transforms.append(("color", sb, _decode_argb(br, bw, bh,
                                                         False)))
        elif t == 2:
            transforms.append(("subgreen",))
        else:  # color indexing
            n = br.read(8) + 1
            pal = _decode_argb(br, n, 1, False)
            # palette entries are delta-coded against the previous
            cum = []
            prev = 0
            for p in pal:
                cur = 0
                for sh in (24, 16, 8, 0):
                    cur |= ((((p >> sh) & 0xFF) + ((prev >> sh) & 0xFF))
                            & 0xFF) << sh
                cum.append(cur)
                prev = cur
            ppb = 8 if n <= 2 else 4 if n <= 4 else 2 if n <= 16 else 1
            packed_w = (eff_w + ppb - 1) // ppb
            transforms.append(("palette", cum, eff_w, packed_w))
            eff_w = packed_w
    pix = _decode_argb(br, eff_w, h, True)
    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, full_w, packed_w = t
            pix = _apply_inverse_color_indexing(pix, full_w, h, pal,
                                                packed_w)
            eff_w = full_w
        elif t[0] == "subgreen":
            pix = _apply_inverse_subtract_green(pix)
        elif t[0] == "color":
            pix = _apply_inverse_color_transform(pix, eff_w, h, t[1],
                                                 t[2])
        else:
            pix = _apply_inverse_predictor(pix, eff_w, h, t[1], t[2])
    a = np.array(pix, dtype=np.uint32).reshape(h, eff_w)
    rgba = np.empty((h, eff_w, 4), dtype=np.uint8)
    rgba[..., 0] = (a >> 16) & 0xFF
    rgba[..., 1] = (a >> 8) & 0xFF
    rgba[..., 2] = a & 0xFF
    rgba[..., 3] = (a >> 24) & 0xFF
    return rgba


def _canonical_codes(lengths):
    """Encoder-side mirror of :func:`_canonical_table`:
    ``{symbol: (code, nbits)}`` with DEFLATE canonical assignment."""
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    max_len = max(ln for ln, _ in used)
    bl_count = [0] * (max_len + 1)
    for ln, _ in used:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    book = {}
    for ln, sym in sorted(used):
        book[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return book


def _emit(bw: _BitWriter, book, sym: int):
    code, nbits = book[sym]
    for sh in range(nbits - 1, -1, -1):
        bw.write((code >> sh) & 1, 1)


def _write_literal_code(bw: _BitWriter, alphabet_size: int):
    """Transmit a 256-symbol all-length-8 literal code (complete), with
    ``alphabet_size - 256`` trailing zero lengths. CL code: 8 -> one
    bit, 16/18 -> two bits (complete)."""
    bw.write(0, 1)           # normal (not simple)
    bw.write(10, 4)          # num_code_lengths = 14: covers 18, 16, 8
    for i in range(14):
        sym = _CL_ORDER[i]
        bw.write(1 if sym == 8 else 2 if sym in (16, 18) else 0, 3)
    bw.write(0, 1)           # no explicit max_symbol
    cl = _canonical_codes(
        [1 if s == 8 else 2 if s in (16, 18) else 0 for s in range(19)]
    )
    _emit(bw, cl, 8)         # lengths[0] = 8
    rem = 255                # repeat "8" 255 more times (16: 3-6 reps)
    while rem:
        rep = min(6, rem) if rem != 7 else 4
        _emit(bw, cl, 16)
        bw.write(rep - 3, 2)
        rem -= rep
    pad = alphabet_size - 256
    while pad:               # trailing zeros (18: 11-138 reps)
        rep = min(138, pad) if pad >= 11 else 0
        if rep:
            _emit(bw, cl, 18)
            bw.write(rep - 11, 7)
            pad -= rep
        else:
            raise ValueError("literal-code zero padding below 11")
    return


def _write_backref_green_code(bw: _BitWriter):
    """Green code for ``use_backrefs`` mode: literals 0..255 at 9 bits
    (Kraft 1/2) + length symbols 256..271 at 5 bits (the other 1/2),
    symbols 272..279 unused. Canonical: length syms get codes 0..15,
    literal g gets 9-bit code 256 + g."""
    bw.write(0, 1)           # normal
    bw.write(9, 4)           # num_code_lengths = 13: covers 17,5,16,9
    for i in range(13):
        sym = _CL_ORDER[i]
        bw.write(2 if sym in (5, 9, 16, 17) else 0, 3)
    bw.write(0, 1)           # no max_symbol
    cl = _canonical_codes(
        [2 if s in (5, 9, 16, 17) else 0 for s in range(19)]
    )
    _emit(bw, cl, 9)         # lengths[0] = 9
    for _ in range(42):      # 252 repeats
        _emit(bw, cl, 16)
        bw.write(3, 2)       # 6 reps
    _emit(bw, cl, 16)
    bw.write(0, 2)           # 3 reps -> 256 nines total
    _emit(bw, cl, 5)         # lengths[256] = 5
    for rep in (6, 6, 3):    # 15 more fives -> 16 total
        _emit(bw, cl, 16)
        bw.write(rep - 3, 2)
    _emit(bw, cl, 17)        # 8 trailing zeros (17: 3-10 reps)
    bw.write(5, 3)


def _write_single_symbol_code(bw: _BitWriter, sym: int):
    bw.write(1, 1)          # simple
    bw.write(0, 1)          # one symbol
    if sym < 2:
        bw.write(0, 1)      # 1-bit first symbol
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


_LIT8 = {s: (s, 8) for s in range(256)}
_GREEN_BR = {**{s: (256 + s, 9) for s in range(256)},
             **{256 + c: (c, 5) for c in range(16)}}


def encode_vp8l(img: np.ndarray, use_backrefs: bool = False) -> bytes:
    """Encode ``(h, w, 3)`` RGB / ``(h, w, 4)`` RGBA uint8 as a VP8L
    chunk body: no transforms, no color cache, one prefix group with
    complete literal codes (every byte value round-trips exactly).
    ``use_backrefs=True`` adds dist=1 run-length LZ77 references
    (capped at 256 pixels, the >120 direct-distance path) for
    codec-path coverage."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (
        3, 4
    ):
        raise ValueError(
            f"encode_vp8l takes (h, w, 3|4) uint8, got "
            f"{img.dtype}{img.shape}"
        )
    h, w = img.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError(f"VP8L dimensions {w}x{h} out of range")
    has_alpha = img.shape[2] == 4
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)          # version
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # no color cache
    bw.write(0, 1)          # no meta prefix
    if use_backrefs:
        _write_backref_green_code(bw)
        green_book = _GREEN_BR
    else:
        _write_literal_code(bw, 256 + 24)   # green incl. unused lengths
        green_book = _LIT8
    _write_literal_code(bw, 256)            # red
    _write_literal_code(bw, 256)            # blue
    _write_literal_code(bw, 256)            # alpha
    # distance: only value 121 (dist 1) is ever emitted -> symbol 13
    _write_single_symbol_code(bw, 13 if use_backrefs else 0)
    flat = img.reshape(-1, img.shape[2])
    if not has_alpha:
        alpha_col = np.full((flat.shape[0], 1), 255, dtype=np.uint8)
        flat = np.concatenate([flat, alpha_col], axis=1)
    total = flat.shape[0]
    i = 0
    while i < total:
        if use_backrefs and i > 0:
            run = 0
            while (i + run < total and run < 256
                   and np.array_equal(flat[i + run], flat[i - 1])):
                run += 1
            if run >= 3:
                lcode, lnb, lval = _prefix_encode(run)
                _emit(bw, green_book, 256 + lcode)
                bw.write(lval, lnb)
                dcode, dnb, dval = _prefix_encode(121)  # distance 1
                assert dcode == 13
                bw.write(dval, dnb)     # symbol itself costs 0 bits
                i += run
                continue
        r, g, b, a = (int(flat[i][0]), int(flat[i][1]), int(flat[i][2]),
                      int(flat[i][3]))
        _emit(bw, green_book, g)
        _emit(bw, _LIT8, r)
        _emit(bw, _LIT8, b)
        _emit(bw, _LIT8, a)
        i += 1
    return bw.done()


# ------------------------------------------------------ RIFF container


def _chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (RIFF/WEBP magic)")
    riff_size = int.from_bytes(payload[4:8], "little")
    end = min(len(payload), 8 + riff_size)
    pos = 12
    out = []
    while pos + 8 <= end:
        fourcc = payload[pos: pos + 4]
        size = int.from_bytes(payload[pos + 4: pos + 8], "little")
        body_end = pos + 8 + size
        if body_end > len(payload):
            raise ValueError("WebP chunk overruns the payload")
        out.append((fourcc, pos + 8, body_end))
        pos = body_end + (size & 1)
    if not out:
        raise ValueError("WebP container has no chunks")
    return out


def parse_webp_metadata(payload: bytes) -> dict:
    """Header-only WebP metadata: flavor, canvas dimensions, alpha,
    animation (frame count + total duration), metadata chunk presence.
    Lossy VP8 dimensions come from the key-frame header (3-byte frame
    tag, 0x9d012a start code, 14-bit w/h); VP8L from its 5-byte
    header; VP8X from the 10-byte extended header."""
    payload = bytes(payload)
    chunks = _chunks(payload)
    kinds = [c[0] for c in chunks]
    meta = {
        "container": "webp",
        "flavor": None,
        "width": None,
        "height": None,
        "has_alpha": False,
        "animated": False,
        "n_frames": 0,
        "duration_ms": None,
        "has_icc": False,
        "has_exif": b"EXIF" in kinds,
        "has_xmp": b"XMP " in kinds,
    }
    first, s, e = chunks[0]
    if first == b"VP8 ":
        meta["flavor"] = "lossy"
        if e - s < 10:
            raise ValueError("VP8 key frame header truncated")
        tag = int.from_bytes(payload[s: s + 3], "little")
        if tag & 1:
            raise ValueError("WebP VP8 chunk is not a key frame")
        if payload[s + 3: s + 6] != b"\x9d\x01\x2a":
            raise ValueError("VP8 key frame start code missing")
        wv = int.from_bytes(payload[s + 6: s + 8], "little")
        hv = int.from_bytes(payload[s + 8: s + 10], "little")
        meta["width"] = wv & 0x3FFF
        meta["height"] = hv & 0x3FFF
    elif first == b"VP8L":
        meta["flavor"] = "lossless"
        if e - s < 5 or payload[s] != 0x2F:
            raise ValueError("VP8L header truncated or bad signature")
        v = int.from_bytes(payload[s + 1: s + 5], "little")
        meta["width"] = (v & 0x3FFF) + 1
        meta["height"] = ((v >> 14) & 0x3FFF) + 1
        meta["has_alpha"] = bool((v >> 28) & 1)
    elif first == b"VP8X":
        meta["flavor"] = "extended"
        if e - s < 10:
            raise ValueError("VP8X header truncated")
        flags = payload[s]
        meta["has_icc"] = bool(flags & 0x20)
        meta["has_alpha"] = bool(flags & 0x10)
        meta["animated"] = bool(flags & 0x02)
        meta["width"] = int.from_bytes(payload[s + 4: s + 7],
                                       "little") + 1
        meta["height"] = int.from_bytes(payload[s + 7: s + 10],
                                        "little") + 1
        if b"ALPH" in kinds:
            meta["has_alpha"] = True
        if meta["animated"]:
            frames = [(f, fs, fe) for f, fs, fe in chunks
                      if f == b"ANMF"]
            meta["n_frames"] = len(frames)
            dur = 0
            for _, fs, fe in frames:
                if fe - fs < 16:
                    raise ValueError("ANMF frame header truncated")
                dur += int.from_bytes(payload[fs + 12: fs + 15],
                                      "little")
            meta["duration_ms"] = dur
        else:
            meta["n_frames"] = 1
    else:
        raise ValueError(
            f"WebP first chunk {first!r} is not VP8 /VP8L/VP8X"
        )
    return meta


def decode_webp(payload: bytes, vp8: str = "refuse") -> np.ndarray:
    """Decode a WebP payload. VP8L (incl. the VP8L frame inside a
    non-animated VP8X) decodes fully and unconditionally.

    Lossy VP8 key frames (round 14): a complete RFC 6386 decoder
    exists in ``operators/vp8``, but its large TRAINED probability
    tables are transcribed without conformance vectors (no reference
    decoder exists in this offline environment), and a wrong entry
    desyncs the arithmetic decode of an EXTERNALLY-encoded stream into
    silently wrong pixels — violating this repo's refuse-over-
    misdecode contract. So the DEFAULT here still refuses lossy VP8;
    pass ``vp8="roundtrip"`` ONLY for streams whose provenance is
    this repo's own ``encode_webp_lossy`` / ``encode_vp8_frame``
    (bit-exact, 240-configuration round-trip matrix). Externally
    encoded streams are NOT safe under the opt-in until the full
    appendix tables are transcribed and conformance-checked: 99 of
    100 ``KF_BMODE_PROB`` context rows and most of
    ``COEF_UPDATE_PROBS`` are synthesized, so an external stream can
    silently desync into wrong pixels. Two hard guards narrow the
    blast radius: frames that request coefficient-probability updates
    are REFUSED even under the opt-in (this repo's encoder never
    emits them, so such a frame is provably external), and the
    decoder reports whether any B_PRED block used a synthesized
    B-mode context row (``used_synth_bmode`` in the frame dict)."""
    chunks = _chunks(bytes(payload))
    by_kind = {}
    for f, s, e in chunks:
        by_kind.setdefault(f, (s, e))
    if b"VP8L" in by_kind:
        s, e = by_kind[b"VP8L"]
        return decode_vp8l(bytes(payload[s:e]))
    if b"VP8 " in by_kind:
        if vp8 != "roundtrip":
            raise NotImplementedError(
                "lossy VP8 decode is implemented (operators/vp8, RFC "
                "6386) but its trained probability tables are not yet "
                "conformance-verified against external encoders — "
                "decode_webp(payload, vp8='roundtrip') opts in for "
                "streams produced by this repo's own encoder; "
                "parse_webp_metadata/probe_media stay the default "
                "curation path"
            )
        from evolution_spark.operators.vp8 import (
            decode_vp8_frame,
            yuv420_to_rgb,
        )

        s, e = by_kind[b"VP8 "]
        f = decode_vp8_frame(bytes(payload[s:e]))
        return yuv420_to_rgb(f["y"], f["u"], f["v"])
    raise ValueError("WebP payload has no image chunk")


def _riff_webp(fourcc: bytes, body: bytes) -> bytes:
    """Wrap one chunk as a complete RIFF/WEBP file (odd-size pad per
    the RIFF rule) — the single framing helper for both encoders."""
    chunk = fourcc + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP"
            + chunk)


def encode_webp(img: np.ndarray, use_backrefs: bool = False) -> bytes:
    """RGB(A) uint8 -> a complete lossless WebP file (RIFF + VP8L)."""
    return _riff_webp(b"VP8L", encode_vp8l(img,
                                           use_backrefs=use_backrefs))


def encode_webp_lossy(img: np.ndarray, qi: int = 40,
                      filter_level: int = 0, filter_type: int = 0,
                      sharpness: int = 0,
                      bpred_bias: float = 5.0) -> bytes:
    """RGB uint8 -> a complete LOSSY WebP file (RIFF + VP8 key frame)
    through the real RFC 6386 encoder in ``operators/vp8``."""
    from evolution_spark.operators.vp8 import encode_vp8_frame

    body, _ = encode_vp8_frame(img, qi=qi, filter_level=filter_level,
                               filter_type=filter_type,
                               sharpness=sharpness,
                               bpred_bias=bpred_bias)
    return _riff_webp(b"VP8 ", body)


def build_webp_lossy(width: int, height: int, n_bytes: int = 64) -> bytes:
    """Spec-shaped LOSSY WebP fixture (metadata walker only: a valid
    key-frame header, deterministic filler coefficients)."""
    if not (0 < width <= 0x3FFF and 0 < height <= 0x3FFF):
        raise ValueError("VP8 dimensions out of 14-bit range")
    tag = (0 | (3 << 1) | (1 << 4) | (16 << 5)).to_bytes(3, "little")
    hdr = tag + b"\x9d\x01\x2a" + width.to_bytes(2, "little") \
        + height.to_bytes(2, "little")
    body = hdr + bytes((i * 37) & 0xFF for i in range(n_bytes))
    return _riff_webp(b"VP8 ", body)


def build_webp_animation(frames: list, canvas: tuple[int, int] = (64, 64),
                         background: int = 0xFF000000) -> bytes:
    """Spec-shaped ANIMATED WebP fixture: VP8X + ANIM + one ANMF per
    frame, each embedding a real VP8L frame payload. A frame is either
    the legacy ``(width, height, duration_ms)`` tuple (black frame at
    the origin, no-blend, keep) or a dict with keys ``w h dur`` and
    optional ``x y`` (EVEN canvas offsets — the ANMF header stores
    them halved), ``fill`` (RGB or RGBA tuple), ``blend`` (True =
    alpha-blend onto the canvas), ``dispose`` (True = dispose to the
    ANIM background color after display)."""
    cw, ch = canvas
    vp8x = (bytes([0x02]) + b"\x00\x00\x00"
            + (cw - 1).to_bytes(3, "little")
            + (ch - 1).to_bytes(3, "little"))
    chunks = b"VP8X" + (10).to_bytes(4, "little") + vp8x
    anim = background.to_bytes(4, "little") + (0).to_bytes(2, "little")
    chunks += b"ANIM" + (6).to_bytes(4, "little") + anim
    for fr in frames:
        if isinstance(fr, dict):
            fw, fh, dur = fr["w"], fr["h"], fr["dur"]
            x, y = fr.get("x", 0), fr.get("y", 0)
            fill = fr.get("fill", (0, 0, 0))
            blend = fr.get("blend", False)
            dispose = fr.get("dispose", False)
        else:
            (fw, fh, dur), x, y = fr, 0, 0
            fill, blend, dispose = (0, 0, 0), False, False
        if x % 2 or y % 2:
            raise ValueError("ANMF frame offsets must be even")
        img = np.empty((fh, fw, len(fill)), dtype=np.uint8)
        img[:] = np.asarray(fill, dtype=np.uint8)
        sub = encode_vp8l(img)
        sub_chunk = b"VP8L" + len(sub).to_bytes(4, "little") + sub
        if len(sub) & 1:
            sub_chunk += b"\x00"
        flags = (0 if blend else 0x02) | (0x01 if dispose else 0)
        body = ((x // 2).to_bytes(3, "little")
                + (y // 2).to_bytes(3, "little")
                + (fw - 1).to_bytes(3, "little")
                + (fh - 1).to_bytes(3, "little")
                + dur.to_bytes(3, "little") + bytes([flags])
                + sub_chunk)
        chunks += b"ANMF" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunks += b"\x00"
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP"
            + chunks)


def decode_webp_animation(payload: bytes, vp8: str = "refuse"):
    """Decode an ANIMATED WebP to its composited timeline:
    ``[(duration_ms, (ch, cw, 4) RGBA canvas), ...]`` — ANMF frames
    decode via the VP8L path and composite per their header flags
    (placement at the halved stored offsets, source-over alpha
    blending or overwrite, dispose-to-background-color). A still WebP
    returns a single zero-duration entry, ALWAYS normalized to RGBA:
    a 3-channel still (VP8L without alpha, or lossy VP8) gets an
    opaque alpha plane appended so every timeline entry is (h, w, 4)
    — callers indexing channel counts must not assume the still path
    preserves :func:`decode_webp`'s 3-channel shape. Lossy VP8 frames
    follow the same gate as :func:`decode_webp`: refused by default,
    decoded with ``vp8="roundtrip"`` (opaque alpha).

    Blend math is the spec's source-over with 8-bit alpha, computed in
    exact integer arithmetic scaled by 255*255 then rounded half-up —
    fully opaque or fully transparent sources degrade to
    overwrite/no-op exactly."""
    payload = bytes(payload)
    meta = parse_webp_metadata(payload)
    if not meta["animated"]:
        img = decode_webp(payload, vp8=vp8)
        if img.shape[-1] == 3:  # lossy frames carry no alpha plane
            img = np.dstack(
                [img, np.full(img.shape[:2], 255, dtype=np.uint8)])
        return [(0, img)]
    chunks = _chunks(payload)
    cw, ch = meta["width"], meta["height"]
    if cw * ch > (1 << 26):
        raise ValueError("WebP canvas exceeds the decode guard")
    bg = None
    for f, s, e in chunks:
        if f == b"ANIM":
            if e - s < 6:
                raise ValueError("ANIM chunk truncated")
            b_, g_, r_, a_ = payload[s: s + 4]   # BGRA per spec
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)
    if bg is None:
        raise ValueError("animated WebP without an ANIM chunk")
    canvas = np.empty((ch, cw, 4), dtype=np.uint8)
    canvas[:] = bg
    out = []
    for f, s, e in chunks:
        if f != b"ANMF":
            continue
        if e - s < 16:
            raise ValueError("ANMF frame header truncated")
        x = int.from_bytes(payload[s: s + 3], "little") * 2
        y = int.from_bytes(payload[s + 3: s + 6], "little") * 2
        fw = int.from_bytes(payload[s + 6: s + 9], "little") + 1
        fh = int.from_bytes(payload[s + 9: s + 12], "little") + 1
        dur = int.from_bytes(payload[s + 12: s + 15], "little")
        flags = payload[s + 15]
        if x + fw > cw or y + fh > ch:
            raise ValueError("ANMF frame rectangle outside the canvas")
        sub = None
        pos = s + 16
        while pos + 8 <= e:
            fourcc = payload[pos: pos + 4]
            size = int.from_bytes(payload[pos + 4: pos + 8], "little")
            if pos + 8 + size > e:
                raise ValueError("ANMF sub-chunk overruns the frame")
            if fourcc == b"VP8L":
                sub = decode_vp8l(payload[pos + 8: pos + 8 + size])
            elif fourcc == b"VP8 ":
                if vp8 != "roundtrip":
                    raise NotImplementedError(
                        "lossy VP8 animation frames: decoder exists "
                        "but awaits conformance vectors — pass "
                        "vp8='roundtrip' for frames from this repo's "
                        "own encoder (decode_webp docstring)"
                    )
                from evolution_spark.operators.vp8 import (
                    decode_vp8_frame,
                    yuv420_to_rgb,
                )

                fr = decode_vp8_frame(payload[pos + 8: pos + 8 + size])
                rgb = yuv420_to_rgb(fr["y"], fr["u"], fr["v"])
                sub = np.dstack(
                    [rgb, np.full(rgb.shape[:2], 255, dtype=np.uint8)])
            pos += 8 + size + (size & 1)
        if sub is None:
            raise ValueError("ANMF frame without an image chunk")
        if sub.shape[0] != fh or sub.shape[1] != fw:
            raise ValueError(
                f"ANMF frame bitstream {sub.shape[1]}x{sub.shape[0]} "
                f"!= header {fw}x{fh}"
            )
        region = canvas[y: y + fh, x: x + fw]
        if flags & 0x02:                      # do-not-blend: overwrite
            region[:] = sub
        else:                                 # source-over alpha blend
            sa = sub[..., 3].astype(np.int64)
            da = region[..., 3].astype(np.int64)
            # alpha and color scaled by 255 resp. 255*255, then
            # rounded half-up back to 8 bits
            ba255 = sa * 255 + da * (255 - sa)
            for c in range(3):
                sc = sub[..., c].astype(np.int64)
                dc = region[..., c].astype(np.int64)
                num = sc * sa * 255 + dc * da * (255 - sa)
                region[..., c] = np.where(
                    ba255 > 0, (num * 2 + ba255) // (2 * ba255), 0
                ).astype(np.uint8)
            region[..., 3] = ((ba255 * 2 + 255) // (2 * 255)).astype(
                np.uint8)
        out.append((dur, canvas.copy()))
        if flags & 0x01:                      # dispose to background
            canvas[y: y + fh, x: x + fw] = bg
    if not out:
        raise ValueError("animated WebP with no ANMF frames")
    return out
