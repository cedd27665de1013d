"""WebP container walker + VP8L lossless codec (operators/webp.py).

The encoder emits only the no-transform literal/backref paths, so every
TRANSFORM decode path (predictor / color / subtract-green /
color-indexing with bundling), the color cache, and meta prefix groups
are exercised by hand-built bitstreams written with the module's own
bit/code primitives and verified against closed-form forward
computations in this file."""
import time

import numpy as np
import pytest

from evolution_spark.operators.webp import (
    _BitWriter,
    _canonical_codes,
    _cte_delta,
    _emit,
    _LIT8,
    _write_literal_code,
    _write_single_symbol_code,
    build_webp_animation,
    build_webp_lossy,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp,
    parse_webp_metadata,
)


def _header(bw, w, h, alpha=0):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha, 1)
    bw.write(0, 3)


def _plain_codes(bw):
    """The 5 prefix codes of a literal-only group."""
    _write_literal_code(bw, 280)
    _write_literal_code(bw, 256)
    _write_literal_code(bw, 256)
    _write_literal_code(bw, 256)
    _write_single_symbol_code(bw, 0)


def _emit_argb(bw, a, r, g, b):
    _emit(bw, _LIT8, g)
    _emit(bw, _LIT8, r)
    _emit(bw, _LIT8, b)
    _emit(bw, _LIT8, a)


def _rgba(argb_img):
    """uint32 ARGB (h, w) -> (h, w, 4) RGBA uint8 (decoder layout)."""
    a = np.asarray(argb_img, dtype=np.uint32)
    out = np.empty(a.shape + (4,), dtype=np.uint8)
    out[..., 0] = (a >> 16) & 0xFF
    out[..., 1] = (a >> 8) & 0xFF
    out[..., 2] = a & 0xFF
    out[..., 3] = (a >> 24) & 0xFF
    return out


def test_metadata_three_flavors():
    img = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(7, 5, 3)
    m = parse_webp_metadata(encode_webp(img))
    assert (m["flavor"], m["width"], m["height"]) == ("lossless", 5, 7)
    assert not m["has_alpha"] and not m["animated"]
    m = parse_webp_metadata(build_webp_lossy(1920, 1080))
    assert (m["flavor"], m["width"], m["height"]) == ("lossy", 1920,
                                                      1080)
    m = parse_webp_metadata(
        build_webp_animation([(32, 16, 40), (32, 16, 70)],
                             canvas=(128, 96))
    )
    assert m["flavor"] == "extended" and m["animated"]
    assert (m["width"], m["height"]) == (128, 96)
    assert m["n_frames"] == 2 and m["duration_ms"] == 110


def test_vp8l_literal_roundtrip_rgb_rgba():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == (19, 23, 4)
    assert np.array_equal(out[..., :3], img)
    assert (out[..., 3] == 255).all()
    img4 = rng.integers(0, 256, (6, 40, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img4)), img4)
    # 1x1 edge
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(one))[..., :3], one)


def test_vp8l_backref_roundtrip():
    rng = np.random.default_rng(12)
    # long horizontal runs -> dist-1 LZ77 references, incl. cross-row
    img = np.repeat(rng.integers(0, 256, (9, 4, 3), dtype=np.uint8),
                    13, axis=1)
    p = encode_webp(img, use_backrefs=True)
    plain = encode_webp(img)
    assert len(p) < len(plain)  # the refs actually fired
    assert np.array_equal(decode_webp(p)[..., :3], img)
    # constant image: one literal + max-length runs
    flat = np.full((31, 33, 4), 200, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(flat,
                                                  use_backrefs=True)),
                          flat)


def test_subtract_green_transform():
    rng = np.random.default_rng(13)
    w, h = 11, 7
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(2, 2)          # subtract-green
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)          # no cache
    bw.write(0, 1)          # no meta
    _plain_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            _emit_argb(bw, 255, (r - g) & 0xFF, g, (b - g) & 0xFF)
    out = decode_vp8l(bw.done())
    assert np.array_equal(out[..., :3], img)


def _forward_predict(img_argb, w, h, size_bits, modes_img, bw_blocks):
    """Closed-form forward predictor (mirror of the spec inverse):
    residual ARGB per pixel given reconstructed == original."""
    from evolution_spark.operators.webp import (
        _avg2,
        _clamp_add_sub_full,
        _clamp_add_sub_half,
        _select,
    )

    res = [0] * (w * h)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = img_argb[pos - 1]
        elif x == 0:
            pred = img_argb[pos - w]
        else:
            mode = modes_img[(y >> size_bits) * bw_blocks
                             + (x >> size_bits)]
            L = img_argb[pos - 1]
            T = img_argb[pos - w]
            TL = img_argb[pos - w - 1]
            TR = img_argb[pos - w + 1] if x + 1 < w else \
                img_argb[pos - x]
            pred = [
                0xFF000000, L, T, TR, TL,
                _avg2(_avg2(L, TR), T), _avg2(L, TL), _avg2(L, T),
                _avg2(TL, T), _avg2(T, TR),
                _avg2(_avg2(L, TL), _avg2(T, TR)),
                _select(T, L, TL),
                _clamp_add_sub_full(L, T, TL),
                _clamp_add_sub_half(L, T, TL),
            ][mode]
        r = 0
        for sh in (24, 16, 8, 0):
            r |= (((img_argb[pos] >> sh) - (pred >> sh)) & 0xFF) << sh
        res[pos] = r
    return res


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_every_mode(mode):
    rng = np.random.default_rng(100 + mode)
    w, h, sb = 13, 9, 2     # one 4px block grid, rightmost col ragged
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    argb = [
        (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for (r, g, b, a) in img.reshape(-1, 4)
    ]
    bwb = (w + (1 << sb) - 1) >> sb
    bhb = (h + (1 << sb) - 1) >> sb
    modes = [mode] * (bwb * bhb)
    res = _forward_predict(argb, w, h, sb, modes, bwb)
    bw = _BitWriter()
    _header(bw, w, h, alpha=1)
    bw.write(1, 1)
    bw.write(0, 2)          # predictor
    bw.write(sb - 2, 3)
    # predictor subimage: entropy-coded, no meta
    bw.write(0, 1)          # no cache
    _plain_codes(bw)
    for _ in range(bwb * bhb):
        _emit_argb(bw, 0, 0, mode, 0)
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)          # no cache (main)
    bw.write(0, 1)          # no meta
    _plain_codes(bw)
    for v in res:
        _emit_argb(bw, (v >> 24) & 0xFF, (v >> 16) & 0xFF,
                   (v >> 8) & 0xFF, v & 0xFF)
    out = decode_vp8l(bw.done())
    assert np.array_equal(out, img), f"predictor mode {mode}"


def test_color_transform():
    rng = np.random.default_rng(21)
    w, h, sb = 10, 6, 3
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    g2r, g2b, r2b = 0x45, 0xE3, 0x1B   # mixed-sign int8 factors
    cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)          # color transform
    bw.write(sb - 2, 3)
    bw.write(0, 1)          # subimage: no cache
    _plain_codes(bw)
    bwb = (w + (1 << sb) - 1) >> sb
    bhb = (h + (1 << sb) - 1) >> sb
    for _ in range(bwb * bhb):
        _emit_argb(bw, (cte >> 24) & 0xFF, (cte >> 16) & 0xFF,
                   (cte >> 8) & 0xFF, cte & 0xFF)
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)
    bw.write(0, 1)
    _plain_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            sr = (r - _cte_delta(g2r, g)) & 0xFF
            sb_ = (b - _cte_delta(g2b, g) - _cte_delta(r2b, r)) & 0xFF
            _emit_argb(bw, 255, sr, g, sb_)
    out = decode_vp8l(bw.done())
    assert np.array_equal(out[..., :3], img)


@pytest.mark.parametrize("n_colors", [2, 4, 13, 40])
def test_color_indexing_bundled(n_colors):
    rng = np.random.default_rng(30 + n_colors)
    w, h = 21, 5
    palette = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    ppb = 8 if n_colors <= 2 else 4 if n_colors <= 4 else \
        2 if n_colors <= 16 else 1
    width_bits = {8: 1, 4: 2, 2: 4, 1: 8}[ppb]
    packed_w = (w + ppb - 1) // ppb
    bw = _BitWriter()
    _header(bw, w, h, alpha=1)
    bw.write(1, 1)
    bw.write(3, 2)          # color indexing
    bw.write(n_colors - 1, 8)
    bw.write(0, 1)          # palette subimage: no cache
    _plain_codes(bw)
    prev = np.zeros(4, dtype=np.int64)
    for (r, g, b, a) in palette:
        argb = np.array([a, r, g, b], dtype=np.int64)
        prev_argb = np.array([prev[3], prev[0], prev[1], prev[2]],
                             dtype=np.int64)
        d = (argb - prev_argb) & 0xFF
        _emit_argb(bw, int(d[0]), int(d[1]), int(d[2]), int(d[3]))
        prev = np.array([r, g, b, a], dtype=np.int64)
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)
    bw.write(0, 1)
    _plain_codes(bw)
    for y in range(h):
        for px in range(packed_w):
            packed = 0
            for k in range(ppb):
                x = px * ppb + k
                if x < w:
                    packed |= int(idx[y, x]) << (width_bits * k)
            _emit_argb(bw, 255, 0, packed, 0)
    out = decode_vp8l(bw.done())
    expect = palette[idx]   # (h, w, 4) RGBA
    assert np.array_equal(out, expect)


def test_color_cache():
    from evolution_spark.operators.webp import _hash_argb

    rng = np.random.default_rng(41)
    w, h, cache_bits = 16, 8, 4
    colors = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    img = colors[rng.integers(0, 5, (h, w))]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)          # no transforms
    bw.write(1, 1)          # cache!
    bw.write(cache_bits, 4)
    bw.write(0, 1)          # no meta
    # green: literals 0..255 at 9 bits + cache syms 280..295 at 5 bits
    bw.write(0, 1)
    bw.write(9, 4)          # num_code_lengths 13: covers 18, 5, 16, 9
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9)
    for sym in order:
        bw.write(2 if sym in (5, 9, 16, 18) else 0, 3)
    bw.write(0, 1)          # no max_symbol
    cl = _canonical_codes(
        [2 if s in (5, 9, 16, 18) else 0 for s in range(19)]
    )
    _emit(bw, cl, 9)
    for _ in range(42):
        _emit(bw, cl, 16)
        bw.write(3, 2)
    _emit(bw, cl, 16)
    bw.write(0, 2)          # 256 nines
    _emit(bw, cl, 18)
    bw.write(13, 7)         # 24 zeros (length syms unused)
    _emit(bw, cl, 5)
    for rep in (6, 6, 3):
        _emit(bw, cl, 16)
        bw.write(rep - 3, 2)
    green = {**{s: (256 + s, 9) for s in range(256)},
             **{280 + c: (c, 5) for c in range(16)}}
    _write_literal_code(bw, 256)
    _write_literal_code(bw, 256)
    _write_literal_code(bw, 256)
    _write_single_symbol_code(bw, 0)
    cache = [0] * (1 << cache_bits)
    n_hits = 0
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            argb = (255 << 24) | (r << 16) | (g << 8) | b
            hidx = _hash_argb(argb, cache_bits)
            if cache[hidx] == argb:
                _emit(bw, green, 280 + hidx)
                n_hits += 1
            else:
                _emit(bw, green, g)
                _emit(bw, _LIT8, r)
                _emit(bw, _LIT8, b)
                _emit(bw, _LIT8, 255)
            cache[hidx] = argb
    assert n_hits > 50      # the path actually fired
    out = decode_vp8l(bw.done())
    assert np.array_equal(out[..., :3], img)


def test_meta_prefix_groups():
    rng = np.random.default_rng(51)
    w, h, meta_bits = 12, 6, 2
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ew = (w + 3) >> 2
    eh = (h + 3) >> 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)          # no transforms
    bw.write(0, 1)          # no cache
    bw.write(1, 1)          # meta prefix!
    bw.write(meta_bits - 2, 3)
    # entropy image: group idx alternates 0/1 by block column
    bw.write(0, 1)          # entropy subimage: no cache
    _plain_codes(bw)
    for by in range(eh):
        for bx in range(ew):
            _emit_argb(bw, 0, 0, bx % 2, 0)   # idx = (r<<8)|g
    _plain_codes(bw)        # group 0
    _plain_codes(bw)        # group 1 (same shape, distinct decode)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            _emit_argb(bw, 255, r, g, b)
    out = decode_vp8l(bw.done())
    assert np.array_equal(out[..., :3], img)


def test_dispatch_probe_and_decode_media():
    from evolution_spark.operators.multimodal import (
        decode_image_array,
        decode_media,
        probe_one_payload,
    )

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (14, 10, 3), dtype=np.uint8)
    p = encode_webp(img)
    got = probe_one_payload(p)
    assert got[:5] == ("webp", "image", "vp8l", 10, 14)
    assert np.array_equal(decode_image_array(p), img)
    flat = decode_media(p, "image")
    assert flat.size == 14 * 10 * 3
    lossy = build_webp_lossy(64, 48)
    assert probe_one_payload(lossy)[:5] == ("webp", "image", "vp8",
                                            64, 48)
    # round 14: a full RFC 6386 decoder exists, but the DEFAULT
    # dispatch still refuses lossy VP8 (trained tables await external
    # conformance vectors — refuse-over-misdecode); the opt-in path
    # honors the fuzz contract (some frame, or ValueError)
    with pytest.raises(NotImplementedError, match="roundtrip"):
        decode_webp(lossy)
    try:
        out = decode_webp(lossy, vp8="roundtrip")
        assert out.ndim == 3
    except ValueError:
        pass
    anim = build_webp_animation([(8, 8, 25)] * 3)
    got = probe_one_payload(anim)
    assert got[2] == "vp8x_anim" and got[5] == 75_000


def test_structural_refusals():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    p = bytearray(encode_webp(img))
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp_metadata(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x30" + bytes(10))
    # version != 0
    body = bytearray(encode_vp8l(img))
    body[4] |= 0xE0          # top 3 bits of byte 4 = version field
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(bytes(body))
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(bytes(encode_vp8l(img))[:6])
    with pytest.raises(ValueError, match="uint8"):
        encode_vp8l(img.astype(np.int32))
    lossy = bytearray(build_webp_lossy(8, 8))
    lossy[20] |= 1          # frame-tag bit 0: not a key frame
    with pytest.raises(ValueError, match="key frame"):
        parse_webp_metadata(bytes(lossy))


def test_mutation_fuzz_error_contract():
    """Corrupt VP8L payloads must raise ValueError (or decode to
    something) in bounded time — never struct.error/IndexError/hangs
    (the mapInPandas error contract)."""
    rng = np.random.default_rng(71)
    base_img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    for base in (encode_webp(base_img),
                 encode_webp(base_img, use_backrefs=True)):
        for trial in range(400):
            b = bytearray(base)
            mode = trial % 3
            if mode == 0:
                b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
            elif mode == 1:
                b = b[: rng.integers(0, len(b))]
            else:
                pos = int(rng.integers(0, len(b)))
                b[pos:pos] = bytes(rng.integers(0, 256,
                                                int(rng.integers(1, 9))))
            t0 = time.perf_counter()
            try:
                parse_webp_metadata(bytes(b))
            except ValueError:
                pass
            try:
                decode_webp(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            assert time.perf_counter() - t0 < 1.0


def test_simple_code_read_order():
    """review r13 pass 1: a 2-symbol simple code assigns bit 0 to the
    FIRST symbol read even when it sorts after the second — a foreign
    stream with s0 > s1 must not decode swapped."""
    from evolution_spark.operators.webp import _BitReader, \
        _read_code, _read_prefix_code

    bw = _BitWriter()
    bw.write(1, 1)          # simple
    bw.write(1, 1)          # two symbols
    bw.write(1, 1)          # first symbol is 8-bit
    bw.write(200, 8)        # s0 = 200 (sorts AFTER s1)
    bw.write(3, 8)          # s1 = 3
    bw.write(0b10, 2)       # then two code bits: 0 -> s0, 1 -> s1
    br = _BitReader(bw.done())
    table = _read_prefix_code(br, 256)
    assert _read_code(br, table) == 200   # wrote bit 0 first
    assert _read_code(br, table) == 3


def test_combined_subtract_green_plus_predictor():
    """review r13 pass 5: transform COMPOSITION — stream lists
    [subtract-green, predictor]; decoder must invert in reverse order
    (predictor first, then add-green)."""
    rng = np.random.default_rng(77)
    w, h, sb = 9, 6, 2
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    argb = [
        (255 << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        for (r, g, b) in img.reshape(-1, 3)
    ]
    # forward subtract-green
    sg = []
    for p in argb:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        sg.append((p & 0xFF00FF00) | (r << 16) | b)
    bwb = (w + (1 << sb) - 1) >> sb
    bhb = (h + (1 << sb) - 1) >> sb
    mode = 7  # avg2(L, T)
    res = _forward_predict(sg, w, h, sb, [mode] * (bwb * bhb), bwb)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(2, 2)          # subtract-green (listed FIRST)
    bw.write(1, 1)
    bw.write(0, 2)          # predictor (listed second)
    bw.write(sb - 2, 3)
    bw.write(0, 1)          # pred subimage: no cache
    _plain_codes(bw)
    for _ in range(bwb * bhb):
        _emit_argb(bw, 0, 0, mode, 0)
    bw.write(0, 1)          # end transforms
    bw.write(0, 1)
    bw.write(0, 1)
    _plain_codes(bw)
    for v in res:
        _emit_argb(bw, (v >> 24) & 0xFF, (v >> 16) & 0xFF,
                   (v >> 8) & 0xFF, v & 0xFF)
    out = decode_vp8l(bw.done())
    assert np.array_equal(out[..., :3], img)


def test_animation_compositing():
    """Animated WebP timeline: placement at halved stored offsets,
    overwrite vs source-over blending, dispose-to-background."""
    from evolution_spark.operators.webp import decode_webp_animation

    p = build_webp_animation(
        [
            {"w": 16, "h": 16, "dur": 40, "x": 0, "y": 0,
             "fill": (10, 20, 30), "dispose": False},
            {"w": 8, "h": 8, "dur": 50, "x": 4, "y": 6,
             "fill": (200, 100, 50), "dispose": True},
            {"w": 4, "h": 4, "dur": 60, "x": 0, "y": 0,
             "fill": (1, 2, 3)},
        ],
        canvas=(16, 16),
        background=0xFF112233,   # BGRA bytes: 33 22 11 FF -> RGB(17,34,51)... 
    )
    tl = decode_webp_animation(p)
    assert [d for d, _ in tl] == [40, 50, 60]
    f0, f1, f2 = (c for _, c in tl)
    assert (f0[..., :3] == (10, 20, 30)).all()
    # frame 1 overwrites an 8x8 rect at (6, 4) [row y=6, col x=4]
    assert tuple(f1[6, 4, :3]) == (200, 100, 50)
    assert tuple(f1[0, 0, :3]) == (10, 20, 30)
    # frame 1 disposed its rect to the ANIM background before frame 2
    bg_le = (0xFF112233).to_bytes(4, "little")   # B,G,R,A on the wire
    bg_rgb = (bg_le[2], bg_le[1], bg_le[0])
    assert tuple(f2[6, 4, :3]) == bg_rgb
    assert tuple(f2[0, 0, :3]) == (1, 2, 3)      # new frame on top
    assert tuple(f2[15, 15, :3]) == (10, 20, 30)  # untouched area


def test_animation_alpha_blend():
    from evolution_spark.operators.webp import decode_webp_animation

    p = build_webp_animation(
        [
            {"w": 8, "h": 8, "dur": 10, "fill": (100, 100, 100, 255)},
            # half-transparent source over the opaque base
            {"w": 8, "h": 8, "dur": 10, "fill": (200, 0, 0, 128),
             "blend": True},
            # fully transparent source: no-op
            {"w": 8, "h": 8, "dur": 10, "fill": (9, 9, 9, 0),
             "blend": True},
        ],
        canvas=(8, 8),
    )
    tl = decode_webp_animation(p)
    f1 = tl[1][1]
    # source-over: a = 255; rgb = (200*128 + 100*255*(127/255)) / 255
    sa, da = 128, 255
    num = 200 * sa * 255 + 100 * da * (255 - sa)
    den = sa * 255 + da * (255 - sa)
    expect_r = (num * 2 + den) // (2 * den)
    assert f1[0, 0, 0] == expect_r and f1[0, 0, 3] == 255
    assert np.array_equal(tl[2][1], f1)   # alpha-0 source changed nothing


def test_sample_frames_animated_webp(spark):
    from evolution_spark.operators.multimodal import sample_frames

    p = build_webp_animation(
        [{"w": 6, "h": 4, "dur": 10, "fill": (i * 30, 0, 0)}
         for i in range(5)],
        canvas=(6, 4),
    )
    df = spark.createDataFrame([(1, "video", bytearray(p))],
                               "media_id long, kind string, payload binary")
    rows = sample_frames(df, n_frames=3, fake=False).collect()
    assert len(rows) == 3
    first = np.frombuffer(rows[0].frame, dtype=np.uint8).reshape(4, 6, 3)
    last = np.frombuffer(rows[-1].frame, dtype=np.uint8).reshape(4, 6, 3)
    assert first[0, 0, 0] == 0 and last[0, 0, 0] == 120


def test_vp8l_roundtrip_property():
    """Property: ANY uint8 image round-trips exactly through both
    encoder modes (hypothesis over shapes, channel counts, content
    styles)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 24),
        ch=st.sampled_from([3, 4]),
        style=st.sampled_from(["random", "runs", "constant"]),
        backrefs=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, ch, style, backrefs, seed):
        rng = np.random.default_rng(seed)
        if style == "random":
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        elif style == "runs":
            cols = max(1, w // 5)
            img = np.repeat(
                rng.integers(0, 256, (h, cols, ch), dtype=np.uint8),
                -(-w // cols), axis=1)[:, :w]
        else:
            img = np.full((h, w, ch), int(rng.integers(0, 256)),
                          dtype=np.uint8)
        out = decode_webp(encode_webp(img, use_backrefs=backrefs))
        assert out.shape == (h, w, 4)
        assert np.array_equal(out[..., :ch], img)
        if ch == 3:
            assert (out[..., 3] == 255).all()

    check()
