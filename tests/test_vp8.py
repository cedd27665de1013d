"""Lossy VP8 key-frame codec (operators/vp8.py): boolean coder
identities, transforms, predictors, bit-exact encode/decode round
trips across the quantizer/filter matrix, container integration, and
the mutation-fuzz error contract."""
import time

import numpy as np
import pytest

from evolution_spark.operators.vp8 import (
    AC_QLOOKUP,
    DC_QLOOKUP,
    BoolDecoder,
    BoolEncoder,
    COEF_BANDS,
    ZIGZAG,
    decode_vp8_frame,
    encode_vp8_frame,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
    rgb_to_yuv420,
    yuv420_to_rgb,
    _lf_limits,
    _pad_plane,
    _pred_b,
    _quant_factors,
)

rng = np.random.default_rng(14)


def _img(h, w, kind):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "flat":
        return np.full((h, w, 3), 120, dtype=np.uint8)
    if kind == "grad":
        return np.stack(
            [(xx * 2) % 256, (yy * 3) % 256, (xx - yy) % 256], -1
        ).astype(np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    img = np.stack([(xx * 5) % 256] * 3, -1).astype(np.uint8)
    img[h // 3: 2 * h // 3] = 30
    return img


def test_bool_coder_roundtrip():
    r = np.random.default_rng(7)
    for _ in range(30):
        n = int(r.integers(1, 300))
        bits = [(int(r.integers(0, 2)), int(r.integers(1, 255)))
                for _ in range(n)]
        enc = BoolEncoder()
        for b, p in bits:
            enc.encode(b, p)
        dec = BoolDecoder(enc.done())
        assert [dec.decode(p) for _, p in bits] == [b for b, _ in bits]
        assert not dec.overrun
    enc = BoolEncoder()
    enc.literal(0xAB, 8)
    enc.signed(-13, 5)
    dec = BoolDecoder(enc.done())
    assert dec.literal(8) == 0xAB and dec.signed(5) == -13


def test_tables_and_limits():
    assert len(DC_QLOOKUP) == len(AC_QLOOKUP) == 128
    assert all(DC_QLOOKUP[i] <= DC_QLOOKUP[i + 1] for i in range(127))
    assert all(AC_QLOOKUP[i] <= AC_QLOOKUP[i + 1] for i in range(127))
    assert sorted(ZIGZAG) == list(range(16)) and len(COEF_BANDS) == 16
    q = _quant_factors(0, {})
    assert q["y1dc"] == 4 and q["y2ac"] == 8  # the y2ac floor
    q = _quant_factors(127, {"uvdc": 0})
    assert q["uvdc"] == 132  # the chroma-DC cap
    i, h, e_mb, e_sub = _lf_limits(40, 0)
    assert h == 2 and e_mb == (42 * 2) + 40 and e_sub == 80 + 40
    i, h, _, _ = _lf_limits(40, 7)
    assert i == min(max(1, 40 >> 2), 2)  # sharpness cap 9-7


def test_transform_inverses():
    r = np.random.default_rng(3)
    for _ in range(100):
        x = r.integers(-90, 90, (4, 4))
        assert np.abs(idct4x4(fdct4x4(x)) - x).max() <= 1
        y = r.integers(-600, 600, (4, 4))
        assert np.abs(iwht4x4(fwht4x4(y)) - y).max() <= 1
    dc = np.zeros((4, 4), dtype=int)
    dc[0, 0] = 17
    assert (idct4x4(dc) == (17 + 4) >> 3).all()


def test_bpred_edge_semantics():
    buf = _pad_plane(16, 16)
    buf[1:, 1:17] = 77
    # B_HU bottom rows replicate L[3]
    out = _pred_b(buf, 9, 9, 9, None)  # B_HU
    assert (out[3] == buf[12, 8]).all()
    # the 127 above-border / 129 left-border feed the first MB
    out = _pred_b(_pad_plane(16, 16), 1, 1, 0, None)  # B_DC at origin
    assert (out == (127 * 4 + 129 * 4 + 4) >> 3).all()


@pytest.mark.parametrize("kind", ["flat", "grad", "noise", "bands"])
def test_roundtrip_bit_exact(kind):
    for qi, fl, ft, sh, h, w in (
        (10, 0, 0, 0, 16, 16),
        (40, 20, 0, 0, 33, 49),
        (80, 40, 0, 3, 48, 64),
        (120, 63, 0, 7, 32, 32),
        (40, 25, 1, 0, 48, 48),   # simple filter
    ):
        img = _img(h, w, kind)
        data, exp = encode_vp8_frame(img, qi=qi, filter_level=fl,
                                     filter_type=ft, sharpness=sh)
        got = decode_vp8_frame(data)
        for p in "yuv":
            assert np.array_equal(got[p], exp[p]), (kind, qi, fl, ft,
                                                    sh, p)
        assert (got["width"], got["height"]) == (w, h)


def test_quality_and_yuv():
    img = _img(48, 64, "grad")
    data, _ = encode_vp8_frame(img, qi=20)
    got = decode_vp8_frame(data)
    ys, us, vs = rgb_to_yuv420(img)
    mse = float(((got["y"].astype(float) - ys.astype(float)) ** 2)
                .mean())
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 35, psnr
    # lower qi -> smaller quantizers -> at least as good
    data2, _ = encode_vp8_frame(img, qi=100)
    assert len(data2) <= len(data)
    rgb = yuv420_to_rgb(got["y"], got["u"], got["v"])
    assert rgb.shape == img.shape and rgb.dtype == np.uint8


def test_container_and_decode_media():
    from evolution_spark.operators.multimodal import (
        decode_media,
        probe_one_payload,
    )
    from evolution_spark.operators.webp import (
        decode_webp,
        encode_webp_lossy,
    )

    img = _img(32, 48, "grad")
    p = encode_webp_lossy(img, qi=30, filter_level=20)
    assert probe_one_payload(p)[:5] == ("webp", "image", "vp8", 48, 32)
    # default dispatches REFUSE (tables unverified against external
    # encoders); the explicit round-trip opt-in decodes
    with pytest.raises(NotImplementedError, match="roundtrip"):
        decode_webp(p)
    with pytest.raises(NotImplementedError):
        decode_media(p, "image", fake=False)
    out = decode_webp(p, vp8="roundtrip")
    assert out.shape == (32, 48, 3)
    # lossy-but-close: container round trip stays within coarse bounds
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 20


def test_interframe_and_garbage_refuse():
    img = _img(16, 16, "flat")
    data, _ = encode_vp8_frame(img)
    # version 2/3 disable the loop filter regardless of header fields
    img2 = _img(32, 32, "grad")
    fdata, fexp = encode_vp8_frame(img2, qi=40, filter_level=30)
    v2 = bytearray(fdata)
    v2[0] = (v2[0] & ~0x0E) | (2 << 1)   # set version=2
    unfiltered = decode_vp8_frame(bytes(v2))
    nofilt = decode_vp8_frame(fdata, apply_filter=False)
    assert np.array_equal(unfiltered["y"], nofilt["y"])
    d = bytearray(data)
    d[0] |= 1  # interframe bit
    with pytest.raises(ValueError, match="interframe"):
        decode_vp8_frame(bytes(d))
    d = bytearray(data)
    d[3] = 0  # start code
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_frame(bytes(d))
    with pytest.raises(ValueError):
        decode_vp8_frame(b"")
    with pytest.raises(ValueError, match="implausible|dimensions"):
        # 0-width frame (valid tag + start code, zero width field)
        decode_vp8_frame(bytes(data[:6]) + b"\x00\x00\x10\x00"
                         + bytes(32))


def test_mutation_fuzz_error_contract():
    """Any corruption either still decodes to SOME frame (arithmetic
    bits are self-delimiting) or raises ValueError — never another
    exception type, never > 2 s."""
    img = _img(32, 32, "bands")
    base, _ = encode_vp8_frame(img, qi=60, filter_level=15)
    r = np.random.default_rng(1)
    for trial in range(150):
        p = bytearray(base)
        op = trial % 3
        if op == 0:
            for _ in range(int(r.integers(1, 6))):
                p[int(r.integers(0, len(p)))] ^= 1 << int(
                    r.integers(0, 8))
        elif op == 1:
            p = p[: int(r.integers(4, len(p)))]
        else:
            i = int(r.integers(0, len(p)))
            p = p[:i] + bytes(int(r.integers(1, 12))) + p[i:]
        t0 = time.monotonic()
        try:
            decode_vp8_frame(bytes(p))
        except ValueError:
            pass
        assert time.monotonic() - t0 < 2.0


def test_lossy_animation_frames_gated():
    """Animated WebP with lossy VP8 frames: refused by default, decoded
    and composited under the round-trip opt-in."""
    from evolution_spark.operators.vp8 import encode_vp8_frame
    from evolution_spark.operators.webp import decode_webp_animation

    def anmf(x, y, w, h, dur, body, flags=0x02):
        payload = (x // 2).to_bytes(3, "little") \
            + (y // 2).to_bytes(3, "little") \
            + (w - 1).to_bytes(3, "little") \
            + (h - 1).to_bytes(3, "little") \
            + dur.to_bytes(3, "little") + bytes([flags])
        chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunk += b"\x00"
        payload += chunk
        out = b"ANMF" + len(payload).to_bytes(4, "little") + payload
        return out + (b"\x00" if len(payload) & 1 else b"")

    f0, e0 = encode_vp8_frame(_img(32, 32, "flat"), qi=10)
    f1, e1 = encode_vp8_frame(_img(16, 16, "grad"), qi=10)
    vp8x = (bytes([0x02]) + b"\x00\x00\x00"
            + (31).to_bytes(3, "little") + (31).to_bytes(3, "little"))
    chunks = (b"VP8X" + (10).to_bytes(4, "little") + vp8x
              + b"ANIM" + (6).to_bytes(4, "little")
              + (0xFF000000).to_bytes(4, "little") + b"\x00\x00"
              + anmf(0, 0, 32, 32, 40, f0)
              + anmf(8, 8, 16, 16, 60, f1))
    payload = (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
               + b"WEBP" + chunks)
    with pytest.raises(NotImplementedError, match="roundtrip"):
        decode_webp_animation(payload)
    tl = decode_webp_animation(payload, vp8="roundtrip")
    assert [d for d, _ in tl] == [40, 60]
    c0, c1 = tl[0][1], tl[1][1]
    assert c0.shape == (32, 32, 4) and (c0[..., 3] == 255).all()
    # frame 1 overwrote the 8..24 square; outside it frame 0 persists
    assert np.array_equal(c1[:8], c0[:8])
    # composited pixels match the decoders' own expected planes
    from evolution_spark.operators.vp8 import yuv420_to_rgb
    exp0 = yuv420_to_rgb(e0["y"], e0["u"], e0["v"])
    assert np.array_equal(c0[..., :3], exp0)
    exp1 = yuv420_to_rgb(e1["y"], e1["u"], e1["v"])
    assert np.array_equal(c1[8:24, 8:24, :3], exp1)


def test_coef_update_frames_refused():
    """Round-15 provenance guard: a frame whose header requests
    coefficient-probability updates is provably not from this
    module's encoder (which writes a 0 for every update flag), and
    COEF_UPDATE_PROBS is partly synthesized — such frames must be
    REFUSED, not decoded with unverified tables. Simulate an external
    stream by decoding a valid self-encoded frame with the update
    probabilities swapped to 1: the arithmetic decode then reads at
    least one update flag as 1, which must raise."""
    import evolution_spark.operators.vp8 as vp8mod

    data, _ = encode_vp8_frame(_img(32, 32, "grad"), qi=40)
    orig = vp8mod.COEF_UPDATE_PROBS
    fake = [[[[1] * 11 for _ in range(3)] for _ in range(8)]
            for _ in range(4)]
    vp8mod.COEF_UPDATE_PROBS = fake
    try:
        with pytest.raises(ValueError, match="probability updates"):
            decode_vp8_frame(data)
    finally:
        vp8mod.COEF_UPDATE_PROBS = orig


def test_used_synth_bmode_reporting():
    """used_synth_bmode is False for 16x16-mode frames (no B_PRED
    submode reads at all) and True when B_PRED submodes leave the
    single transcribed (B_DC, B_DC) context row."""
    flat, _ = encode_vp8_frame(_img(64, 64, "flat"), qi=0,
                               bpred_bias=float("inf"))
    assert decode_vp8_frame(flat)["used_synth_bmode"] is False
    noisy, _ = encode_vp8_frame(_img(64, 64, "noise"), qi=0)
    got = decode_vp8_frame(noisy)
    # the noise frame must actually exercise B_PRED for the assertion
    # to be meaningful; the SAD-per-pixel switch guarantees it here
    assert got["used_synth_bmode"] is True
