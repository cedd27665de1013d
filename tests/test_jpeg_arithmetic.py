"""Arithmetic-coded JPEG (T.81 Annex D QM-coder + Annex F/G models).

Conformance strategy (no foreign arithmetic-JPEG sample exists in this
container — mainstream encoders never shipped arithmetic coding):
encoder/decoder ROUND-TRIP at every quality tier plus bit-identity
against the Huffman pipeline on the same quantized coefficients (the
coefficients are computed by the same DCT/quant front end, so a single
wrong binary decision anywhere in the QM coder or the statistical
models diverges the whole pixel plane), raw-coder property tests that
drive the Table D.3 state machine deep into its attack/steady states,
and exhaustive short-pattern checks."""

from __future__ import annotations

from itertools import product

import numpy as np
import pytest

from evolution_spark.operators.jpeg_arith import (
    _QE,
    _QMDecoder,
    _QMEncoder,
    decode_jpeg_arithmetic,
    encode_jpeg_arithmetic,
    encode_jpeg_arithmetic_progressive,
)
from evolution_spark.operators.multimodal import (
    decode_jpeg,
    decode_media,
    encode_jpeg,
)


def _test_image(h=48, w=64, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
        128 + 80 * np.cos(xx / 5.0),
        np.clip(xx * 3 + yy * 2, 0, 255),
    ], axis=-1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    img[8:16, 8:16] = rng.integers(0, 256, (8, 8, 3))
    return img


# ---------------------------------------------------------------- QM coder


def test_qe_table_shape():
    assert len(_QE) == 113
    assert all(0 < qe < 0x8000 for qe, *_ in _QE)
    assert all(0 <= nl <= 112 and 0 <= nm <= 112 for _, nl, nm, _ in _QE)
    # fast-attack entry states carry the MPS switch
    assert _QE[0][3] == 1


def test_raw_coder_roundtrip_random_and_skewed():
    rng = np.random.default_rng(7)
    for trial in range(12):
        nbins = 16
        ctxs = rng.integers(0, nbins, size=3000).tolist()
        if trial % 3 == 1:
            bits = (rng.random(3000) < 0.03).astype(int).tolist()
        elif trial % 3 == 2:
            bits = (rng.random(3000) < 0.97).astype(int).tolist()
        else:
            bits = rng.integers(0, 2, size=3000).tolist()
        enc = _QMEncoder()
        bank = bytearray(nbins)
        for b, cx in zip(bits, ctxs):
            enc.encode(bank, cx, int(b))
        data = enc.finish()
        dec = _QMDecoder(data)
        bank2 = bytearray(nbins)
        out = [dec.decode(bank2, cx) for cx in ctxs]
        assert out == [int(b) for b in bits], f"trial {trial}"
        assert bank == bank2  # same adaptive end state
    # skewed streams must actually compress (the adaptation works)
    enc = _QMEncoder()
    bank = bytearray(1)
    for _ in range(4000):
        enc.encode(bank, 0, 0)
    assert len(enc.finish()) < 40


def test_raw_coder_exhaustive_short_patterns():
    for pat in product((0, 1), repeat=11):
        enc = _QMEncoder()
        bank = bytearray(2)
        for i, b in enumerate(pat):
            enc.encode(bank, i % 2, b)
        data = enc.finish()
        dec = _QMDecoder(data)
        bank2 = bytearray(2)
        assert tuple(dec.decode(bank2, i % 2) for i in range(11)) == pat


def test_fixed_bin_interleaves_with_adaptive():
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 2, size=600).tolist()
    enc = _QMEncoder()
    bank = bytearray(4)
    for i, b in enumerate(seq):
        if i % 3 == 0:
            enc.encode_fixed(int(b))
        else:
            enc.encode(bank, i % 4, int(b))
    dec = _QMDecoder(enc.finish())
    bank2 = bytearray(4)
    out = [
        dec.decode_fixed() if i % 3 == 0 else dec.decode(bank2, i % 4)
        for i in range(600)
    ]
    assert out == [int(b) for b in seq]


def test_byte_stuffing_invariant():
    """Every 0xFF in the entropy output must be followed by 0x00 —
    otherwise the stream would alias a marker."""
    rng = np.random.default_rng(9)
    for trial in range(6):
        bits = (rng.random(5000) < 0.98).astype(int).tolist()
        enc = _QMEncoder()
        bank = bytearray(1)
        for b in bits:
            enc.encode(bank, 0, int(b))
        data = enc.finish()
        for i, byte in enumerate(data[:-1]):
            if byte == 0xFF:
                assert data[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
        dec = _QMDecoder(data)
        bank2 = bytearray(1)
        assert [dec.decode(bank2, 0) for _ in bits] == bits


# --------------------------------------------------------------- SOF9/SOF10


@pytest.mark.parametrize("quality", [30, 50, 75, 95])
def test_sof9_matches_huffman_pipeline(quality):
    """Arithmetic and Huffman code the SAME quantized coefficients —
    the decoded pixel planes must be bit-identical."""
    img = _test_image()
    dec = decode_jpeg_arithmetic(encode_jpeg_arithmetic(img, quality))
    ref = decode_jpeg(encode_jpeg(img, quality))
    assert np.array_equal(dec, ref)


def test_sof9_compresses_tighter_than_huffman():
    img = _test_image()
    assert len(encode_jpeg_arithmetic(img, 50)) < len(encode_jpeg(img, 50))


def test_sof9_grayscale():
    g = _test_image()[..., 0]
    dec = decode_jpeg_arithmetic(encode_jpeg_arithmetic(g, 50))
    ref = decode_jpeg(encode_jpeg(g, 50))
    assert dec.shape == g.shape
    assert np.array_equal(dec, ref)


def test_sof10_progressive_matches_sequential():
    img = _test_image(40, 56, seed=3)
    for quality in (30, 50, 90):
        seq = decode_jpeg_arithmetic(encode_jpeg_arithmetic(img, quality))
        pro = decode_jpeg_arithmetic(
            encode_jpeg_arithmetic_progressive(img, quality)
        )
        assert np.array_equal(pro, seq), f"quality {quality}"
    g = img[..., 2]
    assert np.array_equal(
        decode_jpeg_arithmetic(encode_jpeg_arithmetic_progressive(g, 50)),
        decode_jpeg_arithmetic(encode_jpeg_arithmetic(g, 50)),
    )


def test_restart_intervals_reset_coder_and_stats():
    img = _test_image(40, 72, seed=11)
    base = decode_jpeg_arithmetic(encode_jpeg_arithmetic(img, 50))
    for ri in (1, 3, 7):
        d = decode_jpeg_arithmetic(
            encode_jpeg_arithmetic(img, 50, restart_interval=ri)
        )
        assert np.array_equal(d, base), f"restart_interval {ri}"


def test_dac_conditioning_roundtrip():
    img = _test_image(40, 72, seed=11)
    base = decode_jpeg_arithmetic(encode_jpeg_arithmetic(img, 50))
    for cond, kx in (((0, 2), 16), ((1, 3), 1), ((0, 0), 63)):
        d = decode_jpeg_arithmetic(
            encode_jpeg_arithmetic(img, 50, dc_cond=cond, ac_kx=kx)
        )
        assert np.array_equal(d, base), (cond, kx)


def test_decode_jpeg_dispatches_sof9_and_sof10():
    img = _test_image(24, 24)
    via_dispatch = decode_jpeg(encode_jpeg_arithmetic(img, 50))
    direct = decode_jpeg_arithmetic(encode_jpeg_arithmetic(img, 50))
    assert np.array_equal(via_dispatch, direct)
    assert decode_jpeg(
        encode_jpeg_arithmetic_progressive(img, 50)
    ).shape == (24, 24, 3)
    # decode_media magic-byte dispatch
    flat = decode_media(encode_jpeg_arithmetic(img, 50), "image")
    assert flat.size == 24 * 24 * 3


def test_sof1_extended_sequential_decodes_as_baseline():
    """SOF1 is frame-identical to SOF0 at 8-bit — swap the marker in a
    baseline stream and the decode must not change."""
    img = _test_image(24, 32)
    payload = bytearray(encode_jpeg(img, 50))
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC1
    assert np.array_equal(decode_jpeg(bytes(payload)), decode_jpeg(
        encode_jpeg(img, 50)
    ))


def test_never_emitted_differential_variants_still_refuse():
    # SOF3 lossless decodes since round 11, SOF11 arithmetic-lossless
    # since round 12; the refusal surface is the never-emitted
    # differential variants outside a DHP stream
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg(img, 50))
    i = payload.find(b"\xff\xc0")
    for sof in (0xC5, 0xC7, 0xCF):
        payload[i + 1] = sof
        with pytest.raises(NotImplementedError, match="DHP"):
            decode_jpeg(bytes(payload))
    # a baseline stream RELABELED SOF11 is structurally wrong for the
    # lossless decoder (scan Ss=0 is no predictor) — loud ValueError
    payload[i + 1] = 0xCB
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(payload))


def test_corrupt_arithmetic_stream_errors_loudly():
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg_arithmetic(img, 50))
    # truncate the entropy data hard: zero-feed decodes garbage bits but
    # the magnitude-tree overflow guard must catch runaway magnitudes
    # rather than looping or silently corrupting — either a clean decode
    # (all-zero tail is a valid model input) or a loud ValueError
    cut = payload[: len(payload) // 2] + b"\xff\xd9"
    try:
        out = decode_jpeg_arithmetic(bytes(cut))
        assert out.shape == (16, 16, 3)
    except ValueError:
        pass


def test_12bit_precision_refuses():
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg_arithmetic(img, 50))
    i = payload.find(b"\xff\xc9")
    payload[i + 4] = 12  # precision byte
    with pytest.raises(ValueError, match="8-bit only"):
        decode_jpeg_arithmetic(bytes(payload))


def test_dac_redefinition_between_scans_is_scan_scoped():
    """T.81 B.2.4.4: a DAC (or DRI) segment between scans redefines
    conditioning for LATER scans only. Inject a DAC with a different Kx
    after the AC-first scans of a progressive stream — the refinement
    scans that follow never use Kx, so the decode must be unchanged; a
    last-wins global (the round-11 pass-4 finding) would re-decode the
    EARLIER AC-first scans with the wrong band split and corrupt them."""
    g = _test_image(24, 24)[..., 0]
    payload = encode_jpeg_arithmetic_progressive(g, 50)
    base = decode_jpeg_arithmetic(payload)
    # gray scan order: DC first, AC first, DC refine, AC refine — inject
    # before the 3rd SOS
    idx = -1
    for _ in range(3):
        idx = payload.find(b"\xff\xda", idx + 1)
        assert idx > 0
    inject = bytes([0xFF, 0xCC, 0x00, 0x04, 0x10, 63])  # DAC: AC tbl 0 Kx=63
    inject += bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x63])  # DRI=99 (unused)
    mutated = payload[:idx] + inject + payload[idx:]
    assert np.array_equal(decode_jpeg_arithmetic(mutated), base)
