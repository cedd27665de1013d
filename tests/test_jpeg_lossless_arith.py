"""Arithmetic lossless JPEG (SOF11, operators/jpeg_lossless_arith.py).

Losslessness gives the strongest oracle: decode(encode(x)) == x EXACTLY
for arbitrary input, across every predictor / precision / point
transform / restart / component shape, plus value identity with the
Huffman lossless codec on identical inputs."""
import numpy as np
import pytest

from evolution_spark.operators.jpeg_lossless_arith import (
    decode_jpeg_lossless_arith,
    encode_jpeg_lossless_arith,
)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(61)
    noise8 = rng.integers(0, 256, (21, 17), dtype=np.uint8)
    grad = ((np.arange(24)[:, None] * 3 + np.arange(31) * 5) % 256
            ).astype(np.uint8)
    flat = np.full((9, 9), 200, dtype=np.uint8)
    hi16 = rng.integers(0, 1 << 16, (12, 15)).astype(np.uint16)
    rgb = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    return noise8, grad, flat, hi16, rgb


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_roundtrip_every_predictor(predictor, imgs):
    for img in imgs:
        p = encode_jpeg_lossless_arith(img, predictor=predictor)
        got = decode_jpeg_lossless_arith(p)
        assert got.dtype == img.dtype
        assert np.array_equal(got, img), predictor


def test_precisions_and_point_transform(imgs):
    rng = np.random.default_rng(62)
    for prec in (2, 4, 12, 16):
        img = rng.integers(0, 1 << prec, (10, 14)).astype(
            np.uint8 if prec <= 8 else np.uint16)
        p = encode_jpeg_lossless_arith(img, precision=prec)
        assert np.array_equal(decode_jpeg_lossless_arith(p), img)
    # point transform: decoded samples are (sample >> pt) << pt
    img = imgs[0]
    p = encode_jpeg_lossless_arith(img, point_transform=2)
    got = decode_jpeg_lossless_arith(p)
    assert np.array_equal(got, (img >> 2) << 2)


def test_restart_intervals(imgs):
    img = imgs[1]
    for ri in (1, 7, 64):
        p = encode_jpeg_lossless_arith(img, restart_interval=ri)
        assert np.array_equal(decode_jpeg_lossless_arith(p), img), ri


def test_conditioning_bounds_roundtrip(imgs):
    for cond in ((0, 1), (0, 4), (2, 6)):
        p = encode_jpeg_lossless_arith(imgs[0], conditioning=cond)
        assert np.array_equal(decode_jpeg_lossless_arith(p), imgs[0])


def test_value_identity_with_huffman_lossless(imgs):
    """The predictive model is shared: both codecs must reconstruct the
    SAME samples from the same input under every predictor."""
    from evolution_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    for img in imgs[:3]:
        for sel in (1, 4, 7):
            a = decode_jpeg_lossless_arith(
                encode_jpeg_lossless_arith(img, predictor=sel))
            h = decode_jpeg_lossless(
                encode_jpeg_lossless(img, predictor=sel))
            assert np.array_equal(a, h), sel


def test_compresses_smooth_content(imgs):
    grad = imgs[1]
    coded = len(encode_jpeg_lossless_arith(grad, predictor=4))
    assert coded < grad.size  # QM adapts: smooth content beats raw


def test_decode_jpeg_and_decode_media_route_sof11(imgs):
    from evolution_spark.operators.multimodal import (
        decode_jpeg,
        decode_media,
    )

    img = imgs[0]
    p = encode_jpeg_lossless_arith(img)
    assert np.array_equal(decode_jpeg(p), img)
    flat = decode_media(p, "image")
    assert np.array_equal(
        flat.reshape(img.shape).astype(np.uint8), img)


def test_mutation_fuzz_error_contract(imgs):
    """Corrupt payloads raise ValueError (or NotImplementedError for
    reroutes to other declared gaps) — never IndexError/struct.error."""
    rng = np.random.default_rng(63)
    base = encode_jpeg_lossless_arith(imgs[0])
    for trial in range(300):
        b = bytearray(base)
        mode = trial % 3
        if mode == 0:
            b[rng.integers(0, len(b))] ^= rng.integers(1, 256)
        elif mode == 1:
            b = b[: rng.integers(2, len(b))]
        else:
            pos = rng.integers(0, len(b))
            b[pos: pos] = bytes(rng.integers(0, 256, rng.integers(1, 8)))
        try:
            out = decode_jpeg_lossless_arith(bytes(b))
            # arithmetic scans do not self-terminate: a mutated header
            # can still decode (garbage), which is fine — the contract
            # is no crash and the dimension guard bounding allocation
            assert out.size <= (1 << 26)
        except (ValueError, NotImplementedError):
            pass


def test_refusals():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_lossless_arith(b"\x00\x00")
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless_arith(img, predictor=9)
    with pytest.raises(ValueError, match="conditioning"):
        encode_jpeg_lossless_arith(img, conditioning=(5, 2))
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless_arith(
            np.full((4, 4), 300, dtype=np.int64), precision=8)
