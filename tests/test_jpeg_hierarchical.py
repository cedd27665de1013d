"""Hierarchical JPEG (DHP + SOF5/SOF7 differential frames, T.81 §13 /
Annex J). The encoder ends every pyramid with a LOSSLESS differential
frame, so grayscale pyramids reproduce the input EXACTLY — even on
noise, even with a lossy DCT base and lossy DCT intermediate levels —
which is the strongest oracle available without a foreign fixture."""

from __future__ import annotations

import numpy as np
import pytest

from evolution_spark.operators.jpeg_hier import (
    decode_jpeg_hierarchical,
    encode_jpeg_hierarchical,
    expand_reference,
)
from evolution_spark.operators.multimodal import decode_jpeg, decode_media


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(21).integers(0, 256, (32, 48), dtype=np.uint8)


def test_expand_reference_filter():
    # Annex J: even copies, odd averages with rounding, edge replicated
    a = np.array([[0, 10], [20, 30]])
    assert expand_reference(a, True, True).tolist() == [
        [0, 5, 10, 10],
        [10, 15, 20, 20],
        [20, 25, 30, 30],
        [20, 25, 30, 30],
    ]
    assert expand_reference(a, True, False).tolist() == [
        [0, 5, 10, 10], [20, 25, 30, 30],
    ]


def test_two_level_lossless_base_exact(noise):
    p = encode_jpeg_hierarchical(noise, levels=2, dct_base=False)
    assert np.array_equal(decode_jpeg_hierarchical(p), noise)


@pytest.mark.parametrize("quality", [30, 50, 90])
def test_three_level_dct_base_exact(quality):
    g = np.random.default_rng(4).integers(0, 256, (40, 64), dtype=np.uint8)
    p = encode_jpeg_hierarchical(g, levels=3, dct_base=True, quality=quality)
    # lossy base + lossy DCT intermediate + lossless final = exact
    assert np.array_equal(decode_jpeg_hierarchical(p), g)


def test_color_pyramid_within_ycc_rounding():
    rgb = np.random.default_rng(9).integers(0, 256, (24, 32, 3), dtype=np.uint8)
    d = decode_jpeg_hierarchical(encode_jpeg_hierarchical(rgb, levels=2))
    assert d.shape == rgb.shape
    assert np.max(np.abs(d.astype(int) - rgb.astype(int))) <= 2


def test_dispatch_through_decode_jpeg_and_decode_media(noise):
    p = encode_jpeg_hierarchical(noise, levels=2)
    assert np.array_equal(decode_jpeg(p), noise)
    flat = decode_media(p, "image")
    assert np.array_equal(flat.reshape(noise.shape).astype(np.uint8), noise)


def test_unaligned_dimensions_refuse(noise):
    with pytest.raises(ValueError, match="divisible"):
        encode_jpeg_hierarchical(noise[:31], levels=2)


def test_differential_frame_outside_dhp_refuses(noise):
    from evolution_spark.operators.multimodal import encode_jpeg

    payload = bytearray(encode_jpeg(noise, 50))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="SOF5"):
        decode_jpeg(bytes(payload))


def test_unsupported_hierarchical_frame_modes_refuse(noise):
    p = bytearray(encode_jpeg_hierarchical(noise, levels=2, dct_base=False))
    i = p.find(b"\xff\xc3")  # lossless base frame marker
    assert i > 0
    p[i + 1] = 0xCB  # arithmetic lossless
    with pytest.raises(NotImplementedError, match="SOF11"):
        decode_jpeg_hierarchical(bytes(p))


def test_16bit_hierarchical_refuses_instead_of_clipping(noise):
    """review r11 pass 5: a 16-bit lossless pyramid must refuse, not
    silently clip to uint8 (the composition path is 8-bit; standalone
    SOF3 carries 16-bit)."""
    p = bytearray(encode_jpeg_hierarchical(noise, levels=2, dct_base=False))
    i = p.find(b"\xff\xc3")
    p[i + 4] = 16  # precision byte of the base frame
    with pytest.raises(ValueError, match="precision 16"):
        decode_jpeg_hierarchical(bytes(p))


def test_frame_without_scan_raises_value_error(noise):
    """review r11 pass 5: truncation after a frame header must surface
    as ValueError, not IndexError."""
    p = encode_jpeg_hierarchical(noise, levels=2, dct_base=False)
    i = p.find(b"\xff\xda")  # first SOS
    truncated = p[:i] + b"\xff\xd9"
    with pytest.raises(ValueError, match="one scan"):
        decode_jpeg_hierarchical(truncated)
