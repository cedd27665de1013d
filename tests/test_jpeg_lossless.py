"""Lossless JPEG (SOF3, T.81 Annex H). Losslessness gives the strongest
possible oracle: decode(encode(x)) == x EXACTLY for arbitrary input,
including pure noise — no tolerance, no closed form needed."""

from __future__ import annotations

import numpy as np
import pytest

from evolution_spark.operators.jpeg_lossless import (
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)
from evolution_spark.operators.multimodal import decode_jpeg, decode_media


@pytest.fixture(scope="module")
def noise8():
    return np.random.default_rng(13).integers(0, 256, (33, 47), dtype=np.uint8)


@pytest.mark.parametrize("sel", range(1, 8))
def test_all_predictors_lossless_8bit(sel, noise8):
    assert np.array_equal(
        decode_jpeg_lossless(encode_jpeg_lossless(noise8, predictor=sel)),
        noise8,
    )


@pytest.mark.parametrize("sel", [1, 4, 7])
def test_predictors_lossless_16bit(sel):
    g16 = (
        np.random.default_rng(5).integers(0, 65536, (21, 19))
        .astype(np.uint16)
    )
    out = decode_jpeg_lossless(encode_jpeg_lossless(g16, predictor=sel))
    assert out.dtype == np.uint16
    assert np.array_equal(out, g16)


def test_multi_component_interleaved():
    rgb = np.random.default_rng(7).integers(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_jpeg_lossless(encode_jpeg_lossless(rgb, predictor=4))
    assert out.shape == (17, 23, 3)
    assert np.array_equal(out, rgb)


@pytest.mark.parametrize("ri", [1, 5, 100])
def test_restart_intervals(ri, noise8):
    assert np.array_equal(
        decode_jpeg_lossless(
            encode_jpeg_lossless(noise8, predictor=6, restart_interval=ri)
        ),
        noise8,
    )


def test_point_transform():
    smooth = np.clip(
        np.add.outer(np.arange(40) * 3, np.arange(50) * 2), 0, 255
    ).astype(np.uint8)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(smooth, predictor=1, point_transform=2)
    )
    assert np.array_equal(out, (smooth >> 2) << 2)


def test_dispatch_through_decode_jpeg_and_decode_media(noise8):
    payload = encode_jpeg_lossless(noise8, predictor=4)
    assert np.array_equal(decode_jpeg(payload), noise8)
    flat = decode_media(payload, "image")
    assert flat.size == noise8.size
    assert np.array_equal(
        flat.reshape(noise8.shape).astype(np.uint8), noise8
    )


def test_smooth_content_compresses():
    smooth = np.clip(
        np.add.outer(np.arange(64) * 2, np.arange(64) * 2), 0, 255
    ).astype(np.uint8)
    assert len(encode_jpeg_lossless(smooth, predictor=4)) < smooth.size


def test_invalid_shapes_refuse(noise8):
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(noise8, predictor=0)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(noise8, precision=17)
    # subsampled lossless components refuse at decode
    payload = bytearray(encode_jpeg_lossless(noise8))
    i = payload.find(b"\xff\xc3")
    # component sampling byte: SOF3 body = [P, h16, w16, ncomp, cid, hv, tq]
    payload[i + 2 + 2 + 6 + 1] = 0x22
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_lossless(bytes(payload))


def test_differential_variants_still_refuse(noise8):
    payload = bytearray(encode_jpeg_lossless(noise8))
    i = payload.find(b"\xff\xc3")
    for sof in (0xC5, 0xC7, 0xCF):
        payload[i + 1] = sof
        with pytest.raises(NotImplementedError, match="DHP"):
            decode_jpeg(bytes(payload))
    # relabeled SOF11 (round 12): structurally parseable but the
    # Huffman entropy bits are garbage to the QM decoder — either a
    # loud ValueError or a garbage decode, never a crash
    payload[i + 1] = 0xCB
    try:
        out = decode_jpeg(bytes(payload))
        assert out.shape == noise8.shape
    except ValueError:
        pass


def test_point_transform_out_of_range_refuses(noise8):
    """review r11 pass 5: Pt >= P must refuse clearly on both sides, not
    crash with a negative-shift error."""
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(noise8, point_transform=8)
    payload = bytearray(encode_jpeg_lossless(noise8))
    i = payload.find(b"\xff\xda")
    # SOS body for 1 comp: [len16, ns, cid, tt, Ss, Se, AhAl]
    payload[i + 2 + 2 + 1 + 2 + 2] = 0x09  # Al = 9 >= P = 8
    with pytest.raises(ValueError, match="point transform"):
        decode_jpeg_lossless(bytes(payload))
