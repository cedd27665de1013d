"""GIF codec (GIF89a spec, LZW). GIF is palette-lossless — exact
round-trips for any image with <= 256 distinct colors, frame-for-frame
for animations."""

from __future__ import annotations

import numpy as np
import pytest

from evolution_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from evolution_spark.operators.multimodal import decode_media


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(41)
    return (rng.integers(0, 5, (37, 53, 3)) * 60).astype(np.uint8)


def test_lzw_pair_roundtrips():
    rng = np.random.default_rng(1)
    cases = [
        [0, 1, 2, 3, 0, 1, 2, 3],
        [0] * 20,
        [0, 0, 0, 1, 1, 1] * 6,
        rng.integers(0, 4, 500).tolist(),
        rng.integers(0, 120, 2000).tolist(),
        rng.integers(0, 250, 9000).tolist(),  # 12-bit codes + dict reset
    ]
    for seq in cases:
        mcs = max(2, int(max(seq)).bit_length())
        assert _lzw_decode(mcs, _lzw_encode(mcs, seq), len(seq)) == seq


def test_static_roundtrip(img):
    frames, delays = decode_gif(encode_gif(img))
    assert frames.shape == (1, 37, 53, 3)
    assert np.array_equal(frames[0], img)
    assert delays == [0] or delays == [10]


def test_interlaced_roundtrip(img):
    frames, _ = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(frames[0], img)


def test_large_image_dict_growth():
    rng = np.random.default_rng(2)
    big = (rng.integers(0, 6, (120, 200, 3)) * 40).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(big))
    assert np.array_equal(frames[0], big)


def test_full_256_color_palette():
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[..., 0] = np.arange(256).reshape(16, 16)
    frames, _ = decode_gif(encode_gif(grad))
    assert np.array_equal(frames[0], grad)


def test_animation_roundtrip(img):
    anim = np.stack([np.roll(img, s, axis=1) for s in range(0, 25, 5)])
    frames, delays = decode_gif(encode_gif(anim, delays_cs=[7, 8, 9, 10, 11]))
    assert np.array_equal(frames, anim)
    assert delays == [7, 8, 9, 10, 11]


def test_too_many_colors_refuses():
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(noisy)


def test_magic_refusal():
    with pytest.raises(ValueError, match="GIF87a/GIF89a"):
        decode_gif(b"\x89PNG....")


def test_decode_media_dispatch(img):
    flat = decode_media(encode_gif(img), "image")
    assert np.array_equal(
        flat.reshape(img.shape).astype(np.uint8), img
    )


def test_sample_frames_real_gif(spark, img):
    from evolution_spark.operators.multimodal import sample_frames

    anim = np.stack([np.roll(img, s, axis=0) for s in range(0, 40, 4)])
    payload = encode_gif(anim)  # 10 frames
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), "image/gif", 53, 37, 100)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    rows = sample_frames(df, n_frames=4, fake=False).collect()
    assert len(rows) == 4
    for i, r in enumerate(rows):
        assert r["frame_idx"] == i
        got = np.frombuffer(r["frame"], dtype=np.uint8).reshape(img.shape)
        # evenly sampled across the 10-frame timeline: 0, 3, 6, 9
        assert np.array_equal(got, anim[[0, 3, 6, 9][i]])


def test_transparency_and_disposal_composite():
    """A frame with a transparent hole shows the previous canvas
    through it; disposal=2 restores background before the next frame."""
    base = np.full((8, 8, 3), 200, dtype=np.uint8)
    overlay = np.zeros((8, 8, 3), dtype=np.uint8)
    overlay[2:6, 2:6] = 90
    # hand-build: frame1 = base (opaque), frame2 = overlay with color 0
    # transparent outside the patch
    colors = np.array([[0, 0, 0], [200, 200, 200], [90, 90, 90]],
                      dtype=np.uint8)
    from evolution_spark.operators.gif import _lzw_encode as enc

    out = bytearray(b"GIF89a")
    out += (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
    out += bytes([0x80 | 1, 0, 0])  # global table 4 entries, bg 0
    table = np.zeros((4, 3), dtype=np.uint8)
    table[:3] = colors
    out += table.tobytes()

    def frame(idx_grid, transparent=None):
        o = bytearray()
        flags = 1 if transparent is not None else 0
        o += bytes([0x21, 0xF9, 4, flags, 0, 0,
                    transparent or 0, 0])
        o += b"\x2c" + bytes(4)
        o += (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
        o += bytes([0])
        data = enc(2, idx_grid.reshape(-1).tolist())
        o += bytes([2])
        for off in range(0, len(data), 255):
            chunk = data[off: off + 255]
            o += bytes([len(chunk)]) + chunk
        o += b"\x00"
        return o

    g1 = np.full((8, 8), 1, dtype=np.int64)
    g2 = np.zeros((8, 8), dtype=np.int64)
    g2[2:6, 2:6] = 2
    out += frame(g1)
    out += frame(g2, transparent=0)
    out += b"\x3b"
    frames, _ = decode_gif(bytes(out))
    assert np.array_equal(frames[0], base)
    expect = base.copy()
    expect[2:6, 2:6] = 90
    assert np.array_equal(frames[1], expect)


def test_truncated_payloads_raise_value_error(img):
    """review r11 pass 6: corrupt scraped payloads must surface as the
    ValueError contract, not raw IndexError/numpy errors."""
    payload = encode_gif(img)
    for cut in (8, 14, 20, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_oversized_frame_rect_clips(img):
    """A frame rect past the logical screen clips like mainstream
    decoders instead of crashing (review r11 pass 6)."""
    payload = bytearray(encode_gif(img))  # 53x37 screen
    # shrink the LOGICAL SCREEN to 40x30: frame now overhangs
    payload[6:8] = (40).to_bytes(2, "little")
    payload[8:10] = (30).to_bytes(2, "little")
    frames, _ = decode_gif(bytes(payload))
    assert frames.shape == (1, 30, 40, 3)
    assert np.array_equal(frames[0], img[:30, :40])
