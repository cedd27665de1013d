"""APNG timeline decode (operators/apng.py): grouping, compositing,
dispose/blend ops, sequence validation, fuzz contract."""
import time

import numpy as np
import pytest

from evolution_spark.operators.apng import (
    build_apng,
    decode_apng,
    is_apng,
)
from evolution_spark.operators.multimodal import encode_png


def _base():
    return np.full((12, 16, 3), 50, dtype=np.uint8)


def test_timeline_placement_dispose_blend():
    f2 = np.full((4, 4, 4), (10, 20, 30, 128), dtype=np.uint8)
    p = build_apng(
        [{"img": _base(), "delay_ms": 40},
         {"img": np.full((6, 8, 3), 200, dtype=np.uint8),
          "x": 4, "y": 2, "delay_ms": 50, "dispose": 1},
         {"img": f2, "delay_ms": 60, "blend": 1}],
        canvas=(16, 12),
    )
    assert is_apng(p) and not is_apng(encode_png(_base()))
    tl = decode_apng(p)
    assert [d for d, _ in tl] == [40, 50, 60]
    c0, c1, c2 = (c for _, c in tl)
    assert (c0[..., :3] == 50).all()
    assert tuple(c1[2, 4, :3]) == (200, 200, 200)
    assert tuple(c2[2, 4]) == (0, 0, 0, 0)   # dispose-1 cleared
    sa, da = 128, 255
    den = sa * 255 + da * (255 - sa)
    er = ((10 * sa * 255 + 50 * da * (255 - sa)) * 2 + den) // (2 * den)
    assert c2[0, 0, 0] == er and c2[0, 0, 3] == 255


def test_dispose_previous():
    p = build_apng(
        [{"img": _base(), "delay_ms": 10},
         {"img": np.full((4, 4, 3), 255, dtype=np.uint8),
          "x": 2, "y": 2, "delay_ms": 10, "dispose": 2},
         {"img": np.full((2, 2, 3), 7, dtype=np.uint8),
          "x": 10, "y": 8, "delay_ms": 10}],
        canvas=(16, 12),
    )
    tl = decode_apng(p)
    c1, c2 = tl[1][1], tl[2][1]
    assert tuple(c1[2, 2, :3]) == (255, 255, 255)
    # dispose-2 reverted the white rect to the prior canvas
    assert tuple(c2[2, 2, :3]) == (50, 50, 50)
    assert tuple(c2[8, 10, :3]) == (7, 7, 7)


def test_plain_png_and_refusals():
    tl = decode_apng(encode_png(_base()))
    assert len(tl) == 1 and tl[0][0] == 0
    p = bytearray(build_apng(
        [{"img": _base()}, {"img": np.zeros((2, 2, 3), dtype=np.uint8),
                            "x": 2, "y": 2}], canvas=(16, 12)))
    i = p.find(b"fdAT")
    p[i + 4: i + 8] = (99).to_bytes(4, "big")   # corrupt sequence
    with pytest.raises(ValueError, match="sequence"):
        decode_apng(bytes(p))
    with pytest.raises(ValueError, match="full-canvas"):
        build_apng([{"img": np.zeros((2, 2, 3), dtype=np.uint8)}],
                   canvas=(16, 12))


def test_sample_frames_apng(spark):
    from evolution_spark.operators.multimodal import sample_frames

    frames = [{"img": np.full((4, 6, 3), i * 40, dtype=np.uint8),
               "delay_ms": 10} for i in range(5)]
    frames[0]["img"] = np.full((4, 6, 3), 0, dtype=np.uint8)
    p = build_apng(frames, canvas=(6, 4))
    df = spark.createDataFrame([(1, "video", bytearray(p))],
                               "media_id long, kind string, payload binary")
    rows = sample_frames(df, n_frames=3, fake=False).collect()
    assert len(rows) == 3
    last = np.frombuffer(rows[-1].frame, dtype=np.uint8).reshape(4, 6, 3)
    assert last[0, 0, 0] == 160


def test_mutation_fuzz_error_contract():
    rng = np.random.default_rng(23)
    base = build_apng(
        [{"img": _base()}, {"img": np.full((4, 4, 3), 9, np.uint8),
                            "x": 0, "y": 0, "blend": 1}],
        canvas=(16, 12))
    for trial in range(300):
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
            decode_apng(bytes(b))
        except ValueError:
            pass
        assert time.perf_counter() - t0 < 1.0


def test_16bit_png_composites_high_byte():
    """round 14 (ADVICE): _to_rgba assigned uint16 decode output into
    a uint8 canvas, silently keeping the LOW byte (0xFF00 -> 0). 16-bit
    samples must downscale by the high byte."""
    img = np.zeros((4, 4, 3), dtype=np.uint16)
    img[..., 0] = 0xFF00  # red: high byte 0xFF, low byte 0x00
    img[..., 1] = 0x00FF  # green: high byte 0x00
    img[..., 2] = 0x8081  # ~mid: high byte 0x80
    tl = decode_apng(encode_png(img))
    assert len(tl) == 1
    c = tl[0][1]
    assert c.dtype == np.uint8
    assert tuple(c[0, 0]) == (0xFF, 0x00, 0x80, 255)
    # 16-bit gray+alpha: alpha high byte survives too
    ga = np.zeros((2, 2, 2), dtype=np.uint16)
    ga[..., 0] = 0xABCD
    ga[..., 1] = 0x7F00
    c2 = decode_apng(encode_png(ga))[0][1]
    assert tuple(c2[0, 0]) == (0xAB, 0xAB, 0xAB, 0x7F)
