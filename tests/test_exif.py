"""EXIF extraction (operators/exif.py): IFD walk, sub-IFD, container
embeds, error contract."""
import numpy as np
import pytest

from evolution_spark.operators.exif import (
    build_exif,
    embed_exif_jpeg,
    embed_exif_webp,
    parse_exif,
)
from evolution_spark.operators.multimodal import decode_jpeg, encode_jpeg
from evolution_spark.operators.webp import decode_webp, encode_webp


def _full():
    return build_exif(orientation=6, make="CamCo", model="X100",
                      datetime="2026:01:02 03:04:05",
                      datetime_original="2025:12:31 23:59:59",
                      pixel_xy=(4032, 3024))


def test_tiff_buffer_roundtrip():
    m = parse_exif(_full())
    assert m["orientation"] == 6 and m["model"] == "X100"
    assert m["datetime_original"] == "2025:12:31 23:59:59"
    assert (m["exif_width"], m["exif_height"]) == (4032, 3024)
    assert not m["has_gps"]
    # minimal block: orientation only, no sub-IFD
    m = parse_exif(build_exif(orientation=3))
    assert m["orientation"] == 3 and m["datetime_original"] is None


def test_jpeg_and_webp_embeds_parse_and_still_decode():
    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    ex = _full()
    j = embed_exif_jpeg(encode_jpeg(img, 70), ex)
    assert parse_exif(j)["make"] == "CamCo"
    decode_jpeg(j)                       # APP1 does not break decode
    wp = embed_exif_webp(encode_webp(img), ex)
    assert parse_exif(wp)["exif_width"] == 4032
    assert np.array_equal(decode_webp(wp)[..., :3], img)
    assert parse_exif(encode_jpeg(img, 70)) is None
    assert parse_exif(encode_webp(img)) is None


def test_error_contract():
    with pytest.raises(ValueError, match="JPEG, WebP, or TIFF"):
        parse_exif(b"\x89PNG\r\n\x1a\n" + bytes(20))
    # corrupt orientation value
    ex = bytearray(_full())
    i = ex.find((0x0112).to_bytes(2, "little"))
    ex[i + 8] = 99
    with pytest.raises(ValueError, match="orientation"):
        parse_exif(bytes(ex))
    # fuzz: mutations must ValueError or parse, never crash
    import time

    rng = np.random.default_rng(3)
    base = embed_exif_jpeg(
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 70), _full())
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
            parse_exif(bytes(b))
        except ValueError:
            pass
        assert time.perf_counter() - t0 < 1.0
