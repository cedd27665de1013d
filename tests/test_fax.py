"""CCITT fax codecs (operators/fax.py): MH RLE (T.4 1-D) and G4 (T.6
MMR). Anchored on published code words; conformance via prefix-freedom
checks and exact round-trips over adversarial bilevel content."""
import numpy as np
import pytest

from evolution_spark.operators.fax import (
    _BLACK_TERM,
    _EOL,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    check_tables,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)


def test_published_code_anchors_and_prefix_freedom():
    assert _WHITE_TERM[0] == "00110101"
    assert _WHITE_TERM[1] == "000111"
    assert _WHITE_TERM[63] == "00110100"
    assert _BLACK_TERM[0] == "0000110111"
    assert _BLACK_TERM[1] == "010"
    assert _WHITE_MAKEUP[64] == "11011"
    assert _WHITE_MAKEUP[1728] == "010011011"
    assert _EOL == "000000000001"
    check_tables()  # prefix-free per color class


def _fixtures(rng):
    checker = (np.add.outer(np.arange(23), np.arange(37)) % 2).astype(
        np.uint8)
    noise = (rng.random((31, 61)) < 0.35).astype(np.uint8)
    blocks = np.zeros((20, 80), dtype=np.uint8)
    blocks[3:9, 5:30] = 1
    blocks[12:18, 40:77] = 1
    sparse = np.zeros((8, 3000), dtype=np.uint8)  # long runs -> makeups
    sparse[:, 2900:2910] = 1
    all_white = np.zeros((5, 64), dtype=np.uint8)
    all_black = np.ones((5, 64), dtype=np.uint8)
    single_col = (rng.random((40, 1)) < 0.5).astype(np.uint8)
    return [checker, noise, blocks, sparse, all_white, all_black,
            single_col]


def test_mh_roundtrips():
    rng = np.random.default_rng(42)
    for img in _fixtures(rng):
        data = encode_mh(img)
        got = decode_mh(data, img.shape[1], img.shape[0])
        assert np.array_equal(got, img), img.shape


def test_g4_roundtrips():
    rng = np.random.default_rng(43)
    for img in _fixtures(rng):
        data = encode_g4(img)
        got = decode_g4(data, img.shape[1], img.shape[0])
        assert np.array_equal(got, img), img.shape


def test_g4_exercises_every_mode():
    """A crafted pair of rows forcing pass, horizontal, and all seven
    vertical codes; plus 200 random row-pairs as a mode fuzz."""
    rng = np.random.default_rng(44)
    # row 0 black runs at [4,10) and [20,22); row 1 shifted -3..+3 and
    # a run that vanishes (pass on the next) and a fresh far run (horiz)
    img = np.zeros((2, 64), dtype=np.uint8)
    img[0, 4:10] = 1
    img[0, 20:22] = 1
    img[1, 1:13] = 1
    img[1, 50:60] = 1
    assert np.array_equal(
        decode_g4(encode_g4(img), 64, 2), img)
    for _ in range(200):
        img = (rng.random((2, 48)) < rng.random()).astype(np.uint8)
        assert np.array_equal(decode_g4(encode_g4(img), 48, 2), img)


def test_long_makeup_runs():
    # runs above 2560 need repeated extended makeups
    img = np.zeros((2, 6000), dtype=np.uint8)
    img[0, 5990:] = 1
    img[1, :3000] = 1
    assert np.array_equal(decode_mh(encode_mh(img), 6000, 2), img)
    assert np.array_equal(decode_g4(encode_g4(img), 6000, 2), img)


def test_decode_refusals():
    with pytest.raises(ValueError, match="truncated|invalid"):
        decode_mh(b"\x00\x00", 64, 4)
    # all-ones IS decodable (V0 per row = all white); all-zeros is not
    assert decode_g4(b"\xff\xff\xff\xff", 16, 16).sum() == 0
    with pytest.raises(ValueError, match="invalid|truncated|overrun"):
        decode_g4(b"\x00\x00\x00\x00", 16, 16)
    # row overrun: a valid white-64 makeup + white-0 term on an 8-wide row
    img = np.zeros((1, 128), dtype=np.uint8)
    data = encode_mh(img)
    with pytest.raises(ValueError, match="overrun"):
        decode_mh(data, 8, 1)


def test_tiff_fax_integration():
    """Bilevel TIFF pages: MH (compression 2) and G4 (compression 4)
    round-trip through encode_tiff/decode_tiff with multi-strip coding
    and photometric normalization (1 = white); photometric-1 variant
    decodes identically; structural refusals fire."""
    from evolution_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(45)
    page = (rng.random((37, 53)) < 0.6).astype(np.uint8)  # 1 = white
    for compression in ("mh", "g4"):
        payload = encode_tiff(page, compression=compression,
                              rows_per_strip=10)
        got = decode_tiff(payload)
        assert got.dtype == np.uint8
        assert np.array_equal(got, page), compression
    # photometric 1 (BlackIsZero): flipping ONLY the tag (leaving the
    # coded strips untouched) flips the sample interpretation, so the
    # normalized (1 = white) decode is the INVERSE of the photo-0 image
    payload = bytearray(encode_tiff(page, compression="g4",
                                    rows_per_strip=100))
    i = payload.find(bytes([262 & 0xFF, 262 >> 8, 3, 0]))
    payload[i + 8] = 1
    assert np.array_equal(decode_tiff(bytes(payload)), 1 - page)
    # bilevel with a non-fax compression refuses
    q = bytearray(encode_tiff(page, compression="g4"))
    j = q.find(bytes([259 & 0xFF, 259 >> 8, 3, 0]))
    q[j + 8] = 1
    with pytest.raises(ValueError, match="bilevel"):
        decode_tiff(bytes(q))
    with pytest.raises(ValueError, match="0/1"):
        encode_tiff((page * 255).astype(np.uint8), compression="g4")
    with pytest.raises(ValueError, match="strip-only"):
        encode_tiff(page, compression="g4", tile_size=(16, 16))


def test_tiff_fax_decode_media_dispatch():
    from evolution_spark.operators.multimodal import decode_media
    from evolution_spark.operators.tiff import encode_tiff

    rng = np.random.default_rng(46)
    page = (rng.random((16, 24)) < 0.5).astype(np.uint8)
    flat = decode_media(encode_tiff(page, compression="g4"), "image")
    assert flat.shape == (16 * 24,)
    assert np.array_equal(flat.reshape(16, 24).astype(np.uint8), page)


@pytest.mark.parametrize("two_d", [False, True])
@pytest.mark.parametrize("fill", [False, True])
def test_t4_roundtrips(two_d, fill):
    from evolution_spark.operators.fax import decode_t4, encode_t4

    rng = np.random.default_rng(47)
    for img in _fixtures(rng):
        data = encode_t4(img, two_d=two_d, fill=fill)
        got = decode_t4(data, img.shape[1], img.shape[0], two_d=two_d)
        assert np.array_equal(got, img), (img.shape, two_d, fill)


def test_t4_eol_guard():
    from evolution_spark.operators.fax import decode_t4

    with pytest.raises(ValueError, match="EOL|truncated"):
        decode_t4(b"\xff\x00\x00", 16, 2)


@pytest.mark.parametrize("compression", ["t4", "t4_2d"])
def test_tiff_t4_integration(compression):
    """Compression 3 (T.4/G3) with T4Options: 1-D and 2-D variants
    round-trip through encode_tiff/decode_tiff; uncompressed-mode
    option refuses."""
    from evolution_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(48)
    page = (rng.random((25, 40)) < 0.5).astype(np.uint8)
    payload = encode_tiff(page, compression=compression,
                          rows_per_strip=9)
    assert np.array_equal(decode_tiff(payload), page)
    # T4Options bit 1 (uncompressed mode) refuses
    p = bytearray(payload)
    i = p.find(bytes([292 & 0xFF, 292 >> 8, 4, 0]))
    assert i > 0
    p[i + 8] |= 0b10
    with pytest.raises(ValueError, match="uncompressed mode"):
        decode_tiff(bytes(p))
