"""OGG page walker (operators/ogg.py). Fixtures hand-built per
RFC 3533 (pages, lacing, the spec CRC-32) and the Vorbis I / RFC 7845
id headers; expectations closed-form."""
import pytest

from evolution_spark.operators.ogg import (
    _ogg_crc,
    build_ogg,
    parse_ogg_metadata,
)


def test_crc_is_the_rfc3533_variant():
    # differs from zlib.crc32 (no reflection, zero init): spot values
    import zlib

    assert _ogg_crc(b"") == 0
    assert _ogg_crc(b"OggS") != zlib.crc32(b"OggS")
    # linearity sanity: one changed byte changes the CRC
    assert _ogg_crc(b"abc") != _ogg_crc(b"abd")


def test_vorbis_metadata_exact():
    p = build_ogg("vorbis", total_samples=44100 * 3, rate=44100,
                  channels=2, n_audio_pages=4)
    m = parse_ogg_metadata(p)
    assert m["codec"] == "vorbis" and m["channels"] == 2
    assert m["sample_rate"] == 44100 and m["pre_skip"] == 0
    assert m["n_pages"] == 6  # BOS + tags + 4 audio
    assert m["total_samples"] == 44100 * 3
    assert m["duration_us"] == 3_000_000


def test_opus_pre_skip_and_48k_granules():
    # input rate 16 kHz but granules run at 48 kHz per RFC 7845
    p = build_ogg("opus", total_samples=48000 * 2, rate=16000,
                  channels=1, pre_skip=312)
    m = parse_ogg_metadata(p)
    assert m["codec"] == "opus" and m["channels"] == 1
    assert m["sample_rate"] == 16000 and m["pre_skip"] == 312
    assert m["last_granule"] == 48000 * 2 + 312
    assert m["total_samples"] == 48000 * 2
    assert m["duration_us"] == 2_000_000


def test_corruption_and_structure_refusals():
    p = bytearray(build_ogg("vorbis", total_samples=1000, rate=8000))
    # flip one body byte -> page CRC catches it
    p[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_metadata(bytes(p))
    good = build_ogg("vorbis", total_samples=1000, rate=8000)
    with pytest.raises(ValueError, match="truncated|capture"):
        parse_ogg_metadata(good[: len(good) - 10])
    with pytest.raises(ValueError, match="capture"):
        parse_ogg_metadata(b"\x00" * 64)
    # dropping the EOS page (cut at last page boundary) refuses
    from evolution_spark.operators.ogg import _parse_page

    pos, pages = 0, []
    while pos < len(good):
        pg = _parse_page(good, pos)
        pages.append(pos)
        pos = pg["next"]
    with pytest.raises(ValueError, match="end-of-stream"):
        parse_ogg_metadata(good[: pages[-1]])


def test_sequence_gap_refuses():
    full = build_ogg("vorbis", total_samples=5000, rate=8000,
                     n_audio_pages=4)
    from evolution_spark.operators.ogg import _parse_page

    # remove the 3rd page entirely -> sequence gap
    pos, bounds = 0, []
    while pos < len(full):
        pg = _parse_page(full, pos)
        bounds.append((pos, pg["next"]))
        pos = pg["next"]
    cut = full[: bounds[2][0]] + full[bounds[2][1]:]
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_metadata(cut)


def test_decode_media_refuses_ogg_with_pointer():
    from evolution_spark.operators.multimodal import decode_media

    p = build_ogg("opus", total_samples=480, rate=48000)
    with pytest.raises(NotImplementedError, match="parse_ogg_metadata"):
        decode_media(p, "audio")
