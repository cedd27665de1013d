"""MP3 frame-header metadata walker (operators/mp3.py).

Fixtures are hand-built frame sequences (build_mp3 is a structural
fixture generator, not an encoder); expectations are closed-form from
the ISO 11172-3 / 13818-3 header tables."""
import pytest

from evolution_spark.operators.mp3 import (
    _frame_length,
    build_mp3,
    parse_mp3_metadata,
)


def test_cbr_mpeg1_layer3_stereo():
    # 44100 Hz, idx 9 = 128 kbps, 10 frames of 1152 samples
    p = build_mp3(10, version="1", layer=3, bitrate_indices=9,
                  sr_idx=0, mode=0, pad_alternate=False)
    m = parse_mp3_metadata(p)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["channel_mode"] == "stereo"
    assert m["n_frames"] == 10 and m["total_samples"] == 11520
    assert m["duration_us"] == 11520 * 1_000_000 // 44100
    assert m["bitrate_kbps_min"] == m["bitrate_kbps_max"] == 128
    assert m["bitrate_kbps_sum"] == 1280 and not m["vbr"]
    assert not (m["has_id3v2"] or m["has_id3v1"] or m["has_xing"])
    # frame length: 144 * 128000 / 44100 = 417 (padding 0)
    assert len(p) == 10 * _frame_length(0b11, 3, 128, 44100, 0)


def test_vbr_padding_and_tags():
    idxs = [1 + (i % 8) for i in range(12)]
    p = build_mp3(12, version="1", layer=3, bitrate_indices=idxs,
                  sr_idx=1, mode=1, pad_alternate=True,
                  id3v2=b"\x00" * 77, id3v1=True)
    m = parse_mp3_metadata(p)
    assert m["vbr"] and m["n_frames"] == 12
    assert m["sample_rate"] == 48000
    assert m["channel_mode"] == "joint_stereo" and m["channels"] == 2
    kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112]
    assert m["bitrate_kbps_sum"] == sum(kbps[i] for i in idxs)
    assert m["bitrate_kbps_min"] == 32 and m["bitrate_kbps_max"] == 112
    assert m["has_id3v2"] and m["has_id3v1"]


@pytest.mark.parametrize("version,layer,sr_idx,rate,spf", [
    ("1", 1, 0, 44100, 384),
    ("1", 2, 2, 32000, 1152),
    ("2", 3, 0, 22050, 576),
    ("2", 2, 1, 24000, 1152),
    ("2.5", 3, 2, 8000, 576),
    ("2.5", 1, 0, 11025, 384),
])
def test_versions_layers_samples_per_frame(version, layer, sr_idx, rate,
                                           spf):
    p = build_mp3(6, version=version, layer=layer, bitrate_indices=5,
                  sr_idx=sr_idx, mode=3)
    m = parse_mp3_metadata(p)
    assert m["version"] == version and m["layer"] == layer
    assert m["sample_rate"] == rate and m["channels"] == 1
    assert m["total_samples"] == 6 * spf
    assert m["duration_us"] == 6 * spf * 1_000_000 // rate


def test_xing_tag_detected_mpeg1_and_mpeg2():
    for version, mode in (("1", 0), ("1", 3), ("2", 0), ("2.5", 3)):
        p = build_mp3(9, version=version, layer=3, bitrate_indices=11,
                      mode=mode, xing=True)
        m = parse_mp3_metadata(p)
        assert m["has_xing"] and m["xing_frames"] == 9


def test_xing_offset_shifts_past_frame_crc():
    """A protected frame (protection bit 0) carries a 2-byte CRC between
    header and side info; the Xing tag sits 2 bytes later."""
    p = bytearray(build_mp3(4, bitrate_indices=9, mode=3,
                            pad_alternate=False, xing=True))
    # make frame 0 protected: flag the CRC, insert 2 CRC bytes after the
    # header, drop 2 filler bytes at the frame end (slot count unchanged)
    flen = _frame_length(0b11, 3, 128, 44100, 0)
    frame0 = p[:flen]
    frame0[1] &= 0xFE  # protection bit 0 = CRC present
    body = frame0[4:]
    # shift the Xing area: re-plant the tag 2 bytes later
    off = 17  # mono MPEG-1 side-info size
    body[off: off + 12] = b"\x00" * 12
    shifted = bytes(frame0[:4]) + b"\x00\x00" + bytes(body[:-2])
    shifted = bytearray(shifted)
    shifted[4 + 2 + off: 4 + 2 + off + 4] = b"Xing"
    shifted[4 + 2 + off + 4: 4 + 2 + off + 8] = (1).to_bytes(4, "big")
    shifted[4 + 2 + off + 8: 4 + 2 + off + 12] = (4).to_bytes(4, "big")
    m = parse_mp3_metadata(bytes(shifted) + bytes(p[flen:]))
    assert m["has_xing"] and m["xing_frames"] == 4


def test_truncated_final_frame_not_counted():
    p = build_mp3(5, bitrate_indices=9, pad_alternate=False)
    flen = _frame_length(0b11, 3, 128, 44100, 0)
    m = parse_mp3_metadata(p[: len(p) - flen // 2])
    assert m["n_frames"] == 4


def test_refusals_are_value_errors():
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_metadata(b"\x00" * 64)
    with pytest.raises(ValueError, match="free-format"):
        # header with bitrate index 0
        parse_mp3_metadata(bytes([0xFF, 0xFB, 0x00, 0x00]) + bytes(400))
    with pytest.raises(ValueError, match="no MP3 frame data"):
        parse_mp3_metadata(b"TAG" + bytes(125))
    with pytest.raises(ValueError, match="reserved MPEG version"):
        parse_mp3_metadata(bytes([0xFF, 0xEB, 0x90, 0x00]) + bytes(400))
    # mid-stream parameter change: 2nd frame at a different sample rate
    a = build_mp3(2, sr_idx=0, pad_alternate=False)
    b = build_mp3(2, sr_idx=1, pad_alternate=False)
    with pytest.raises(ValueError, match="mid-stream"):
        parse_mp3_metadata(a + b)


def test_id3v2_syncsafe_and_footer():
    body = bytes(200)
    p = build_mp3(3, id3v2=body)
    m = parse_mp3_metadata(p)
    assert m["has_id3v2"] and m["n_frames"] == 3
    # corrupt the syncsafe size (high bit set) -> ValueError
    bad = bytearray(p)
    bad[6] |= 0x80
    with pytest.raises(ValueError, match="syncsafe"):
        parse_mp3_metadata(bytes(bad))


def test_decode_media_refuses_mp3_with_pointer():
    from evolution_spark.operators.multimodal import decode_media

    p = build_mp3(3)
    for payload in (p, build_mp3(3, id3v2=b"\x00" * 10)):
        with pytest.raises(NotImplementedError, match="parse_mp3_metadata"):
            decode_media(payload, "audio")


def test_id3v2_text_frames():
    """ID3v2.3/2.4 text frames decode across all four declared text
    encodings; the tag composes with the frame walker."""
    from evolution_spark.operators.mp3 import build_id3v2, parse_id3v2_tags

    frames = {"TIT2": "Ünïcode Title", "TPE1": "Artist/名前",
              "TALB": "Album", "TCON": "Ambient"}
    for version in (3, 4):
        encodings = (0, 1, 3) if version == 3 else (0, 1, 2, 3)
        for enc in encodings:
            use = dict(frames)
            if enc == 0:  # latin-1 cannot carry CJK
                use["TPE1"] = "Artist"
            tag = build_id3v2(use, version=version, encoding=enc)
            got = parse_id3v2_tags(tag + build_mp3(2, pad_alternate=False))
            for k, v in use.items():
                assert got[k] == v, (version, enc, k)
            assert got["_version"] == f"2.{version}"
    # the same payload still walks as MP3
    tag = build_id3v2(frames)
    m = parse_mp3_metadata(tag + build_mp3(3, pad_alternate=False))
    assert m["has_id3v2"] and m["n_frames"] == 3
    # no tag -> {}
    assert parse_id3v2_tags(build_mp3(2, pad_alternate=False)) == {}


def test_id3v2_corruption_refuses():
    from evolution_spark.operators.mp3 import build_id3v2, parse_id3v2_tags

    tag = bytearray(build_id3v2({"TIT2": "x"}))
    tag[10] = 0x01  # malformed frame id byte
    with pytest.raises(ValueError, match="frame id"):
        parse_id3v2_tags(bytes(tag))
    tag2 = bytearray(build_id3v2({"TIT2": "hello"}, padding=0))
    # frame size overruns the tag
    tag2[14] = 0x7F
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_id3v2_tags(bytes(tag2))


def test_id3v22_text_frames():
    """round 13: v2.2 3-byte-id frames parse (was presence-only) and
    normalize to the v2.3 key names the curation joins use."""
    import pytest

    from evolution_spark.operators.mp3 import parse_id3v2_tags

    def v22(frames, pad=8):
        body = bytearray()
        for fid, text in frames:
            raw = bytes([0]) + text.encode("latin-1")
            body += fid + len(raw).to_bytes(3, "big") + raw
        body += bytes(pad)
        sz = len(body)
        return (b"ID3" + bytes([2, 0, 0])
                + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                         (sz >> 7) & 0x7F, sz & 0x7F]) + bytes(body))

    tag = v22([(b"TT2", "Old Song"), (b"TP1", "Old Band"),
               (b"TAL", "Old Album"), (b"TXX", "other")])
    got = parse_id3v2_tags(tag + b"\xff\xfb" + bytes(40))
    assert got["_version"] == "2.2"
    assert got["TIT2"] == "Old Song" and got["TPE1"] == "Old Band"
    assert got["TALB"] == "Old Album"
    assert got["TXX"] == "other"      # unmapped id kept raw
    # utf-16 with BOM
    body = b"TT2" + (1 + len("héllo".encode("utf-16"))).to_bytes(3, "big") \
        + bytes([1]) + "héllo".encode("utf-16")
    sz = len(body)
    tag = (b"ID3" + bytes([2, 0, 0])
           + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F]) + body)
    assert parse_id3v2_tags(tag)["TIT2"] == "héllo"
    # refusals: bad encoding byte, overrun
    bad = v22([(b"TT2", "x")])
    i = bad.find(b"TT2") + 6
    b2 = bytearray(bad)
    b2[i] = 3                          # utf-8 is not a v2.2 encoding
    with pytest.raises(ValueError, match="encoding"):
        parse_id3v2_tags(bytes(b2))
    with pytest.raises(ValueError, match="overruns"):
        parse_id3v2_tags(v22([(b"TT2", "x")], pad=0)[:-2])


def test_id3_frame_id_rejects_punctuation_bytes():
    """round 14 (ADVICE): frame-id validation accepted ':;<=>?@'
    (0x3A-0x40) via the single contiguous 0x30-0x5A range; only
    A-Z / 0-9 are valid id characters in every ID3v2 version."""
    from evolution_spark.operators.mp3 import build_id3v2, parse_id3v2_tags

    # v2.3: corrupt a valid id with ':' (0x3A) — must refuse
    tag = bytearray(build_id3v2({"TIT2": "x"}))
    tag[10] = 0x3A
    with pytest.raises(ValueError, match="frame id"):
        parse_id3v2_tags(bytes(tag))
    # v2.2: same byte in a 3-byte id
    raw = bytes([0]) + b"t"
    body = b":T2" + len(raw).to_bytes(3, "big") + raw
    sz = len(body)
    v22 = (b"ID3" + bytes([2, 0, 0])
           + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F]) + body)
    with pytest.raises(ValueError, match="frame id"):
        parse_id3v2_tags(v22)
    # boundary sanity: digits and A-Z still pass
    tag2 = build_id3v2({"TIT2": "ok"})
    assert parse_id3v2_tags(tag2)["TIT2"] == "ok"
