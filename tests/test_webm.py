"""WebM/Matroska EBML metadata walker (operators/webm.py).

Fixtures are hand-built spec-shaped EBML (build_webm emits real element
structure with filler clusters); expectations are closed-form from the
RFC 8794 VINT rules and the public Matroska element semantics."""
import pytest

from evolution_spark.operators.webm import (
    _enc_vint_size,
    _read_vint,
    build_webm,
    cue_index,
    parse_webm_metadata,
)


def test_vint_roundtrip_sizes():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 1 << 20, (1 << 28) - 2):
        enc = _enc_vint_size(v)
        got, pos = _read_vint(enc, 0, keep_marker=False)
        assert got == v and pos == len(enc)


def test_video_audio_tracks_and_duration():
    p = build_webm(
        duration_ticks=4500.0,
        video={"width": 320, "height": 180, "codec": "V_VP9"},
        audio={"rate": 48000, "channels": 2, "codec": "A_OPUS"},
        timestamp_scale_ns=1_000_000,
    )
    m = parse_webm_metadata(p)
    assert m["doctype"] == "webm"
    assert m["timestamp_scale_ns"] == 1_000_000
    assert m["duration_ticks"] == 4500.0
    assert m["duration_us"] == 4_500_000
    assert m["n_tracks"] == 2
    v, a = m["tracks"]
    assert v["track_type"] == 1 and v["codec_id"] == "V_VP9"
    assert v["width"] == 320 and v["height"] == 180
    assert a["track_type"] == 2 and a["codec_id"] == "A_OPUS"
    assert a["sample_rate"] == 48000 and a["channels"] == 2
    assert m["n_clusters"] == 2


def test_nonstandard_timestamp_scale():
    p = build_webm(duration_ticks=100.0, timestamp_scale_ns=500_000,
                   video={"width": 64, "height": 48})
    m = parse_webm_metadata(p)
    # 100 ticks * 0.5 ms = 50 ms
    assert m["duration_us"] == 50_000


def test_cue_index_points_inside_clusters():
    p = build_webm(
        duration_ticks=9000.0,
        video={"width": 64, "height": 48},
        cue_times=(0, 3000, 6000),
        n_clusters=3,
        cluster_bytes=100,
        seed=5,
    )
    cues = cue_index(p)
    assert [c[0] for c in cues] == [0, 3000, 6000]
    assert all(c[1] == 1 for c in cues)
    offs = [c[2] for c in cues]
    # strictly increasing cluster offsets ~100 bytes apart (+ headers)
    assert offs[0] < offs[1] < offs[2]
    assert offs[1] - offs[0] == offs[2] - offs[1]
    # each offset lands exactly on a Cluster element id within the
    # segment body
    from evolution_spark.operators.webm import _child

    b = bytes(p)
    seg = _child(b, 0, len(b), 0x18538067)
    for off in offs:
        assert b[seg[0] + off: seg[0] + off + 4] == b"\x1fC\xb6u"


def test_no_cues_returns_empty():
    p = build_webm(duration_ticks=10.0, video={"width": 16, "height": 16})
    assert cue_index(p) == []


def test_structural_refusals():
    with pytest.raises(ValueError, match="EBML"):
        parse_webm_metadata(b"\x00" * 32)
    p = build_webm(duration_ticks=10.0, video={"width": 16, "height": 16})
    with pytest.raises(ValueError, match="truncated|bounds"):
        parse_webm_metadata(p[: len(p) // 2])


def test_decode_media_refuses_webm_with_pointer():
    from evolution_spark.operators.multimodal import decode_media

    p = build_webm(duration_ticks=10.0, video={"width": 16, "height": 16})
    with pytest.raises(NotImplementedError, match="parse_webm_metadata"):
        decode_media(p, "video")
