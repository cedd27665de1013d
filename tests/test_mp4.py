"""MP4/ISO-BMFF container metadata walker (operators/mp4.py).

Fixtures are hand-built spec-shaped containers (build_mp4 emits real
box structure with filler mdat bytes); expectations are closed-form
from the ISO 14496-12 sample-table arithmetic."""
import pytest

from evolution_spark.operators.mp4 import (
    build_mp4,
    keyframe_index,
    parse_mp4_metadata,
)


def _sizes(n, seed=0):
    return [100 + ((seed + f) % 7) * 10 for f in range(n)]


def test_video_only_metadata():
    sizes = _sizes(11, seed=3)
    p = build_mp4(sizes, keyframe_every=3, samples_per_chunk=4,
                  width=128, height=96, video_timescale=600,
                  video_delta=100)
    m = parse_mp4_metadata(p)
    assert m["brand"] == "isom" and m["n_tracks"] == 1
    assert m["timescale"] == 1000
    # movie duration = 11*100 ticks @600 -> ms
    assert m["duration"] == 11 * 100 * 1000 // 600
    t = m["tracks"][0]
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert t["track_id"] == 1
    assert t["width"] == 128 and t["height"] == 96
    assert t["timescale"] == 600 and t["duration"] == 1100
    assert t["duration_us"] == 1100 * 1_000_000 // 600
    assert t["n_samples"] == 11 and t["stts_duration"] == 1100
    assert t["n_keyframes"] == 4  # samples 1, 4, 7, 10
    assert t["sync_samples"] == [1, 4, 7, 10]
    assert t["n_chunks"] == 3  # 4 + 4 + 3


def test_keyframe_offsets_exact():
    sizes = _sizes(10, seed=1)
    p = build_mp4(sizes, keyframe_every=4, samples_per_chunk=3)
    (kfs,) = keyframe_index(p)
    # keyframes at samples 1, 5, 9 (0-based 0, 4, 8)
    assert [k[0] for k in kfs] == [1, 5, 9]
    # chunks are contiguous in mdat, so each sample's offset is the
    # mdat data start plus the prefix sum of preceding sample sizes
    base = kfs[0][1]
    for num, off, size in kfs:
        assert off - base == sum(sizes[: num - 1])
        assert size == sizes[num - 1]
    # the offsets point inside the payload
    assert all(off + size <= len(p) for _, off, size in kfs)


def test_audio_track_all_sync_and_stsd_fields():
    sizes = _sizes(8)
    p = build_mp4(sizes, audio={"n": 30, "rate": 22050, "channels": 2,
                                "size": 64})
    m = parse_mp4_metadata(p)
    assert m["n_tracks"] == 2
    a = m["tracks"][1]
    assert a["handler"] == "soun" and a["codec"] == "mp4a"
    assert a["track_id"] == 2
    assert a["channels"] == 2 and a["sample_rate"] == 22050
    assert a["n_samples"] == 30
    assert a["sync_samples"] is None and a["n_keyframes"] == 30
    assert a["timescale"] == 22050 and a["duration"] == 30 * 256
    # movie duration covers the longer track
    v_ms = 8 * 100 * 1000 // 600
    a_ms = 30 * 256 * 1000 // 22050
    assert m["duration"] == max(v_ms, a_ms)
    # audio chunk offsets start after every video byte
    (kfs,) = keyframe_index(p)
    video_end = kfs[0][1] + sum(sizes)
    assert min(a["chunk_offsets"]) >= video_end


def test_structural_refusals():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_metadata(b"\x00" * 64)
    p = build_mp4(_sizes(6))
    with pytest.raises(ValueError, match="truncated|bounds"):
        parse_mp4_metadata(p[: len(p) // 3])
    # corrupt a box size -> out of bounds
    bad = bytearray(p)
    bad[0] = 0xFF
    with pytest.raises(ValueError, match="bounds"):
        parse_mp4_metadata(bytes(bad))


def test_decode_media_refuses_mp4_with_pointer():
    from evolution_spark.operators.multimodal import decode_media

    p = build_mp4(_sizes(6))
    with pytest.raises(NotImplementedError, match="parse_mp4_metadata"):
        decode_media(p, "video")


def test_sample_keyframe_ranges_operator(spark):
    """Spark-side plumbing for distributed keyframe range-reads: MP4
    rows carry exact (offset, size); WebM rows carry cue offsets with
    next-cue spans; non-container payloads drop out."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.multimodal import sample_keyframe_ranges
    from evolution_spark.operators.webm import build_webm

    sizes = _sizes(12, seed=2)
    mp4 = build_mp4(sizes, keyframe_every=2, samples_per_chunk=5)
    webm = build_webm(
        duration_ticks=6000.0, video={"width": 64, "height": 48},
        cue_times=(0, 2000, 4000), n_clusters=3, cluster_bytes=80,
    )
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2, 3],
            "payload": [mp4, webm, b"not a container"],
        })
    )
    rows = sample_keyframe_ranges(df, n_frames=3).orderBy(
        "media_id", "frame_idx"
    ).collect()
    mp4_rows = [r for r in rows if r["media_id"] == 1]
    webm_rows = [r for r in rows if r["media_id"] == 2]
    assert not [r for r in rows if r["media_id"] == 3]
    # MP4: keyframes at samples 1,3,5,7,9,11 -> picks 0, 2(idx), last
    assert len(mp4_rows) == 3
    (kfs,) = keyframe_index(mp4)
    base = kfs[0][1]
    for r in mp4_rows:
        assert r["container"] == "mp4"
        num = r["time_ticks"]
        assert r["byte_offset"] - base == sum(sizes[: num - 1])
        assert r["n_bytes"] == sizes[num - 1]
        assert r["byte_offset"] + r["n_bytes"] <= len(mp4)
    # WebM: 3 cues, consecutive spans equal (same cluster sizes)
    assert [r["time_ticks"] for r in webm_rows] == [0, 2000, 4000]
    assert webm_rows[0]["n_bytes"] == webm_rows[1]["n_bytes"] == 85
    assert webm_rows[2]["n_bytes"] is None
