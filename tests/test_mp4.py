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


def test_probe_media_mixed_corpus(spark):
    """One probe over a mixed corpus: every container yields its
    unified metadata row; a corrupt payload lands in `error` instead of
    failing the job."""
    import numpy as np
    import pandas as pd

    from evolution_spark.operators.flac import encode_flac
    from evolution_spark.operators.mp3 import build_mp3
    from evolution_spark.operators.multimodal import (
        encode_png,
        encode_wav,
        probe_media,
    )
    from evolution_spark.operators.ogg import build_ogg
    from evolution_spark.operators.webm import build_webm

    img = np.zeros((12, 20), dtype=np.uint8)
    sig = (1000 * np.sin(np.arange(4000) / 9)).astype(np.int64)
    payloads = {
        1: build_mp4([120] * 8, keyframe_every=2,
                     audio={"n": 10, "rate": 22050, "channels": 2,
                            "size": 32}),
        2: build_webm(duration_ticks=1500.0,
                      video={"width": 320, "height": 180}),
        3: build_mp3(10, bitrate_indices=9, pad_alternate=False),
        4: build_ogg("opus", total_samples=48000, rate=16000,
                     channels=1),
        5: encode_wav(np.stack([sig, sig], axis=1), sample_rate=8000),
        6: encode_flac(sig, rate=16000),
        7: encode_png(img),
        8: b"\x1a\x45\xdf\xa3 truncated garbage",
        9: b"completely unknown bytes",
    }
    df = spark.createDataFrame(pd.DataFrame({
        "media_id": list(payloads),
        "payload": list(payloads.values()),
    }))
    rows = {r["media_id"]: r for r in probe_media(df).collect()}
    assert rows[1]["container"] == "mp4" and rows[1]["kind"] == "video"
    assert rows[1]["codec"] == "avc1"
    assert rows[1]["sample_rate"] == 22050 and rows[1]["channels"] == 2
    assert rows[2]["container"] == "webm" and rows[2]["width"] == 320
    assert rows[2]["duration_us"] == 1_500_000
    assert rows[3]["container"] == "mp3"
    assert rows[3]["duration_us"] == 10 * 1152 * 1_000_000 // 44100
    assert rows[4]["container"] == "ogg" and rows[4]["codec"] == "opus"
    assert rows[4]["duration_us"] == 1_000_000
    assert rows[5]["container"] == "wav" and rows[5]["channels"] == 2
    assert rows[5]["duration_us"] == 4000 * 1_000_000 // 8000
    assert rows[6]["container"] == "flac"
    assert rows[7]["container"] == "png"
    assert rows[7]["width"] == 20 and rows[7]["height"] == 12
    assert rows[8]["error"] and rows[8]["container"] is None
    assert rows[9]["error"] and rows[9]["n_bytes"] == 24


def test_walker_mutation_fuzz_error_contract():
    """review r12 pass 10: corrupt payloads (bit flips, truncations,
    splices) must raise ValueError quickly — never struct.error /
    TypeError / unbounded allocation (the mapInPandas error contract;
    a corrupt stsz count previously tried to allocate billions of
    entries)."""
    import time

    import numpy as np

    from evolution_spark.operators.mp3 import (
        build_mp3,
        parse_mp3_metadata,
    )
    from evolution_spark.operators.ogg import build_ogg, parse_ogg_metadata
    from evolution_spark.operators.webm import (
        build_webm,
        parse_webm_metadata,
    )

    rng = np.random.default_rng(5)
    cases = [
        (build_mp4([100 + (f % 5) * 10 for f in range(12)],
                   keyframe_every=3,
                   audio={"n": 20, "rate": 22050, "channels": 2,
                          "size": 40}),
         lambda p: (parse_mp4_metadata(p), keyframe_index(p))),
        (build_mp3(10, bitrate_indices=[1 + (i % 8) for i in range(10)],
                   id3v2=b"x" * 30), parse_mp3_metadata),
        (build_webm(duration_ticks=3000.0,
                    video={"width": 64, "height": 48},
                    cue_times=(0, 1000, 2000), n_clusters=3),
         parse_webm_metadata),
        (build_ogg("vorbis", total_samples=20000, rate=16000),
         parse_ogg_metadata),
    ]
    for base, parse in cases:
        for trial in range(300):
            b = bytearray(base)
            mode = trial % 3
            if mode == 0:
                b[rng.integers(0, len(b))] ^= rng.integers(1, 256)
            elif mode == 1:
                b = b[: rng.integers(0, len(b))]
            else:
                pos = rng.integers(0, len(b))
                b[pos: pos] = bytes(
                    rng.integers(0, 256, rng.integers(1, 12)))
            t0 = time.perf_counter()
            try:
                parse(bytes(b))
            except ValueError:
                pass
            assert time.perf_counter() - t0 < 1.0


def test_keyframe_index_validates_stss_numbers():
    """review r13 (ADVICE): stss sample number 0 previously indexed
    offsets[-1] silently; out-of-range numbers raised IndexError. Both
    must be loud ValueErrors."""
    p = build_mp4(_sizes(10, seed=2), keyframe_every=4,
                  samples_per_chunk=3)
    i = p.index(b"stss")
    # entries start after type(4) + version/flags(4) + count(4)
    for bad in (0, 10_001):
        b = bytearray(p)
        b[i + 12: i + 16] = bad.to_bytes(4, "big")
        with pytest.raises(ValueError, match="stss sample number"):
            keyframe_index(bytes(b))


def test_sample_layout_validates_stsc_runs():
    """review r13 (ADVICE): stsc runs referencing chunks beyond the
    stco count (or non-increasing first_chunk) must ValueError, not
    IndexError."""
    from evolution_spark.operators.mp4 import _sample_layout

    with pytest.raises(ValueError, match="beyond"):
        _sample_layout([10] * 6, [(5, 2)], [0, 100])
    with pytest.raises(ValueError, match="strictly increasing"):
        _sample_layout([10] * 6, [(1, 2), (1, 3)], [0, 100, 200])
    # in-container: patch the single stsc run's first_chunk sky-high
    p = build_mp4(_sizes(9), samples_per_chunk=3)
    i = p.index(b"stsc")
    b = bytearray(p)
    b[i + 12: i + 16] = (900).to_bytes(4, "big")
    with pytest.raises(ValueError, match="beyond"):
        keyframe_index(bytes(b))


def test_probe_wav_reads_fmt_tag_and_bits():
    """review r13 (ADVICE): the WAV probe must honour wFormatTag and
    wBitsPerSample — 24-bit PCM and float32 get correct durations and
    codec labels; unrecognized formats refuse loudly."""
    from evolution_spark.operators.multimodal import probe_one_payload

    def wav(tag, bits, ch, rate, n_frames):
        frame = ch * (bits // 8)
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + tag.to_bytes(2, "little") + ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * frame).to_bytes(4, "little")
               + frame.to_bytes(2, "little")
               + bits.to_bytes(2, "little"))
        body = bytes(n_frames * frame)
        data = b"data" + len(body).to_bytes(4, "little") + body
        return (b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little")
                + b"WAVE" + fmt + data)

    # 24-bit PCM: 8000 frames @ 16 kHz -> exactly 500 ms
    got = probe_one_payload(wav(1, 24, 2, 16000, 8000))
    assert got[2] == "pcm_s24le" and got[5] == 500_000
    # float32 mono
    got = probe_one_payload(wav(3, 32, 1, 8000, 4000))
    assert got[2] == "pcm_f32le" and got[5] == 500_000 and got[7] == 1
    # 8-bit unsigned
    got = probe_one_payload(wav(1, 8, 1, 8000, 800))
    assert got[2] == "pcm_u8" and got[5] == 100_000
    # unrecognized: a-law (tag 6) and 12-bit PCM both refuse
    import pytest as _pytest
    with _pytest.raises(ValueError, match="format tag"):
        probe_one_payload(wav(6, 8, 1, 8000, 100))
    with _pytest.raises(ValueError, match="format tag"):
        probe_one_payload(wav(1, 12, 1, 8000, 100))


def test_heif_avif_metadata():
    """HEIF/AVIF (ISO 23008-12) item-structure walk — round 13: the
    ipma association picks the PRIMARY item's ispe over a larger
    thumbnail, brands map to codec families, and probe_media
    classifies instead of erroring on the missing moov."""
    from evolution_spark.operators.mp4 import (
        build_heif,
        is_heif_brand,
        parse_heif_metadata,
    )
    from evolution_spark.operators.multimodal import probe_one_payload

    p = build_heif("heic", 640, 480)
    assert is_heif_brand(p)
    m = parse_heif_metadata(p)
    assert (m["brand"], m["codec"], m["width"], m["height"]) == (
        "heic", "hevc", 640, 480)
    # primary selection: a LARGER thumb ispe must not win over ipma
    m = parse_heif_metadata(build_heif("avif", 100, 80,
                                       thumb=(800, 600)))
    assert (m["codec"], m["width"], m["height"]) == ("av1", 100, 80)
    assert m["n_ispe"] == 2
    got = probe_one_payload(build_heif("avif", 320, 200))
    assert got[:5] == ("avif", "image", "av1", 320, 200)
    got = probe_one_payload(build_heif("mif1", 32, 16))
    assert got[:3] == ("heif", "image", None)
    with pytest.raises(ValueError, match="ftyp brand"):
        parse_heif_metadata(build_mp4(_sizes(4)))
    with pytest.raises(ValueError, match="meta box"):
        parse_heif_metadata(build_heif("heic", 8, 8)[:24])


def test_heif_mutation_fuzz_error_contract():
    """round 13: the HEIF walker honors the same ValueError/bounded
    time contract as every other container parser."""
    import time

    import numpy as np

    from evolution_spark.operators.mp4 import build_heif, \
        parse_heif_metadata

    rng = np.random.default_rng(17)
    base = build_heif("avif", 320, 200, thumb=(64, 40))
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
            parse_heif_metadata(bytes(b))
        except ValueError:
            pass
        assert time.perf_counter() - t0 < 1.0


def test_wav_sub_byte_bits_refuses_not_crashes():
    """round 14 (ADVICE): a fmt chunk with bits-per-sample < 8 (4-bit
    IMA/MS ADPCM, tags 17/2) made ``bits // 8 == 0`` and raised
    ZeroDivisionError in the data-chunk math — escaping the probe's
    ValueError quarantine and failing the whole task. Validation now
    runs before any frame arithmetic."""
    import pytest

    from evolution_spark.operators.multimodal import probe_one_payload

    def wav(tag, bits, ch, rate, data_size):
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + tag.to_bytes(2, "little") + ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * ch).to_bytes(4, "little")
               + ch.to_bytes(2, "little")
               + bits.to_bytes(2, "little"))
        data = b"data" + data_size.to_bytes(4, "little") + bytes(data_size)
        return (b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little")
                + b"WAVE" + fmt + data)

    # 4-bit IMA ADPCM (tag 17) and MS ADPCM (tag 2): ValueError, not
    # ZeroDivisionError
    for tag, bits in ((17, 4), (2, 4), (1, 0)):
        with pytest.raises(ValueError, match="unrecognized"):
            probe_one_payload(wav(tag, bits, 2, 8000, 256))
    # zero channels with valid bits: quarantined too, not a crash
    got_exc = None
    try:
        probe_one_payload(wav(1, 16, 0, 8000, 256))
    except ValueError as e:
        got_exc = e
    assert got_exc is not None
