"""FLAC codec (RFC 9639). Losslessness gives exact round-trip oracles
on arbitrary content — sine, noise, constants — across every subframe
type, stereo mode, bit depth, and residual shape."""

from __future__ import annotations

import numpy as np
import pytest

from evolution_spark.operators.flac import (
    _best_rice,
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _read_utf8_coded,
    _utf8_coded,
    decode_flac,
    encode_flac,
)
from evolution_spark.operators.multimodal import decode_media


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(31)
    t = np.arange(5000)
    sine = (10000 * np.sin(t / 20)).astype(np.int64)
    noise = rng.integers(-32768, 32768, 5000)
    mixed = (sine * 0.7 + noise * 0.1).astype(np.int64)
    return sine, noise, mixed


def test_mono_roundtrips(signals):
    for sig in signals:
        enc = encode_flac(sig, rate=22050)
        dec, rate = decode_flac(enc)
        assert rate == 22050
        assert np.array_equal(dec[:, 0], sig)


def test_smooth_content_compresses(signals):
    sine = signals[0]
    assert len(encode_flac(sine)) < 0.3 * (2 * len(sine))


@pytest.mark.parametrize(
    "method", ["independent", "left-side", "right-side", "mid-side", "auto"]
)
def test_stereo_modes(method, signals):
    sine, _noise, mixed = signals
    st = np.stack([mixed, (sine * 0.5).astype(np.int64)], axis=1)
    dec, _ = decode_flac(encode_flac(st, stereo_method=method))
    assert np.array_equal(dec, st)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lo, hi = -(1 << (bps - 1)), 1 << (bps - 1)
    sig = rng.integers(lo, hi, 3000)
    dec, _ = decode_flac(encode_flac(sig, bps=bps))
    assert np.array_equal(dec[:, 0], sig)


def test_multiframe_constant_and_short_tail(signals):
    mixed = signals[2]
    sig = np.concatenate(
        [np.full(5000, 1234), mixed, np.zeros(100)]
    ).astype(np.int64)
    dec, _ = decode_flac(encode_flac(sig, block_size=1024))
    assert np.array_equal(dec[:, 0], sig)


def test_crc_detects_corruption(signals):
    enc = bytearray(encode_flac(signals[2]))
    enc[len(enc) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|MD5|truncated|sync"):
        decode_flac(bytes(enc))


def test_truncation_at_every_frame_boundary_raises_value_error(signals):
    """ADVICE r11: a frame cut exactly after its header (or anywhere
    else) must raise ValueError, never IndexError — the mapInPandas
    error contract."""
    enc = encode_flac(signals[2], block_size=1024)
    # magic(4) + block hdr(4) + STREAMINFO(34) = 42; cut through frames
    for cut in range(42, len(enc), max(1, len(enc) // 60)):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])


def test_encode_flac_validates_block_size_and_rate(signals):
    """ADVICE r11: out-of-range STREAMINFO fields must refuse, not
    silently truncate through the masking bit-writer."""
    for bs in (8, 15, 65536):
        with pytest.raises(ValueError, match="block_size"):
            encode_flac(signals[0], block_size=bs)
    for rate in (0, 1 << 20, 1 << 24):
        with pytest.raises(ValueError, match="rate"):
            encode_flac(signals[0], rate=rate)
    # boundary values are legal
    decode_flac(encode_flac(signals[0][:40], block_size=16))
    decode_flac(encode_flac(signals[0][:40], rate=(1 << 20) - 1))


def test_md5_detects_metadata_tamper(signals):
    enc = bytearray(encode_flac(signals[0]))
    # STREAMINFO md5 starts at offset 4 (magic) + 4 (block hdr) + 18
    enc[4 + 4 + 18] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))


def test_not_flac_refuses():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_decode_media_dispatch(signals):
    payload = encode_flac(signals[0], rate=16000)
    flat = decode_media(payload, "audio")
    assert np.array_equal(flat.astype(np.int64), signals[0])


def test_utf8_coded_number_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, (1 << 21) - 1,
              1 << 21, (1 << 31) - 1):
        data = _utf8_coded(n)
        br = _BitReader(data)
        assert _read_utf8_coded(br) == n, n


def test_crc_vectors():
    # linearity/zero sanity + stability vectors for the two polynomials
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"\x00") == 0 and _crc16(b"\x00") == 0
    assert _crc8(b"123456789") == 0xF4   # CRC-8/ATM check value
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


def test_escape_partition_roundtrip():
    """Alternating extremes make rice coding pathological — the encoder
    switches to escape-coded raw residuals and the decoder must walk
    them."""
    sig = np.tile([-32768, 32767], 600).astype(np.int64)
    dec, _ = decode_flac(encode_flac(sig))
    assert np.array_equal(dec[:, 0], sig)


def test_partitioned_residuals_roundtrip():
    """A block whose halves have very different variance exercises
    partition order > 0 (per-partition rice parameters)."""
    rng = np.random.default_rng(7)
    quiet = rng.integers(-6, 6, 2048)
    loud = rng.integers(-30000, 30000, 2048)
    sig = np.concatenate([quiet, loud])
    enc = encode_flac(sig, block_size=4096)
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], sig)
    # the adaptive split should beat a single parameter noticeably
    assert len(enc) < len(encode_flac(np.concatenate([loud, loud])))


def test_best_rice_param_sane():
    assert _best_rice(np.zeros(100, dtype=np.int64)) == 0
    big = np.full(100, 1 << 20, dtype=np.int64)
    # the search caps at 14; huge uniform residuals must saturate it
    assert _best_rice(big) == 14


def test_lpc_path_used_and_exact(signals):
    """A long smooth sine is where LPC wins over fixed predictors; the
    stream must contain an LPC subframe (type byte >= 0x40 after the
    header pad bit) and still round-trip exactly."""
    sine = signals[0]
    enc = encode_flac(sine, block_size=4096)
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], sine)
