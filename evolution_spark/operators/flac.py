"""FLAC audio codec (RFC 9639 / the public FLAC format spec), pure
numpy/stdlib — no soundfile/libFLAC in this container.

Extends the multimodal audio surface beyond PCM WAV to the dominant
lossless audio container real training corpora carry. REAL decode of
the full subframe surface — CONSTANT, VERBATIM, FIXED (orders 0-4) and
LPC (any order, quantized coefficients + shift), rice/rice2 residuals
with partitioning and escape codes, wasted bits, and all four channel
assignments (independent, left-side, right-side, mid-side) — plus
STREAMINFO validation and the three frame CRCs (CRC-8 header, CRC-16
frame, MD5 of the decoded PCM). The matching encoder (fixed + LPC via
Levinson-Durbin analysis, mid-side decision, rice parameter search)
gives every decode path a hermetic fixture; losslessness means
decode(encode(x)) == x EXACTLY for arbitrary input — the same
strongest-oracle strategy as the lossless JPEG module.

Scale shape: like the other codecs, decode is per-payload inside
Arrow-batched ``mapInPandas`` — audio bytes never shuffle. The entropy
loop is bit-serial by nature (rice codes are self-delimiting), so this
is a scalar-Python completeness path; WAV stays the vectorized fast
path. Measured envelope (BASELINE v4.9): ~140 ms per MB of decoded
PCM — a payload longer than ~1 MB PCM crosses 100 ms, so cap Arrow
batch sizes accordingly for multi-MB audio. Ref parity: the reference
has no audio codecs (extension surface)."""

from __future__ import annotations

import hashlib

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)  # n zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_coded(n: int) -> bytes:
    """The frame header's UTF-8-style coded number."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid coded number in FLAC frame header")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b >> 6 != 0b10:
            raise ValueError("invalid coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


_BLOCKSIZE_CODES = {
    192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011, 4096: 0b1100,
    8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to ``(samples (n, channels) int32, rate)`` —
    the WAV decoder's contract. Validates STREAMINFO geometry, every
    frame's CRC-8/CRC-16, and the stream MD5 when present."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1: pos + 4], "big")
        body = payload[pos + 4: pos + 4 + size]
        pos += 4 + size
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, channels, bps, total, md5)
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    rate, channels, bps, total, md5 = info

    out = []
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        block, pos = _decode_frame(payload, pos, info)
        out.append(block)
        got += block.shape[0]
    samples = (
        np.concatenate(out, axis=0) if out
        else np.zeros((0, channels), dtype=np.int32)
    )
    if total:
        samples = samples[:total]
    if md5 != b"\x00" * 16:
        dig = hashlib.md5(_pcm_bytes(samples, bps)).digest()
        if dig != md5:
            raise ValueError("FLAC stream MD5 mismatch (corrupt audio)")
    return samples.astype(np.int32), rate


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Channel-interleaved little-endian PCM, the MD5 input per spec.
    Vectorized (review r11 pass 6: the per-sample int.to_bytes loop was
    ~180x slower and sat on every encode AND decode)."""
    flat = samples.astype(np.int64).reshape(-1)
    nbytes = (bps + 7) // 8
    if nbytes == 1:
        return (flat & 0xFF).astype("<u1").tobytes()
    if nbytes == 2:
        return flat.astype("<i2").tobytes()
    # 3-byte samples: little-endian int32 with the high byte dropped
    raw = np.frombuffer(
        flat.astype("<i4").tobytes(), dtype=np.uint8
    ).reshape(-1, 4)
    return raw[:, :3].tobytes()


def _decode_frame(payload: bytes, pos: int, info):
    rate, channels, bps, _total, _md5 = info
    hdr_start = pos
    br = _BitReader(payload, pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError(f"bad FLAC frame sync at byte {pos}")
    br.read(1)  # reserved
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    br.read(1)  # reserved
    _read_utf8_coded(br)  # frame/sample number
    if bs_code == 0b0110:
        blocksize = br.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = br.read(16) + 1
    else:
        inv = {v: k for k, v in _BLOCKSIZE_CODES.items()}
        if bs_code not in inv:
            raise ValueError(f"reserved blocksize code {bs_code:04b}")
        blocksize = inv[bs_code]
    if sr_code == 0b1100:
        br.read(8)
    elif sr_code in (0b1101, 0b1110):
        br.read(16)
    elif sr_code == 0b1111:
        raise ValueError("invalid FLAC sample-rate code 1111")
    if bps_code != 0:
        inv_bps = {v: k for k, v in _BPS_CODES.items()}
        if bps_code not in inv_bps:
            raise ValueError(f"reserved bps code {bps_code:03b}")
        if inv_bps[bps_code] != bps:
            raise ValueError("frame bps differs from STREAMINFO")
    assert br.bit == 0
    if br.byte >= len(payload):
        raise ValueError("FLAC frame truncated before header CRC-8")
    if _crc8(payload[hdr_start: br.byte]) != payload[br.byte]:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    br.byte += 1

    if ch_code <= 0b0111:
        nch = ch_code + 1
        if nch != channels:
            raise ValueError("frame channel count differs from STREAMINFO")
        chans = [
            _decode_subframe(br, blocksize, bps) for _ in range(nch)
        ]
    elif ch_code in (0b1000, 0b1001, 0b1010):
        if channels != 2:
            raise ValueError("stereo decorrelation in a non-stereo stream")
        left_bits = bps + (1 if ch_code == 0b1001 else 0)
        right_bits = bps + (1 if ch_code in (0b1000, 0b1010) else 0)
        a = _decode_subframe(br, blocksize, left_bits)
        b = _decode_subframe(br, blocksize, right_bits)
        if ch_code == 0b1000:  # left-side: a=left, b=side
            left, right = a, a - b
        elif ch_code == 0b1001:  # right-side: a=side, b=right
            left, right = a + b, b
        else:  # mid-side
            side = b
            mid = (a << 1) | (side & 1)
            left = (mid + side) >> 1
            right = (mid - side) >> 1
        chans = [left, right]
    else:
        raise ValueError(f"reserved channel assignment {ch_code:04b}")
    br.align()
    if br.byte + 2 > len(payload):
        raise ValueError("FLAC frame truncated before frame CRC-16")
    crc = int.from_bytes(payload[br.byte: br.byte + 2], "big")
    if _crc16(payload[hdr_start: br.byte]) != crc:
        raise ValueError("FLAC frame CRC-16 mismatch")
    br.byte += 2
    return np.stack(chans, axis=1), br.byte


def _decode_subframe(br: _BitReader, blocksize: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bits -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bits)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [br.read_signed(bits) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [br.read_signed(bits) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            out[i] = resid[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [br.read_signed(bits) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is forbidden")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    return out << wasted


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


# ---------------------------------------------------------------- encoder


def _rice_cost(resid: np.ndarray, param: int) -> int:
    u = (resid.astype(np.int64) << 1) ^ (resid.astype(np.int64) >> 63)
    return int(np.sum(u >> param)) + len(u) * (1 + param)


def _best_rice(resid: np.ndarray) -> int:
    best, bp = None, 0
    for param in range(15):
        c = _rice_cost(resid, param)
        if best is None or c < best:
            best, bp = c, param
    return bp


def _write_partition(bw: _BitWriter, resid: np.ndarray) -> None:
    """One rice partition: best 4-bit parameter, or the escape code with
    raw fixed-width residuals when that is cheaper (pathological noise)."""
    param = _best_rice(resid)
    rice_bits = _rice_cost(resid, param)
    raw = int(np.max(np.abs(resid))).bit_length() + 1 if len(resid) else 1
    raw = min(raw, 31)
    if 5 + raw * len(resid) < rice_bits:
        bw.write(0b1111, 4)  # escape
        bw.write(raw, 5)
        for v in resid:
            bw.write(int(v), raw)
        return
    bw.write(param, 4)
    for v in resid:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _write_residual(bw: _BitWriter, resid: np.ndarray, order: int,
                    blocksize: int) -> None:
    """Rice-coded residual with a small partition-order search (0-2):
    partitioned parameters adapt to non-stationary blocks and give the
    decoder's partition walk real fixtures."""
    bw.write(0, 2)  # coding method: rice, 4-bit params

    def cost(porder: int) -> int | None:
        nparts = 1 << porder
        if blocksize % nparts or blocksize // nparts <= order:
            return None
        total, off = 0, 0
        for p in range(nparts):
            n = blocksize // nparts - (order if p == 0 else 0)
            part = resid[off: off + n]
            off += n
            total += 4 + _rice_cost(part, _best_rice(part))
        return total

    best_p, best_c = 0, None
    for porder in (0, 1, 2):
        c = cost(porder)
        if c is not None and (best_c is None or c < best_c):
            best_p, best_c = porder, c
    bw.write(best_p, 4)
    nparts = 1 << best_p
    off = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        _write_partition(bw, resid[off: off + n])
        off += n


def _lpc_analyze(x: np.ndarray, order: int):
    """Levinson-Durbin over the autocorrelation; returns float LPC
    coefficients (prediction of x[i] from previous ``order`` samples)."""
    n = len(x)
    xf = x.astype(np.float64)
    ac = np.array([
        float(np.dot(xf[: n - k], xf[k:])) for k in range(order + 1)
    ])
    if ac[0] == 0:
        return None
    err = ac[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(coefs[:i], ac[i:0:-1][:i])
        k = acc / err
        coefs[i] = k
        coefs[:i] = coefs[:i] - k * coefs[:i][::-1]
        err *= 1 - k * k
        if err <= 0:
            return None
    return coefs


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bits: int,
                     try_lpc: bool = True) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bits)
        return
    # candidate: best fixed predictor by residual magnitude
    best = None
    for order, coefs in _FIXED_COEFS.items():
        if order >= n:
            break
        resid = x[order:].copy()
        for j, c in enumerate(coefs):
            resid -= c * x[order - 1 - j: n - 1 - j]
        cost = int(np.sum(np.abs(resid)))
        if best is None or cost < best[0]:
            best = (cost, order, resid, None)
    # candidate: LPC order 8
    if try_lpc and n > 64:
        order = 8
        fc = _lpc_analyze(x, order)
        if fc is not None:
            prec = 14
            shift = 12
            q = np.clip(
                np.round(fc * (1 << shift)), -(1 << (prec - 1)),
                (1 << (prec - 1)) - 1,
            ).astype(np.int64)
            pred = np.zeros(n - order, dtype=np.int64)
            for j in range(order):
                pred += q[j] * x[order - 1 - j: n - 1 - j]
            resid = x[order:] - (pred >> shift)
            cost = int(np.sum(np.abs(resid)))
            if cost < best[0]:
                best = (cost, order, resid, (q, prec, shift))
    _cost, order, resid, lpc = best
    bw.write(0, 1)
    if lpc is None:
        bw.write(8 + order, 6)  # FIXED
        bw.write(0, 1)  # no wasted bits
        for v in x[:order]:
            bw.write(int(v), bits)
    else:
        q, prec, shift = lpc
        bw.write(32 + order - 1, 6)  # LPC
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bits)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in q:
            bw.write(int(c), prec)
    _write_residual(bw, resid, order, n)


def encode_flac(
    samples: np.ndarray,
    rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    stereo_method: str = "auto",
) -> bytes:
    """Encode ``(n,)`` or ``(n, channels)`` integer samples as FLAC.
    ``stereo_method``: 'independent', 'mid-side', or 'auto' (per-frame
    cost pick). Fixed + order-8 LPC prediction, rice residuals."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if bps not in _BPS_CODES:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    # STREAMINFO carries block size in a 16-bit field (spec minimum 16)
    # and rate in a 20-bit field; out-of-range values would silently
    # truncate through the masking bit-writer into invalid streams.
    if not 16 <= block_size <= 0xFFFF:
        raise ValueError(f"block_size {block_size} outside [16, 65535]")
    if not 1 <= rate < (1 << 20):
        raise ValueError(f"sample rate {rate} outside [1, 2^20-1]")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if x.size and (x.min() < lo or x.max() > hi):
        raise ValueError(f"samples exceed {bps}-bit range")

    frames = bytearray()
    fidx = 0
    for start in range(0, max(n, 1), block_size):
        block = x[start: start + block_size]
        if block.shape[0] == 0:
            break
        bw = _BitWriter()
        blocksize = block.shape[0]
        bs_code = _BLOCKSIZE_CODES.get(blocksize)
        extra_bs = None
        if bs_code is None:
            if blocksize <= 256:
                bs_code, extra_bs = 0b0110, (blocksize - 1, 8)
            else:
                bs_code, extra_bs = 0b0111, (blocksize - 1, 16)
        ch_code = channels - 1
        mode = "independent"
        if channels == 2 and stereo_method != "independent":
            left, right = block[:, 0], block[:, 1]
            side = left - right
            mid = (left + right) >> 1
            if stereo_method == "auto":
                mode = (
                    "mid-side"
                    if int(np.sum(np.abs(np.diff(side))))
                    + int(np.sum(np.abs(np.diff(mid))))
                    < int(np.sum(np.abs(np.diff(left))))
                    + int(np.sum(np.abs(np.diff(right))))
                    else "independent"
                )
            else:
                mode = stereo_method
            ch_code = {
                "independent": 1, "left-side": 0b1000,
                "right-side": 0b1001, "mid-side": 0b1010,
            }[mode]
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(bs_code, 4)
        bw.write(0, 4)  # sample rate from STREAMINFO
        bw.write(ch_code, 4)
        bw.write(_BPS_CODES[bps], 3)
        bw.write(0, 1)
        for byte in _utf8_coded(fidx):
            bw.write(byte, 8)
        if extra_bs:
            bw.write(*extra_bs)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        if channels == 2 and mode != "independent":
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if mode == "mid-side":
                _encode_subframe(bw, (left + right) >> 1, bps)
                _encode_subframe(bw, side, bps + 1)
            elif mode == "left-side":
                _encode_subframe(bw, left, bps)
                _encode_subframe(bw, side, bps + 1)
            else:  # right-side
                _encode_subframe(bw, side, bps + 1)
                _encode_subframe(bw, right, bps)
        else:
            for c in range(channels):
                _encode_subframe(bw, block[:, c], bps)
        bw.align()
        body = bw.bytes()
        frame = hdr + bytes([_crc8(hdr)]) + body
        frame += _crc16(frame).to_bytes(2, "big")
        frames += frame
        fidx += 1

    si = _BitWriter()
    si.write(block_size if n else 16, 16)
    si.write(block_size if n else 16, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    md5 = hashlib.md5(_pcm_bytes(x, bps)).digest()
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")  # last block
    out += streaminfo
    out += frames
    return bytes(out)
