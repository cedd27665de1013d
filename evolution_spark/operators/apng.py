"""APNG (Animated PNG, PNG Third Edition chapter on animation) —
timeline decode with real compositing, completing the GIF/WebP/APNG
animation symmetry in ``sample_frames``.

Public layout: a regular PNG whose animation control lives in three
chunk types —

  acTL  num_frames(4) num_plays(4)            (before IDAT)
  fcTL  sequence(4) w(4) h(4) x(4) y(4)       (one per frame)
        delay_num(2) delay_den(2) dispose(1) blend(1)
  fdAT  sequence(4) + deflate data (an IDAT with a sequence prefix)

If the FIRST fcTL precedes IDAT, the IDAT stream is frame 0 of the
animation; otherwise IDAT is only the static fallback image and the
animation is entirely fdAT frames. Sequence numbers cover fcTL and
fdAT jointly and must increase by one from 0.

Frames decode by synthesizing a minimal single-frame PNG (the main
IHDR re-dimensioned to the frame rectangle + PLTE/tRNS if present +
the frame's data chunks) through this repo's from-spec ``decode_png``
and composite per fcTL: dispose 0 = keep, 1 = clear the rectangle to
transparent black, 2 = revert to the prior canvas; blend 0 = source
(overwrite), 1 = source-over alpha (the same exact-integer rounding
as the WebP compositor — an implementer choice, the spec leaves the
rounding open).

``build_apng`` writes spec-shaped fixtures from per-frame arrays.

Ref parity: the reference has no media handling (extension surface).
"""
from __future__ import annotations

import numpy as np

from evolution_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
)


def _chunks(payload: bytes):
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    out = []
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos: pos + 4], "big")
        ctype = payload[pos + 4: pos + 8]
        body_end = pos + 8 + size
        if body_end + 4 > len(payload):
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        out.append((ctype, payload[pos + 8: body_end]))
        pos = body_end + 4
        if ctype == b"IEND":
            break
    return out


def is_apng(payload: bytes) -> bool:
    try:
        return any(t == b"acTL" for t, _ in _chunks(bytes(payload)))
    except ValueError:
        return False


def _to_rgba(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint16:
        # 16-bit APNG: decode_png returns uint16. A raw assignment
        # into a uint8 canvas would keep the LOW byte (0xFF00 -> 0);
        # take the high byte, the standard 16->8 downsample.
        img = (img >> 8).astype(np.uint8)
    elif img.dtype != np.uint8:
        raise ValueError(
            f"APNG frame sample dtype {img.dtype} unsupported "
            "(uint8/uint16 only)"
        )
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    if ch == 1:
        out[..., :3] = img
        out[..., 3] = 255
    elif ch == 2:
        out[..., :3] = img[..., :1]
        out[..., 3] = img[..., 1]
    elif ch == 3:
        out[..., :3] = img
        out[..., 3] = 255
    else:
        out[:] = img
    return out


def decode_apng(payload: bytes):
    """Decode an APNG to its composited timeline:
    ``[(delay_ms, (H, W, 4) RGBA canvas), ...]``. A plain PNG returns
    one zero-delay entry. Raises ValueError on structural corruption
    (bad sequence numbers, frame rectangles outside the canvas,
    truncated control chunks) — the mapInPandas quarantine contract."""
    payload = bytes(payload)
    chunks = _chunks(payload)
    types = [t for t, _ in chunks]
    if b"acTL" not in types:
        return [(0, _to_rgba(decode_png(payload)))]
    ihdr = next((b for t, b in chunks if t == b"IHDR"), None)
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("APNG missing a valid IHDR")
    cw = int.from_bytes(ihdr[0:4], "big")
    chh = int.from_bytes(ihdr[4:8], "big")
    if cw * chh > (1 << 26):
        raise ValueError("APNG canvas exceeds the decode guard")
    actl = next(b for t, b in chunks if t == b"acTL")
    if len(actl) < 8:
        raise ValueError("acTL truncated")
    n_frames = int.from_bytes(actl[0:4], "big")
    if not 1 <= n_frames <= 4096:
        raise ValueError(f"APNG frame count {n_frames} out of bounds")
    aux = [(t, b) for t, b in chunks if t in (b"PLTE", b"tRNS")]

    # group the stream: fcTL starts a frame; IDAT data belongs to the
    # animation only when an fcTL came first
    frames = []           # (fctl_body, [data bytes...])
    cur = None
    seq_expect = 0
    for t, b in chunks:
        if t == b"fcTL":
            if len(b) < 26:
                raise ValueError("fcTL truncated")
            if int.from_bytes(b[0:4], "big") != seq_expect:
                raise ValueError("APNG sequence numbers out of order")
            seq_expect += 1
            cur = (b, [])
            frames.append(cur)
        elif t == b"IDAT":
            # IDAT is frame 0 of the animation ONLY when an fcTL
            # preceded it; otherwise it is the static fallback image
            if frames and cur is frames[0]:
                cur[1].append(b)
        elif t == b"fdAT":
            if len(b) < 4:
                raise ValueError("fdAT truncated")
            if int.from_bytes(b[0:4], "big") != seq_expect:
                raise ValueError("APNG sequence numbers out of order")
            seq_expect += 1
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur[1].append(b[4:])
    if len(frames) != n_frames:
        raise ValueError(
            f"APNG declares {n_frames} frames, stream has {len(frames)}"
        )
    canvas = np.zeros((chh, cw, 4), dtype=np.uint8)
    out = []
    for fi, (fctl, datas) in enumerate(frames):
        fw = int.from_bytes(fctl[4:8], "big")
        fh = int.from_bytes(fctl[8:12], "big")
        x = int.from_bytes(fctl[12:16], "big")
        y = int.from_bytes(fctl[16:20], "big")
        dnum = int.from_bytes(fctl[20:22], "big")
        dden = int.from_bytes(fctl[22:24], "big") or 100
        dispose, blend = fctl[24], fctl[25]
        if dispose > 2 or blend > 1:
            raise ValueError("fcTL dispose/blend out of range")
        if x + fw > cw or y + fh > chh or fw == 0 or fh == 0:
            raise ValueError("APNG frame rectangle outside the canvas")
        if not datas:
            raise ValueError("APNG frame without data chunks")
        sub_ihdr = (fw.to_bytes(4, "big") + fh.to_bytes(4, "big")
                    + ihdr[8:13])
        sub = bytearray(_PNG_SIG)
        sub += _png_chunk(b"IHDR", sub_ihdr)
        for t, b in aux:
            sub += _png_chunk(t, b)
        for d in datas:
            sub += _png_chunk(b"IDAT", d)
        sub += _png_chunk(b"IEND", b"")
        img = _to_rgba(decode_png(bytes(sub)))
        if img.shape[:2] != (fh, fw):
            raise ValueError("APNG frame data dims mismatch fcTL")
        if dispose == 2:
            saved = canvas[y: y + fh, x: x + fw].copy()
        region = canvas[y: y + fh, x: x + fw]
        if blend == 0:
            region[:] = img
        else:
            sa = img[..., 3].astype(np.int64)
            da = region[..., 3].astype(np.int64)
            ba255 = sa * 255 + da * (255 - sa)
            for c in range(3):
                sc = img[..., c].astype(np.int64)
                dc = region[..., c].astype(np.int64)
                num = sc * sa * 255 + dc * da * (255 - sa)
                region[..., c] = np.where(
                    ba255 > 0, (num * 2 + ba255) // (2 * ba255), 0
                ).astype(np.uint8)
            region[..., 3] = ((ba255 * 2 + 255) // (2 * 255)).astype(
                np.uint8)
        delay_ms = dnum * 1000 // dden
        out.append((delay_ms, canvas.copy()))
        if dispose == 1:
            canvas[y: y + fh, x: x + fw] = 0
        elif dispose == 2:
            canvas[y: y + fh, x: x + fw] = saved
    return out


def _idat_bodies(png: bytes) -> list[bytes]:
    return [b for t, b in _chunks(png) if t == b"IDAT"]


def build_apng(frames: list[dict], canvas: tuple[int, int]) -> bytes:
    """Spec-shaped APNG fixture from frame dicts ``{img, x, y,
    delay_ms, dispose, blend}`` (img is any array ``encode_png``
    takes). Frame 0 doubles as the static image (fcTL before IDAT)."""
    cw, ch = canvas
    first = np.asarray(frames[0]["img"])
    if first.shape[:2] != (ch, cw) or frames[0].get("x") or \
            frames[0].get("y"):
        raise ValueError(
            "frame 0 is the static IDAT image: it must be full-canvas "
            "at the origin"
        )
    out = bytearray(_PNG_SIG)
    # all frames must share the IHDR color type: encode frame 0, copy
    # its IHDR tail (depth/color/compression/filter/interlace)
    f0 = encode_png(_as4(first))
    ihdr0 = next(b for t, b in _chunks(f0) if t == b"IHDR")
    out += _png_chunk(b"IHDR", cw.to_bytes(4, "big")
                      + ch.to_bytes(4, "big") + ihdr0[8:13])
    out += _png_chunk(b"acTL", len(frames).to_bytes(4, "big")
                      + (0).to_bytes(4, "big"))
    seq = 0

    def fctl(fr, w, h):
        nonlocal seq
        body = (seq.to_bytes(4, "big") + w.to_bytes(4, "big")
                + h.to_bytes(4, "big")
                + fr.get("x", 0).to_bytes(4, "big")
                + fr.get("y", 0).to_bytes(4, "big")
                + fr.get("delay_ms", 40).to_bytes(2, "big")
                + (1000).to_bytes(2, "big")
                + bytes([fr.get("dispose", 0), fr.get("blend", 0)]))
        seq += 1
        return _png_chunk(b"fcTL", body)

    out += fctl(frames[0], cw, ch)
    for d in _idat_bodies(f0):
        out += _png_chunk(b"IDAT", d)
    for fr in frames[1:]:
        img = _as4(np.asarray(fr["img"]))
        h, w = img.shape[:2]
        out += fctl(fr, w, h)
        for d in _idat_bodies(encode_png(img)):
            out += _png_chunk(b"fdAT", seq.to_bytes(4, "big") + d)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def _as4(img: np.ndarray) -> np.ndarray:
    """Fixtures encode every frame as RGBA so the shared IHDR color
    type holds across frames of different content."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2] + (1,), 255, dtype=np.uint8)
        img = np.concatenate([img, a], axis=2)
    return img
