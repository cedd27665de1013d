"""GIF codec (the public GIF89a specification), pure numpy/stdlib.

Closes the last high-frequency WEB-IMAGE gap: scraped corpora are full
of GIFs (incl. animations), and none of PIL/imageio exist in this
container. REAL decode of the full format: LZW with variable code
widths (LSB-first bit packing, clear/EOI codes, 12-bit cap, the KwKwK
self-reference case), global and local color tables, interlaced images
(the 4-pass row order), transparency, and animation compositing with
disposal methods 0/1 (draw over), 2 (restore background) and 3
(restore previous). The matching encoder (palette build, LZW compress
with dictionary resets, optional interlace, multi-frame with per-frame
delays) gives every path a hermetic fixture — GIF is palette-lossless,
so decode(encode(x)) == x EXACTLY for any image with <= 256 distinct
colors, and an animation round-trips frame-for-frame.

``sample_frames`` uses this decoder to sample REAL frames from animated
GIFs (the first real video-like media path; true video containers still
need av). Scale shape: per-payload decode inside Arrow-batched
``mapInPandas`` — media bytes never shuffle. Ref parity: the reference
has no image codecs (extension surface)."""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> list[int]:
    """GIF dialect of the shared LZW: LSB-first packing, late-change
    width growth (see ``operators/lzw.py``)."""
    from evolution_spark.operators.lzw import lzw_decode

    return lzw_decode(
        data, min_code_size, expected, msb_first=False, early_change=False
    )


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    from evolution_spark.operators.lzw import lzw_encode

    return lzw_encode(
        indices, min_code_size, msb_first=False, early_change=False
    )


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def decode_gif(payload: bytes):
    """Decode a GIF to ``(frames, delays_cs)``: frames is a
    ``(n, h, w, 3)`` uint8 array of COMPOSITED full-canvas frames,
    delays the per-frame delay in centiseconds (0 for static images).
    Static GIFs return n=1."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a magic)")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")

    def at(i: int) -> int:
        # bounds-checked byte access: truncation surfaces as the same
        # ValueError contract every other decoder keeps (review r11
        # pass 6), not a raw IndexError mid-mapInPandas
        if i >= len(payload):
            raise ValueError("GIF payload truncated")
        return payload[i]

    def color_table(start: int, n: int) -> np.ndarray:
        raw = payload[start: start + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("GIF color table truncated")
        return np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)

    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = color_table(pos, n)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_table is not None and bg_idx < len(global_table):
        canvas[:] = global_table[bg_idx]

    frames = []
    delays = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(payload):
        block = at(pos)
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = at(pos)
            pos += 1
            if label == 0xF9:  # graphic control
                size = at(pos)
                gc = payload[pos + 1: pos + 1 + size]
                if len(gc) < 4:
                    raise ValueError("GIF graphic-control block truncated")
                disposal = (gc[0] >> 2) & 0x07
                delay = int.from_bytes(gc[1:3], "little")
                transparent = gc[3] if gc[0] & 1 else None
                pos += 1 + size
            # skip (remaining) sub-blocks for any extension
            while at(pos):
                pos += 1 + at(pos)
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        if pos + 9 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        left = int.from_bytes(payload[pos: pos + 2], "little")
        top = int.from_bytes(payload[pos + 2: pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4: pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6: pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = color_table(pos, n)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        interlaced = bool(ipacked & 0x40)
        min_code = at(pos)
        pos += 1
        data = bytearray()
        while at(pos):
            ln = payload[pos]
            data += payload[pos + 1: pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, bytes(data), fw * fh)
        if len(idx) < fw * fh:
            idx = idx + [0] * (fw * fh - len(idx))
        grid = np.array(idx, dtype=np.int32).reshape(fh, fw)
        if interlaced:
            un = np.empty_like(grid)
            un[_deinterlace_rows(fh)] = grid
            grid = un
        if int(grid.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index exceeds color table")

        prev_canvas = canvas.copy()
        # clip to the logical screen (mainstream decoders tolerate
        # descriptors past the canvas; review r11 pass 6)
        ch = max(0, min(fh, h - top))
        cw = max(0, min(fw, w - left))
        region = canvas[top: top + ch, left: left + cw]
        grid_c = grid[:ch, :cw]
        rgb = table[grid_c]
        if transparent is not None:
            mask = grid_c != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            # GIF89a says "restore to background color", but mainstream
            # decoders (browsers, ImageMagick) composite disposal-2
            # regions as transparent over a black backdrop rather than
            # the logical-screen background color; match them so foreign
            # animations composite the way viewers show them.
            canvas[top: top + ch, left: left + cw] = 0
        elif disposal == 3:  # restore previous
            canvas = prev_canvas
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames, axis=0), delays


def encode_gif(
    frames: np.ndarray,
    delays_cs: int | list[int] = 10,
    interlace: bool = False,
    disposal: int = 1,
) -> bytes:
    """Encode ``(h, w, 3)`` or ``(n, h, w, 3)`` uint8 frames as GIF89a.
    All frames share one global palette built from the distinct colors
    (<= 256 required — GIF is palette-based; quantization is out of
    scope, callers pre-quantize). Full-canvas frames with draw-over
    disposal round-trip exactly."""
    fx = np.asarray(frames, dtype=np.uint8)
    if fx.ndim == 3:
        fx = fx[None]
    n, h, w, _ = fx.shape
    colors, inverse = np.unique(
        fx.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors — GIF needs <= 256 "
            "(pre-quantize the frames)"
        )
    bits = max(1, int(len(colors) - 1).bit_length())
    tsize = 1 << bits
    palette = np.zeros((tsize, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx_frames = inverse.reshape(n, h, w)
    if isinstance(delays_cs, int):
        delays = [delays_cs] * n
    else:
        delays = list(delays_cs)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += palette.tobytes()
    if n > 1:
        # Netscape looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi in range(n):
        if n > 1:
            out += bytes([0x21, 0xF9, 4, (disposal & 7) << 2])
            out += int(delays[fi]).to_bytes(2, "little")
            out += bytes([0, 0])
        out += b"\x2c" + bytes(4)  # image at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        grid = idx_frames[fi]
        if interlace:
            grid = grid[_deinterlace_rows(h)]
        min_code = max(2, bits)
        out += bytes([min_code])
        data = _lzw_encode(min_code, grid.reshape(-1).tolist())
        for off in range(0, len(data), 255):
            chunk = data[off: off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
