"""TIFF codec (the public TIFF 6.0 specification), pure numpy/stdlib.

The document/scientific-imagery container scraped corpora carry beside
PNG/JPEG/GIF. REAL decode of the baseline + LZW profile: both byte
orders (II/MM), the IFD walk with multi-page chains, strips (offsets /
byte counts / rows-per-strip), compressions 1 (none), 8/32946 (Deflate), 5 (LZW — the
MSB-first EARLY-CHANGE dialect via the shared ``operators/lzw`` core)
and 32773 (PackBits), the horizontal-differencing predictor (tag 317),
photometric interpretations 0/1 (gray, white- or black-is-zero),
2 (RGB) and 3 (palette with the 16-bit TIFF colormap), and 8- or
16-BIT samples (round 12 — both byte orders, the predictor
differencing on sample values). The matching encoder writes II streams
with any of the three compressions, optional predictor, and multi-page
chains — all lossless, so decode(encode(x)) == x EXACTLY for arbitrary
uint8/uint16 input (the repo-wide strongest-oracle strategy).

Round 12 added the TILED layout (TIFF 6.0 §15, tags 322-325 — tw x tl
blocks in row-major tile order with zero-padded edge tiles, the
predictor differencing within tile rows) and PLANAR configuration 2
(tag 284 — the strip/tile sequence repeated per sample plane), on both
decode and encode.

Round 12 also added BILEVEL CCITT fax pages via ``operators/fax``:
MH RLE (compression 2, byte-aligned 1-D rows), G3/T.4 (compression 3,
EOL-framed 1-D and 2-D rows with tag bits, fill tolerated,
T4Options-gated) and Group 4 (compression 4, T.6 MMR), strip-coded,
both photometrics normalized to 1 = white, with matching encoders.

Round 12 also added new-style JPEG-in-TIFF (compression 7): one JIF
stream per strip decoded by the module's own JPEG codec, abbreviated
streams resolved against the JPEGTables tag (347) by SOI splicing —
the one inherently lossy path here.

Declared limits (refuse, never mis-decode): bits-per-sample other than
uniform 8/16 or bilevel-fax 1, T.4 uncompressed mode, tiled or
predictor fax, old-style JPEG (compression 6, deprecated by TIFF/EP
and never coherently specified). (The 16-bit palette refusal was
lifted round 14: indices at either depth go through the same colormap
lookup.)

Measured envelope (BASELINE v4.9): the LZW path is bit-serial,
~107 ms per MB of decoded pixels — a scan larger than ~1 MB decoded
crosses 100 ms/payload; none/PackBits stay vectorized-cheap.

Scale shape: per-payload decode inside Arrow-batched ``mapInPandas`` —
image bytes never shuffle. Ref parity: the reference has no codecs
(extension surface)."""

from __future__ import annotations

import numpy as np

from evolution_spark.operators.lzw import lzw_decode, lzw_encode

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i: i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("TIFF PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF PackBits strip truncated")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until the next run of >= 3
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _read_ifds(payload: bytes):
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload (missing II*/MM* magic)")

    def u(off: int, n: int) -> int:
        raw = payload[off: off + n]
        if len(raw) < n:
            raise ValueError("TIFF payload truncated")
        return int.from_bytes(raw, bo)

    ifds = []
    off = u(4, 4)
    seen = set()
    while off:
        if off in seen:
            raise ValueError("TIFF IFD chain loops")
        seen.add(off)
        count = u(off, 2)
        tags = {}
        for e in range(count):
            base = off + 2 + 12 * e
            tag = u(base, 2)
            typ = u(base + 2, 2)
            cnt = u(base + 4, 4)
            size = _TYPE_SIZES.get(typ, 1) * cnt
            val_off = base + 8 if size <= 4 else u(base + 8, 4)
            if typ in (3, 4, 1):
                step = _TYPE_SIZES[typ]
                vals = [
                    u(val_off + i * step, step) for i in range(cnt)
                ]
            else:
                vals = [payload[val_off: val_off + size]]
            tags[tag] = vals
        ifds.append(tags)
        off = u(off + 2 + 12 * count, 4)
    if not ifds:
        raise ValueError("TIFF has no IFD")
    return ifds, bo


def decode_tiff_pages(payload: bytes) -> list[np.ndarray]:
    """All pages, each ``(h, w)`` gray or ``(h, w, 3)`` RGB uint8."""
    ifds, bo = _read_ifds(payload)
    return [_decode_page(payload, tags, bo) for tags in ifds]


def decode_tiff(payload: bytes) -> np.ndarray:
    """First page — the ``decode_media`` contract."""
    return decode_tiff_pages(payload)[0]


def _decode_page(payload: bytes, tags: dict, bo: str) -> np.ndarray:
    def one(tag, default=None):
        if tag in tags:
            v = tags[tag][0]
            if not isinstance(v, int):
                raise ValueError(
                    f"TIFF tag {tag} has a non-integer type (corrupt "
                    "IFD type byte)"
                )
            return v
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    def int_list(tag):
        vals = tags[tag]
        if not all(isinstance(v, int) for v in vals):
            raise ValueError(
                f"TIFF tag {tag} has non-integer values (corrupt IFD)"
            )
        return vals

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    if not (0 < w and 0 < h and 0 < spp <= 4):
        raise ValueError(f"implausible TIFF dimensions {w}x{h}x{spp}")
    if w * h * spp > (1 << 30):
        raise ValueError(
            f"TIFF dimensions {w}x{h}x{spp} exceed the 1 GiB decode "
            "guard (corrupt or hostile header)"
        )
    bits = int_list(258) if 258 in tags else [8]
    comp0 = one(259, 1)
    if bits == [1]:
        if comp0 not in (2, 3, 4):
            raise ValueError(
                "bilevel TIFF decodes only under CCITT MH RLE (2), "
                f"G3/T.4 (3) or G4 (4) compression, got {comp0}"
            )
        return _decode_bilevel_fax(payload, tags, one)
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise ValueError(
            f"unsupported TIFF bits-per-sample {bits} (uniform 8/16-bit "
            "continuous-tone, or 1-bit CCITT fax)"
        )
    bps = bits[0] // 8
    px_dt = np.dtype("<u2" if bo == "little" else ">u2") if bps == 2 \
        else np.dtype(np.uint8)
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"unsupported TIFF planar configuration {planar}")
    comp = one(259, 1)
    photo = one(262)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    def _decompress(raw: bytes, expected: int, what: str,
                    width: int = 0) -> bytes:
        if comp == 1:
            if len(raw) < expected:
                raise ValueError(f"TIFF uncompressed {what} short")
            return bytes(raw[:expected])
        if comp == 5:
            vals = lzw_decode(
                bytes(raw), 8, expected, msb_first=True, early_change=True
            )
            if len(vals) < expected:
                raise ValueError(f"TIFF LZW {what} short")
            return bytes(vals)
        if comp == 32773:
            return _packbits_decode(bytes(raw), expected)
        if comp == 7:
            # new-style JPEG-in-TIFF: each strip/tile is a JIF stream;
            # abbreviated streams get the JPEGTables (tag 347) spliced
            # in after their SOI
            from evolution_spark.operators.multimodal import decode_jpeg

            stream = bytes(raw)
            tables = tags.get(347)
            if tables is not None:
                t = tables[0]
                if not isinstance(t, (bytes, bytearray)):
                    raise ValueError("TIFF JPEGTables tag is not bytes")
                t = bytes(t)
                if t[:2] != b"\xff\xd8" or t[-2:] != b"\xff\xd9":
                    raise ValueError(
                        "TIFF JPEGTables must be SOI..EOI delimited"
                    )
                if stream[:2] != b"\xff\xd8":
                    raise ValueError("TIFF JPEG strip missing SOI")
                stream = t[:-2] + stream[2:]
            img = decode_jpeg(stream)
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[2] != spp:
                raise ValueError(
                    f"TIFF JPEG {what} has {img.shape[2]} components, "
                    f"IFD declares {spp} samples/pixel"
                )
            # the embedded SOF dimensions must AGREE with the IFD: a
            # width mismatch would silently re-wrap rows on reshape, so
            # it is a hard refusal; extra rows (MCU padding) are cropped
            # explicitly, missing rows refuse
            if width and img.shape[1] != width:
                raise ValueError(
                    f"TIFF JPEG {what} SOF width {img.shape[1]} != IFD "
                    f"{what} width {width}"
                )
            jrows = expected // (max(width, 1) * spp * bps) if width \
                else img.shape[0]
            if img.shape[0] < jrows:
                raise ValueError(
                    f"TIFF JPEG {what} SOF height {img.shape[0]} < "
                    f"expected {jrows} rows"
                )
            flat = img[:jrows].reshape(-1)[:expected]
            if flat.size < expected:
                raise ValueError(f"TIFF JPEG {what} short")
            return flat.astype(np.uint8).tobytes()
        if comp in (8, 32946):
            # Deflate (8, the TIFF-F/Adobe code) and the legacy 32946:
            # a raw zlib stream per strip/tile
            import zlib

            try:
                out = zlib.decompress(bytes(raw))
            except zlib.error as exc:
                raise ValueError(f"TIFF deflate {what} corrupt: {exc}")
            if len(out) < expected:
                raise ValueError(f"TIFF deflate {what} short")
            return out[:expected]
        raise ValueError(
            f"unsupported TIFF compression {comp} "
            "(none/LZW/PackBits/Deflate/JPEG)"
        )

    def _assemble_tiled(offsets, counts, spp_eff: int) -> np.ndarray:
        """One pass of tile assembly with ``spp_eff`` samples per pixel
        (1 per plane under planar config 2) -> (h, w, spp_eff)."""
        tw, tl = one(322), one(323)
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError(
                f"TIFF tile size {tw}x{tl} violates the spec's "
                "multiple-of-16 rule"
            )
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offsets) != across * down or len(counts) != len(offsets):
            raise ValueError(
                f"TIFF tile count {len(offsets)} != grid {across}x{down}"
            )
        full = np.zeros((h, w, spp_eff), dtype=px_dt)
        expected = tl * tw * spp_eff * bps
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = payload[off: off + cnt]
            if len(raw) < cnt:
                raise ValueError("TIFF tile truncated")
            tile = np.frombuffer(
                _decompress(raw, expected, "tile", width=tw), dtype=px_dt
            ).reshape(tl, tw, spp_eff)
            if predictor == 2:
                # differencing operates on SAMPLE values at any depth
                tile = np.cumsum(
                    tile.astype(np.int64), axis=1
                ).astype(np.uint16 if bps == 2 else np.uint8).astype(px_dt)
            r, c = divmod(ti, across)
            y0, x0 = r * tl, c * tw
            ph_, pw_ = min(tl, h - y0), min(tw, w - x0)
            full[y0: y0 + ph_, x0: x0 + pw_] = tile[:ph_, :pw_]
        return full

    def _assemble_strips(offsets, counts, spp_eff: int) -> np.ndarray:
        rows_per_strip = one(278, h)
        if rows_per_strip <= 0:
            raise ValueError("TIFF RowsPerStrip must be positive")
        if len(offsets) != len(counts):
            raise ValueError("TIFF strip offsets/counts mismatch")
        row_bytes = w * spp_eff * bps
        data = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = payload[off: off + cnt]
            if len(raw) < cnt:
                raise ValueError("TIFF strip truncated")
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            data += _decompress(raw, nrows * row_bytes, "strip", width=w)
        a = np.frombuffer(bytes(data), dtype=px_dt).reshape(
            h, w, spp_eff
        )
        if predictor == 2:
            a = np.cumsum(a.astype(np.int64), axis=1).astype(
                np.uint16 if bps == 2 else np.uint8
            ).astype(px_dt)
        return a

    tiled = 322 in tags
    if tiled:
        if 324 not in tags or 325 not in tags:
            raise ValueError("tiled TIFF missing tags 324/325")
        offsets, counts = int_list(324), int_list(325)
        assemble = _assemble_tiled
    else:
        if 273 not in tags or 279 not in tags:
            raise ValueError("TIFF missing required strip tags 273/279")
        offsets, counts = int_list(273), int_list(279)
        assemble = _assemble_strips
    if planar == 2 and spp > 1:
        # PLANAR config 2 (TIFF 6.0 tag 284): the strip/tile sequence
        # repeats once PER SAMPLE PLANE, each plane stored like a
        # single-sample image; the predictor differences within a plane
        if len(offsets) % spp:
            raise ValueError(
                f"planar-2 TIFF: {len(offsets)} strips/tiles not "
                f"divisible by {spp} planes"
            )
        per = len(offsets) // spp
        planes = [
            assemble(offsets[p * per: (p + 1) * per],
                     counts[p * per: (p + 1) * per], 1)[..., 0]
            for p in range(spp)
        ]
        arr = np.stack(planes, axis=-1).reshape(h, w * spp)
    else:
        arr = assemble(offsets, counts, spp).reshape(h, w * spp)

    if photo in (0, 1):
        if spp != 1:
            raise ValueError("gray photometric with multiple samples")
        img = arr.reshape(h, w)
        maxval = (1 << bits[0]) - 1
        return (maxval - img).astype(img.dtype) if photo == 0 else img
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB photometric needs >= 3 samples")
        return arr.reshape(h, w, spp)[..., :3].copy()
    if photo == 3:
        # palette indices are 8-bit OR 16-bit (round 14 — the 16-bit
        # refusal is lifted; bits[0] is already gated to 8/16 above,
        # and the colormap lookup below is depth-independent)
        if spp != 1:
            raise ValueError("palette photometric needs exactly one "
                             "sample per pixel")
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing colormap")
        # colormap: 3 * 2^bits 16-bit values, R then G then B planes
        vals = cmap if isinstance(cmap[0], int) else None
        if vals is None:
            raw = cmap[0]
            vals = [
                int.from_bytes(raw[i: i + 2], bo)
                for i in range(0, len(raw), 2)
            ]
        n = len(vals) // 3
        table = np.array(vals, dtype=np.uint32).reshape(3, n).T
        table = (table >> 8).astype(np.uint8)  # 16-bit -> 8-bit
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF palette index exceeds colormap")
        return table[idx]
    raise ValueError(f"unsupported TIFF photometric {photo}")


def _decode_bilevel_fax(payload: bytes, tags: dict, one) -> np.ndarray:
    """CCITT bilevel strips (round 12): MH RLE (compression 2) or G4
    (compression 4) via ``operators/fax``; each strip is independently
    coded. Returns (h, w) uint8 with 1 = WHITE (the same black-is-zero
    normalization the continuous-tone paths return)."""
    from evolution_spark.operators.fax import (
        decode_g4,
        decode_mh,
        decode_t4,
    )

    w, h = one(256), one(257)
    if not (0 < w and 0 < h) or w * h > (1 << 30):
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    comp = one(259, 1)
    photo = one(262)
    if one(277, 1) != 1:
        raise ValueError("bilevel TIFF with multiple samples per pixel")
    if one(317, 1) != 1:
        raise ValueError("predictor is not defined for CCITT fax")
    if 322 in tags:
        raise ValueError("tiled CCITT fax TIFF is not supported")
    if photo not in (0, 1):
        raise ValueError(f"bilevel TIFF photometric {photo} unsupported")
    if 273 not in tags or 279 not in tags:
        raise ValueError("TIFF missing required strip tags 273/279")
    offsets, counts = tags[273], tags[279]
    if not all(isinstance(v, int) for v in list(offsets) + list(counts)):
        raise ValueError("TIFF strip tags have non-integer values")
    rows_per_strip = one(278, h)
    if rows_per_strip <= 0:
        raise ValueError("TIFF RowsPerStrip must be positive")
    if comp == 3:
        t4opts = one(292, 0)
        if t4opts & 0b10:
            raise ValueError(
                "T.4 uncompressed mode (T4Options bit 1) is refused"
            )
        two_d = bool(t4opts & 0b1)

        def dec(raw, width, nrows):
            return decode_t4(raw, width, nrows, two_d=two_d)
    else:
        dec = decode_mh if comp == 2 else decode_g4
    parts = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = payload[off: off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF fax strip truncated")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        parts.append(dec(bytes(raw), w, nrows))
    black = np.concatenate(parts, axis=0)
    # The codec emits the coding-layer BLACK mask (1 = a "black" pel in
    # the T.4/T.6 sense). Photometric 0 (WhiteIsZero, the fax norm)
    # stores that mask directly, so normalizing to 1 = white inverts it;
    # photometric 1 (BlackIsZero) stores the INVERSE (0 = black), so the
    # coding-layer black mask IS already the 1 = white normalization.
    if photo == 1:
        return black.astype(np.uint8)
    return (1 - black).astype(np.uint8)


def encode_tiff(
    pages: np.ndarray | list[np.ndarray],
    compression: str = "lzw",
    predictor: bool = False,
    rows_per_strip: int = 64,
    tile_size: tuple[int, int] | None = None,
    planar: bool = False,
) -> bytes:
    """Encode uint8 page(s) (``(h, w)`` gray / ``(h, w, 3)`` RGB, or a
    list of such for a multi-page file) as little-endian TIFF.
    ``tile_size=(tw, tl)`` (multiples of 16 per spec) writes the TILED
    layout (tags 322-325, zero-padded edge tiles) instead of strips.
    ``planar=True`` (RGB only) writes planar configuration 2: the
    strip/tile sequence repeated once per sample plane (tag 284)."""
    if isinstance(pages, np.ndarray):
        if pages.ndim == 2 or (pages.ndim == 3 and pages.shape[-1] == 3):
            pages = [pages]
        else:
            # a 3-D array with last dim != 3 is ambiguous (RGBA? a stack
            # of gray pages?) — refuse; pass a LIST of pages instead
            raise ValueError(
                f"encode_tiff takes (h, w) gray or (h, w, 3) RGB pages "
                f"(or a list of them), got shape {pages.shape}"
            )
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773, "deflate": 8,
                 "mh": 2, "t4": 3, "t4_2d": 3, "g4": 4,
                 "jpeg": 7}[compression]
    t4_two_d = compression == "t4_2d"

    # build sequentially: for each page, strips first, then its IFD
    out = bytearray(b"II*\x00" + bytes(4))
    prev_link = 4  # where to patch the next-IFD offset
    for page in pages:
        px = np.asarray(page)
        if px.dtype != np.uint16:
            px = px.astype(np.uint8)
        if px.ndim not in (2, 3) or (px.ndim == 3 and px.shape[-1] != 3):
            raise ValueError(
                f"encode_tiff takes (h, w) gray or (h, w, 3) RGB pages, "
                f"got shape {px.shape}"
            )
        gray = px.ndim == 2
        h, w = px.shape[:2]
        spp = 1 if gray else 3
        depth = 16 if px.dtype == np.uint16 else 8
        mask = (1 << depth) - 1
        enc_dt = "<u2" if depth == 16 else np.uint8

        def _pack(raw: bytes) -> bytes:
            if comp_code == 1:
                return raw
            if comp_code == 5:
                return lzw_encode(
                    list(raw), 8, msb_first=True, early_change=True
                )
            if comp_code == 8:
                import zlib

                return zlib.compress(raw, 6)
            return _packbits_encode(raw)

        def _diff(block: np.ndarray, width: int, spp_eff: int) -> np.ndarray:
            p = block.reshape(
                block.shape[0], width, spp_eff
            ).astype(np.int64)
            # first column stays raw; the rest are horizontal diffs
            # on SAMPLE values (any depth)
            d = np.diff(p, axis=1, prepend=0)
            return (d & mask).astype(px.dtype).reshape(
                block.shape[0], width * spp_eff
            )

        if planar and gray:
            raise ValueError("planar=True needs an RGB page")

        def _blocks(grid: np.ndarray, spp_eff: int) -> list[bytes]:
            """Strip/tile byte blocks for one (h, w, spp_eff) image."""
            out_blocks = []
            if tile_size is not None:
                tw, tl = tile_size
                if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
                    raise ValueError(
                        f"tile_size {tile_size} must be positive "
                        "multiples of 16 (TIFF 6.0 §15)"
                    )
                for y0 in range(0, h, tl):
                    for x0 in range(0, w, tw):
                        tile = np.zeros((tl, tw, spp_eff), dtype=px.dtype)
                        srcb = grid[y0: y0 + tl, x0: x0 + tw]
                        tile[: srcb.shape[0], : srcb.shape[1]] = srcb
                        block = tile.reshape(tl, tw * spp_eff)
                        if predictor:
                            block = _diff(block, tw, spp_eff)
                        out_blocks.append(
                            _pack(block.astype(enc_dt).tobytes())
                        )
            else:
                flat_g = grid.reshape(h, w * spp_eff)
                for r0 in range(0, h, rows_per_strip):
                    rows = flat_g[r0: r0 + rows_per_strip]
                    if predictor:
                        rows = _diff(rows, w, spp_eff)
                    out_blocks.append(
                        _pack(rows.astype(enc_dt).tobytes())
                    )
            return out_blocks

        bilevel = comp_code in (2, 3, 4)
        if comp_code == 7:
            # new-style JPEG-in-TIFF: one self-contained JIF stream per
            # strip (LOSSY — the one non-lossless path in this module,
            # inherent to the compression; round-trips are exact only
            # for DC-only content like the JPEG module's own oracle)
            from evolution_spark.operators.multimodal import encode_jpeg

            if px.dtype != np.uint8:
                raise ValueError("JPEG-in-TIFF takes 8-bit pages")
            if tile_size is not None or planar or predictor:
                raise ValueError(
                    "JPEG-in-TIFF is strip-only here, no predictor"
                )
            strips = [
                encode_jpeg(px[r0: r0 + rows_per_strip], quality=90)
                for r0 in range(0, h, rows_per_strip)
            ]
        elif bilevel:
            # CCITT fax: (h, w) 0/1 intensities (1 = white), written as
            # photometric 0 (WhiteIsZero) strips of the BLACK mask
            from evolution_spark.operators.fax import encode_g4, encode_mh  # noqa: F401

            if not gray or px.dtype != np.uint8 or px.max(initial=0) > 1:
                raise ValueError(
                    "CCITT compression takes a (h, w) 0/1 uint8 page "
                    "(1 = white)"
                )
            if tile_size is not None or planar or predictor:
                raise ValueError(
                    "CCITT fax pages are strip-only, no predictor"
                )
            if comp_code == 3:
                from evolution_spark.operators.fax import encode_t4

                def enc(rows):
                    return encode_t4(rows, two_d=t4_two_d)
            else:
                enc = encode_mh if comp_code == 2 else encode_g4
            depth = 1
            strips = [
                enc(1 - px[r0: r0 + rows_per_strip])
                for r0 in range(0, h, rows_per_strip)
            ]
        else:
            grid_all = px.reshape(h, w, spp)
            if planar:
                strips = []
                for p in range(spp):
                    strips += _blocks(grid_all[..., p: p + 1], 1)
            else:
                strips = _blocks(grid_all, spp)
        strip_offsets = []
        for sdata in strips:
            strip_offsets.append(len(out))
            out += sdata
        if len(out) % 2:
            out += b"\x00"

        entries = []

        def entry(tag, typ, vals):
            entries.append((tag, typ, vals))

        entry(256, 4, [w])
        entry(257, 4, [h])
        entry(258, 3, [depth] * spp)
        entry(259, 3, [comp_code])
        entry(262, 3, [0 if bilevel else (1 if gray else 2)])
        entry(277, 3, [spp])
        if planar:
            entry(284, 3, [2])
        if comp_code == 3:
            entry(292, 4, [1 if t4_two_d else 0])
        if tile_size is not None:
            entry(322, 4, [tile_size[0]])
            entry(323, 4, [tile_size[1]])
            entry(324, 4, strip_offsets)
            entry(325, 4, [len(s) for s in strips])
        else:
            entry(273, 4, strip_offsets)
            entry(278, 4, [min(rows_per_strip, h)])
            entry(279, 4, [len(s) for s in strips])
        if predictor:
            entry(317, 3, [2])
        entries.sort()

        # out-of-line value areas first
        extra = bytearray()
        ifd_off_guess = len(out)
        # compute IFD size: 2 + 12*n + 4
        ifd_size = 2 + 12 * len(entries) + 4
        extra_base = ifd_off_guess + ifd_size
        enc_entries = []
        for tag, typ, vals in entries:
            step = _TYPE_SIZES[typ]
            size = step * len(vals)
            raw = b"".join(
                int(v).to_bytes(step, "little") for v in vals
            )
            if size <= 4:
                enc_entries.append(
                    (tag, typ, len(vals), raw + bytes(4 - size))
                )
            else:
                enc_entries.append((
                    tag, typ, len(vals),
                    (extra_base + len(extra)).to_bytes(4, "little"),
                ))
                extra += raw
        ifd = bytearray()
        ifd += len(enc_entries).to_bytes(2, "little")
        for tag, typ, cnt, val in enc_entries:
            ifd += tag.to_bytes(2, "little")
            ifd += typ.to_bytes(2, "little")
            ifd += cnt.to_bytes(4, "little")
            ifd += val
        ifd += bytes(4)  # next-IFD link (patched for multi-page)
        ifd_off = len(out)
        out[prev_link: prev_link + 4] = ifd_off.to_bytes(4, "little")
        prev_link = ifd_off + 2 + 12 * len(enc_entries)
        out += ifd
        out += extra
        if len(out) % 2:
            out += b"\x00"
    return bytes(out)
