"""Shared LZW codec for the two container dialects in this repo.

One implementation, two parameterizations (the classic pair of LZW
deployment quirks):

- GIF: LSB-first bit packing, "late change" code-width growth (the
  decoder's dictionary lags the encoder's by one entry, so the encoder
  widens one entry after the decoder's ``next == 2^width`` rule);
- TIFF: MSB-first bit packing, "early change" growth (widths bump one
  code earlier — at ``2^width - 1`` — the historical libtiff behavior
  every real-world TIFF follows).

Both sides share the dictionary machinery, the KwKwK self-reference
case, the 12-bit cap, and clear-code resets."""

from __future__ import annotations


def lzw_decode(
    data: bytes,
    min_code_size: int,
    expected: int,
    *,
    msb_first: bool,
    early_change: bool,
) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    bitpos = 0
    total_bits = len(data) * 8
    dec_bump = -1 if early_change else 0

    def next_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        if msb_first:
            for i in range(width):
                byte = data[(bitpos + i) >> 3]
                v = (v << 1) | ((byte >> (7 - ((bitpos + i) & 7))) & 1)
        else:
            for i in range(width):
                byte = data[(bitpos + i) >> 3]
                v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def reset():
        table = {i: (i,) for i in range(clear)}
        return table, clear + 2, min_code_size + 1

    table, next_idx, width = reset()
    prev: tuple[int, ...] | None = None
    while len(out) < expected:
        code = next_code(width)
        if code is None:
            break  # truncated streams decode what they have
        if code == clear:
            table, next_idx, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_idx and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code} (corrupt stream)")
        out.extend(entry)
        if prev is not None and next_idx < 4096:
            table[next_idx] = prev + (entry[0],)
            next_idx += 1
            if next_idx == (1 << width) + dec_bump and width < 12:
                width += 1
        prev = entry
    return out[:expected]


def lzw_encode(
    indices: list[int],
    min_code_size: int,
    *,
    msb_first: bool,
    early_change: bool,
) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []
    # the encoder widens one entry LATER than the decoder's rule — its
    # dictionary runs one entry ahead (the decoder adds prev+first(cur)
    # only after reading the next code)
    enc_bump = 0 if early_change else 1
    # leave the decoder's one-entry lag room before the 4096 cap
    cap = 4094 if early_change else 4096

    def reset():
        return {(i,): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_idx, width = reset()
    out_bits.append((clear, width))
    cur: tuple[int, ...] = ()
    for sym in indices:
        cand = cur + (sym,)
        if cand in table:
            cur = cand
            continue
        out_bits.append((table[cur], width))
        if next_idx < cap:
            table[cand] = next_idx
            next_idx += 1
            if next_idx == (1 << width) + enc_bump and width < 12:
                width += 1
        else:
            out_bits.append((clear, width))
            table, next_idx, width = reset()
        cur = (sym,)
    if cur:
        out_bits.append((table[cur], width))
    out_bits.append((eoi, width))

    data = bytearray()
    acc = 0
    nbits = 0
    if msb_first:
        for code, w in out_bits:
            acc = (acc << w) | code
            nbits += w
            while nbits >= 8:
                data.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
            acc &= (1 << nbits) - 1
        if nbits:
            data.append((acc << (8 - nbits)) & 0xFF)
    else:
        for code, w in out_bits:
            acc |= code << nbits
            nbits += w
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
    return bytes(data)
