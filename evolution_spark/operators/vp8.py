"""Lossy VP8 intra key-frame codec (RFC 6386) — pure Python/numpy.

Round 14 (VERDICT item 3): the largest remaining decode gap by corpus
bytes. ``decode_vp8_frame`` decodes a key frame end-to-end — boolean
arithmetic decoder, frame/segment/filter headers, per-macroblock intra
mode trees, token-tree coefficient decode with band/context modeling,
dequantization, 4x4 inverse DCT + Walsh-Hadamard for the Y2 block, all
intra predictors (16x16 DC/V/H/TM with edge variants, the ten 4x4
B-modes, 8x8 chroma), and the normal + simple in-loop deblocking
filters. ``encode_vp8_frame`` is the round-trip fixture generator: a
real (if deliberately simple) VP8 encoder — per-macroblock 16x16/4x4
intra mode selection by SAD, forward DCT/WHT, quantization, and
token/mode emission through the boolean encoder — whose output any
conformant decoder reconstructs bit-exactly.

Validation level (stated plainly): the implementation is written from
the public RFC 6386 text/appendices and validated by (a) round-trip —
decode(encode(img)) reproduces the encoder's own reconstruction
bit-exactly across mode/quantizer/filter sweeps, (b) structural tests
on each stage (bool coder identities, IDCT/WHT inverses, predictor
edge rules), and (c) the mutation-fuzz error contract. No external
conformance vectors or reference decoder exist in this offline build
environment, so the large TRAINED constant tables (default/update
coefficient probabilities, key-frame B-mode probabilities) carry a
transcription risk that round-trip testing cannot expose by
construction; a first real-corpus deployment should spot-check one
frame against a reference decoder. Structural tables (trees, quant
lookups, scan order, category probabilities) are cross-checked by the
stage tests.

Scale shape: decode runs inside the same Arrow-batched ``mapInPandas``
envelope as every other from-spec codec here (operators/multimodal.py)
— per-payload-linear, partition-preserving, multi-MB corpora bounded
by ``cap_payload_partitions``. This is a bit-serial Python codec: see
the BASELINE codec-tier table for its measured ms/MB envelope.

Ref parity: extension surface — the reference
(crates/evolution-slicer/src/slicer.rs) has no media decode.
"""
from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7)
# --------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder: 8-bit probabilities, 16-bit
    value window, byte-at-a-time renormalization. Reading past the end
    of the partition yields zero bits (the spec's convention) but sets
    ``overrun`` so callers can refuse truncated streams."""

    __slots__ = ("data", "pos", "value", "range", "bit_count",
                 "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.overrun = len(data) < 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def decode(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
                else:
                    self.overrun = True
        return ret

    def literal(self, nbits: int) -> int:
        """n raw bits, MSB first, each at probability 128."""
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode(128)
        return v

    def signed(self, nbits: int) -> int:
        """Magnitude then sign flag (RFC §9: sign AFTER the value)."""
        v = self.literal(nbits)
        return -v if self.decode(128) else v

    def tree(self, tree: list[int], probs, start: int = 0) -> int:
        """Walk a token tree: negative entries are leaves."""
        i = start
        while True:
            i = tree[i + self.decode(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §7.3 boolean encoder (carry-propagating)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _add_one_to_output(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1
        else:
            # carry out of the leading byte cannot happen for a
            # stream started below 1.0; keep a guard anyway
            self.out.insert(0, 1)

    def encode(self, bit: int, prob: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            if self.bottom & (1 << 31):
                self._add_one_to_output()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.range <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, value: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            self.encode((value >> k) & 1, 128)

    def signed(self, value: int, nbits: int):
        self.literal(abs(value), nbits)
        self.encode(1 if value < 0 else 0, 128)

    def tree(self, tree: list[int], probs, leaf: int, start: int = 0):
        """Emit the bit path from ``start`` to leaf ``-leaf``."""
        path = []
        found = self._find(tree, start, -leaf, path)
        assert found, f"leaf {leaf} unreachable"
        for node, bit in path:
            self.encode(bit, probs[node >> 1])

    def _find(self, tree, i, target, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            path.append((i, bit))
            if nxt == target and nxt <= 0:
                return True
            if nxt > 0 and self._find(tree, nxt, target, path):
                return True
            path.pop()
        return False

    def done(self) -> bytes:
        # flush: push out 32 more bits
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._add_one_to_output()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


# --------------------------------------------------------------------
# Constant tables (RFC 6386 appendices; see module docstring for the
# validation level of the TRAINED tables vs the structural ones)
# --------------------------------------------------------------------

# 16x16 luma modes / chroma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 submodes
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED,
                 -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]
BMODE_TREE = [
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
]
# the 16x16 mode a neighbor contributes as B-mode context
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

MB_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

# dequantization lookups (RFC 6386 §14.1)
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
]
AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# coefficient token alphabet (RFC 6386 §13.2)
(DCT_0, DCT_1, DCT_2, DCT_3, DCT_4, DCT_CAT1, DCT_CAT2, DCT_CAT3,
 DCT_CAT4, DCT_CAT5, DCT_CAT6, DCT_EOB) = range(12)
COEF_TREE = [
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -DCT_CAT1, -DCT_CAT2,
    18, 20,
    -DCT_CAT3, -DCT_CAT4,
    -DCT_CAT5, -DCT_CAT6,
]
CAT_PROBS = {
    DCT_CAT1: [159],
    DCT_CAT2: [165, 145],
    DCT_CAT3: [173, 148, 140],
    DCT_CAT4: [176, 155, 140, 135],
    DCT_CAT5: [180, 157, 141, 134, 130],
    DCT_CAT6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}
CAT_BASE = {DCT_CAT1: 5, DCT_CAT2: 7, DCT_CAT3: 11, DCT_CAT4: 19,
            DCT_CAT5: 35, DCT_CAT6: 67}

COEF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


# Trained tables (RFC 6386 §13.4/§13.5/§11.2 appendix data). NOTE
# (module docstring): transcribed from the published appendices;
# round-trip tests exercise them consistently on both sides but cannot
# detect a transcription slip — conformance spot-check advised before
# trusting pixel output on externally-encoded frames.
DEFAULT_COEF_PROBS = [
    [  # block type 0 (Y after Y2)
        [[253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
         [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
         [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128]],
        [[1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128],
         [181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128],
         [78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128]],
        [[1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128],
         [184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128],
         [77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128]],
        [[1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128],
         [170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128],
         [37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128]],
        [[1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128],
         [207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128],
         [102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128]],
        [[1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128],
         [177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128],
         [80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128]],
        [[1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [245, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 1 (Y2)
        [[198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
         [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
         [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128]],
        [[1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
         [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
         [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128]],
        [[1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
         [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
         [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128]],
        [[1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
         [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
         [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128]],
        [[1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
         [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
         [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128]],
        [[1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
         [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
         [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128]],
        [[1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
         [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
         [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128]],
        [[1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
         [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128]],
    ],
    [  # block type 2 (chroma)
        [[253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128],
         [175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128],
         [73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128]],
        [[1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128],
         [239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128],
         [155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128]],
        [[1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128],
         [201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128],
         [69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128]],
        [[1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128],
         [141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128],
         [149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128],
         [213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128],
         [55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 3 (Y without Y2 — B_PRED)
        [[202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
         [126, 38, 166, 203, 165, 160, 226, 139, 243, 221, 255],
         [61, 46, 138, 188, 135, 122, 189, 178, 228, 200, 255]],
        [[1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
         [166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128],
         [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128]],
        [[1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
         [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
         [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128]],
        [[1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
         [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
         [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128]],
        [[1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
         [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
         [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128]],
        [[1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
         [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
         [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128]],
        [[1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
         [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
         [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128]],
        [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
]


def _update_probs_table():
    """COEF_UPDATE_PROBS [4][8][3][11] (RFC 6386 §13.4). The table is
    overwhelmingly 255 outside the first coefficient bands; the early-
    band texture below is transcribed best-effort, the remainder is
    the dominant 255 (see the module docstring's conformance note —
    both codec sides here share whatever this table says, so round-
    trip is exact regardless; only externally-encoded streams with
    per-frame prob updates are sensitive to entry-level slips)."""
    t = [[[[255] * 11 for _ in range(3)] for _ in range(8)]
         for _ in range(4)]
    early = {
        (0, 0, 0): [255, 253, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (0, 0, 1): [255, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (0, 0, 2): [255, 254, 253, 255, 254, 255, 255, 255, 255, 255,
                    255],
        (0, 1, 0): [255, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (1, 0, 0): [217, 255, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (1, 0, 1): [225, 252, 241, 253, 255, 254, 254, 254, 254, 254,
                    254],
        (1, 0, 2): [234, 250, 241, 250, 253, 255, 254, 254, 254, 254,
                    254],
        (2, 0, 0): [186, 255, 255, 255, 255, 254, 254, 254, 254, 254,
                    254],
        (2, 0, 1): [234, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (2, 0, 2): [251, 255, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (3, 0, 0): [248, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (3, 0, 1): [250, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
        (3, 0, 2): [254, 254, 254, 254, 254, 254, 254, 254, 254, 254,
                    254],
    }
    for (i, j, k), row in early.items():
        t[i][j][k] = row
    return t


COEF_UPDATE_PROBS = _update_probs_table()


def _kf_bmode_table():
    """KF_BMODE_PROB [10][10][9] (RFC 6386 §11.2 appendix): the
    (above=B_DC, left=B_DC) context row is transcribed from the
    appendix; the remaining 99 context rows use a smoothed prior that
    biases toward the context's own modes — explicitly NOT the trained
    appendix data (module docstring conformance note; the fixture
    encoder and this decoder share the table, so round-trip is exact
    and a later conformance pass only swaps constants)."""
    base = [120, 90, 79, 133, 87, 85, 80, 111, 151]
    t = []
    for above in range(10):
        row = []
        for left in range(10):
            probs = list(base)
            # nudge the tree toward the contextual modes: contexts
            # strongly predict repeating the neighboring submode
            for m in (above, left):
                if m == B_DC_PRED:
                    probs[0] = min(230, probs[0] + 50)
                elif m == B_TM_PRED:
                    probs[1] = min(230, probs[1] + 40)
                elif m == B_VE_PRED:
                    probs[2] = min(230, probs[2] + 40)
                elif m == B_HE_PRED:
                    probs[3] = max(40, probs[3] - 30)
            row.append(probs)
        t.append(row)
    t[0][0] = [231, 120, 48, 89, 115, 113, 120, 152, 112]
    return t


KF_BMODE_PROB = _kf_bmode_table()


# --------------------------------------------------------------------
# Transforms (RFC 6386 §14.3/§14.4 — exact integer inverse; the
# forward transforms are encoder-side only and need no spec identity,
# since reconstruction on BOTH sides goes through the inverse)
# --------------------------------------------------------------------

_COS = 20091  # sqrt(2)*cos(pi/8) - 1, Q16 (RFC 14.3)
_SIN = 35468  # sqrt(2)*sin(pi/8), Q16


def idct4x4(block) -> np.ndarray:
    """RFC 6386 §14.3 exact inverse DCT: columns then rows, final
    (x + 4) >> 3. Input/output: 4x4 int array."""
    ip = [int(v) for v in np.asarray(block).ravel()]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _SIN) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _COS) >> 16)
        t2 = (ip[12 + i] * _SIN) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _SIN) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _COS) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _COS) >> 16)
        t2 = (tmp[r + 3] * _SIN) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return np.array(out, dtype=np.int64).reshape(4, 4)


def iwht4x4(block) -> np.ndarray:
    """RFC 6386 §14.3 inverse Walsh-Hadamard for the Y2 block."""
    ip = [int(v) for v in np.asarray(block).ravel()]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return np.array(out, dtype=np.int64).reshape(4, 4)


# forward transforms (encoder-side; defined as scaled inverses of the
# decoder's linear maps so quantized coefficients land in range)
_C_DCT = np.array([
    [1.0, 1.0, 1.0, 1.0],
    [1 + _COS / 65536, _SIN / 65536, -_SIN / 65536, -(1 + _COS / 65536)],
    [1.0, -1.0, -1.0, 1.0],
    [_SIN / 65536, -(1 + _COS / 65536), 1 + _COS / 65536, -_SIN / 65536],
])
_C_WHT = np.array([
    [1, 1, 1, 1],
    [1, 1, -1, -1],
    [1, -1, -1, 1],
    [1, -1, 1, -1],
], dtype=np.float64)


def fdct4x4(block) -> np.ndarray:
    x = np.asarray(block, dtype=np.float64)
    return np.rint(_C_DCT @ x @ _C_DCT.T / 2.0).astype(np.int64)


def fwht4x4(block) -> np.ndarray:
    x = np.asarray(block, dtype=np.float64)
    return np.rint(_C_WHT.T @ x @ _C_WHT / 2.0).astype(np.int64)


# --------------------------------------------------------------------
# Intra prediction (RFC 6386 §12). All predictors operate on a padded
# plane: row -1 is the 127 above-border (extended 4 px right of the
# frame for above-right reads), column -1 the 129 left-border, and
# the shared helpers are used by BOTH codec sides so reconstruction
# is one code path.
# --------------------------------------------------------------------


def _pad_plane(h: int, w: int) -> np.ndarray:
    buf = np.empty((h + 1, w + 5), dtype=np.int64)
    buf[0, :] = 127
    buf[:, 0] = 129
    buf[0, 0] = 127
    buf[1:, w + 1:] = 127  # right extension: above-right of the
    # rightmost macroblock reads 127 at every row (RFC 12.3)
    return buf


def _pred_dc(buf, y, x, size, have_above, have_left) -> np.ndarray:
    above = buf[y - 1, x: x + size]
    left = buf[y: y + size, x - 1]
    if have_above and have_left:
        dc = (int(above.sum()) + int(left.sum()) + size) >> \
            (5 if size == 16 else 4)
    elif have_above:
        dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
    elif have_left:
        dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, dtype=np.int64)


def _pred_block(buf, y, x, size, mode, have_above, have_left):
    if mode == DC_PRED:
        return _pred_dc(buf, y, x, size, have_above, have_left)
    if mode == V_PRED:
        return np.tile(buf[y - 1, x: x + size], (size, 1))
    if mode == H_PRED:
        return np.tile(buf[y: y + size, x - 1][:, None], (1, size))
    # TM_PRED: clamp(left + above - above_left)
    p = int(buf[y - 1, x - 1])
    out = (buf[y: y + size, x - 1][:, None]
           + buf[y - 1, x: x + size][None, :] - p)
    return np.clip(out, 0, 255)


def _pred_b(buf, y, x, mode, tr4) -> np.ndarray:
    """4x4 subblock predictor. ``tr4``: the cached above-right pixels
    used by right-column subblocks (RFC 12.3's top-right reuse rule);
    pass None to read the buffer directly (non-right columns)."""
    A = np.empty(8, dtype=np.int64)
    A[:4] = buf[y - 1, x: x + 4]
    A[4:] = tr4 if tr4 is not None else buf[y - 1, x + 4: x + 8]
    L = buf[y: y + 4, x - 1].astype(np.int64)
    P = int(buf[y - 1, x - 1])
    out = np.empty((4, 4), dtype=np.int64)
    if mode == B_DC_PRED:
        out[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        out[:] = np.clip(L[:, None] + A[None, :4] - P, 0, 255)
    elif mode == B_VE_PRED:
        e = np.concatenate(([P], A[:5]))
        row = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        out[:] = row[None, :]
    elif mode == B_HE_PRED:
        e = np.concatenate(([P], L, [L[3]]))
        col = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        out[:] = col[:, None]
    elif mode == B_LD_PRED:
        e = np.concatenate((A, [A[7]]))
        d = (e[:7] + 2 * e[1:8] + e[2:9] + 2) >> 2
        for r in range(4):
            out[r] = d[r: r + 4]
    elif mode == B_RD_PRED:
        e = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2],
                      A[3]], dtype=np.int64)
        d = (e[:7] + 2 * e[1:8] + e[2:9] + 2) >> 2
        for r in range(4):
            out[r] = d[3 - r: 7 - r]
    elif mode == B_VR_PRED:
        # E[0..8] = L3 L2 L1 L0 P A0 A1 A2 A3 (RFC 12.3 edge order)
        E = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2],
                      A[3]], dtype=np.int64)
        d = (E[:7] + 2 * E[1:8] + E[2:9] + 2) >> 2   # d[k]: center E[k+1]
        v = (E[4:8] + E[5:9] + 1) >> 1               # half-sample col
        out[3] = [d[1], d[3], d[4], d[5]]
        out[2] = [d[2], v[0], v[1], v[2]]
        out[1] = [d[3], d[4], d[5], d[6]]
        out[0] = [v[0], v[1], v[2], v[3]]
    elif mode == B_VL_PRED:
        v = (A[:4] + A[1:5] + 1) >> 1
        d = (A[:6] + 2 * A[1:7] + A[2:8] + 2) >> 2
        out[0] = v
        out[1] = d[:4]
        out[2] = [v[1], v[2], v[3], d[4]]  # last two break the
        out[3] = [d[1], d[2], d[3], d[5]]  # pattern (RFC comment)
    elif mode == B_HD_PRED:
        E = np.array([L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]],
                     dtype=np.int64)
        v = (E[:5] + E[1:6] + 1) >> 1
        d = (E[:6] + 2 * E[1:7] + E[2:8] + 2) >> 2
        out[3] = [v[0], d[0], v[1], d[1]]
        out[2] = [v[1], d[1], v[2], d[2]]
        out[1] = [v[2], d[2], v[3], d[3]]
        out[0] = [v[3], d[3], d[4], d[5]]
    else:  # B_HU_PRED
        l0, l1, l2, l3 = (int(v) for v in L)
        out[0] = [(l0 + l1 + 1) >> 1, (l0 + 2 * l1 + l2 + 2) >> 2,
                  (l1 + l2 + 1) >> 1, (l1 + 2 * l2 + l3 + 2) >> 2]
        out[1] = [(l1 + l2 + 1) >> 1, (l1 + 2 * l2 + l3 + 2) >> 2,
                  (l2 + l3 + 1) >> 1, (l2 + 3 * l3 + 2) >> 2]
        out[2] = [(l2 + l3 + 1) >> 1, (l2 + 3 * l3 + 2) >> 2, l3, l3]
        out[3] = [l3, l3, l3, l3]
    return out


# --------------------------------------------------------------------
# Dequantization (RFC 6386 §14.1)
# --------------------------------------------------------------------


def _quant_factors(y_ac_qi: int, deltas: dict, seg_delta: int = 0,
                   seg_abs: bool = False) -> dict:
    q = seg_delta if seg_abs else y_ac_qi + seg_delta

    def cl(x):
        return max(0, min(127, x))

    y2ac = AC_QLOOKUP[cl(q + deltas.get("y2ac", 0))] * 155 // 100
    uvdc = DC_QLOOKUP[cl(q + deltas.get("uvdc", 0))]
    return {
        "y1dc": DC_QLOOKUP[cl(q + deltas.get("ydc", 0))],
        "y1ac": AC_QLOOKUP[cl(q)],
        "y2dc": DC_QLOOKUP[cl(q + deltas.get("y2dc", 0))] * 2,
        "y2ac": max(8, y2ac),
        "uvdc": min(132, uvdc),
        "uvac": AC_QLOOKUP[cl(q + deltas.get("uvac", 0))],
    }


# --------------------------------------------------------------------
# Coefficient token decode (RFC 6386 §13)
# --------------------------------------------------------------------


def _decode_block_coeffs(bd: BoolDecoder, probs, plane: int, ctx: int,
                         qdc: int, qac: int):
    """Decode one 4x4 block's tokens -> (natural-order dequantized
    coeff array, had_tokens flag). ``ctx`` is above_nz + left_nz."""
    first = 1 if plane == 0 else 0
    coeffs = np.zeros(16, dtype=np.int64)
    i = first
    prev_zero = False
    while i < 16:
        p = probs[plane][COEF_BANDS[i]][ctx]
        tok = bd.tree(COEF_TREE, p, start=2 if prev_zero else 0)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            prev_zero = True
            i += 1
            continue
        prev_zero = False
        if tok <= DCT_4:
            v = tok
        else:
            extra = 0
            for pb in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.decode(pb)
            v = CAT_BASE[tok] + extra
        if bd.decode(128):
            v = -v
        ctx = 2 if abs(v) > 1 else 1
        coeffs[ZIGZAG[i]] = v * (qdc if i == 0 else qac)
        i += 1
    return coeffs, i != first


def _clip_add(buf, y, x, pred, residual):
    buf[y: y + 4, x: x + 4] = np.clip(pred + residual, 0, 255)


class _FrameHeader:
    pass


def decode_vp8_frame(data: bytes, apply_filter: bool = True):
    """Decode one VP8 KEY frame -> dict with ``y`` ``u`` ``v`` uint8
    planes (YUV 4:2:0), ``width``/``height``, header fields, and
    ``used_synth_bmode`` (True when any B_PRED submode was read from
    a synthesized KF_BMODE_PROB context row — i.e. any context other
    than the transcribed (B_DC, B_DC) row).

    PROVENANCE CONTRACT: only streams produced by this module's own
    :func:`encode_vp8_frame` are safe to decode until the full RFC
    6386 appendix tables are transcribed and conformance-checked —
    99 of 100 KF_BMODE_PROB context rows and most of
    COEF_UPDATE_PROBS are synthesized, so an externally-encoded
    stream can silently desync into wrong pixels. Two guards narrow
    the blast radius: frames requesting coefficient-probability
    updates are refused outright (this encoder never emits them, so
    such a frame is provably external), and ``used_synth_bmode``
    lets callers audit whether a decode leaned on synthesized rows.

    Raises ValueError on anything structurally corrupt (the
    mapInPandas quarantine contract); interframes are a refusal."""
    data = bytes(data)
    if len(data) < 10:
        raise ValueError("VP8 frame shorter than its headers")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError(
            "VP8 interframe: only key (intra) frames decode — a WebP "
            "STILL is always a key frame (animated lossy WebP frames "
            "remain a refusal in decode_webp_animation)"
        )
    version = (tag >> 1) & 7
    if version > 3:
        raise ValueError(f"VP8 version {version} reserved")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 key frame start code missing")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if not width or not height:
        raise ValueError(f"implausible VP8 dimensions {width}x{height}")
    if width * height > (1 << 26):
        # deliberate resource bound, not a spec limit: this is a
        # bit-serial Python decoder (~3.7 s per raw MB), so a 268 MP
        # spec-max frame would hold a task for tens of minutes
        raise ValueError(
            f"VP8 frame {width}x{height} exceeds the decoder's 64 MP "
            "resource bound (bit-serial Python decode)"
        )
    if 10 + part1_size > len(data):
        raise ValueError("VP8 first partition overruns the frame")
    bd = BoolDecoder(data[10: 10 + part1_size])

    hdr = _FrameHeader()
    hdr.width, hdr.height = width, height
    bd.literal(1)  # color space (0 = YUV as here)
    bd.literal(1)  # clamping type (decoded pixels are clamped anyway)

    # --- segmentation -------------------------------------------------
    seg_enabled = bd.decode(128)
    update_map = False
    seg_tree_probs = [255, 255, 255]
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_abs = False
    if seg_enabled:
        update_map = bool(bd.decode(128))
        update_data = bd.decode(128)
        if update_data:
            seg_abs = bool(bd.decode(128))
            for s in range(4):
                if bd.decode(128):
                    seg_q[s] = bd.signed(7)
            for s in range(4):
                if bd.decode(128):
                    seg_lf[s] = bd.signed(6)
        if update_map:
            for s in range(3):
                if bd.decode(128):
                    seg_tree_probs[s] = bd.literal(8)

    # --- loop filter ---------------------------------------------------
    filter_type = bd.decode(128)  # 0 normal, 1 simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.decode(128)
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.decode(128):  # deltas updated this frame
            for k in range(4):
                if bd.decode(128):
                    ref_lf_deltas[k] = bd.signed(6)
            for k in range(4):
                if bd.decode(128):
                    mode_lf_deltas[k] = bd.signed(6)

    # --- token partitions ---------------------------------------------
    n_parts = 1 << bd.literal(2)
    part_base = 10 + part1_size
    sizes_end = part_base + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise ValueError("VP8 partition size table truncated")
    parts = []
    off = sizes_end
    for k in range(n_parts):
        if k < n_parts - 1:
            sz = (data[part_base + 3 * k]
                  | (data[part_base + 3 * k + 1] << 8)
                  | (data[part_base + 3 * k + 2] << 16))
        else:
            sz = len(data) - off
        if sz < 0 or off + sz > len(data):
            raise ValueError("VP8 token partition overruns the frame")
        parts.append(BoolDecoder(data[off: off + sz]))
        off += sz

    # --- quantizers ----------------------------------------------------
    y_ac_qi = bd.literal(7)
    deltas = {}
    for name in ("ydc", "y2dc", "y2ac", "uvdc", "uvac"):
        deltas[name] = bd.signed(4) if bd.decode(128) else 0
    hdr.y_ac_qi, hdr.q_deltas = y_ac_qi, deltas
    quant = [
        _quant_factors(y_ac_qi, deltas, seg_q[s] if seg_enabled else 0,
                       seg_abs)
        for s in range(4)
    ]

    bd.decode(128)  # refresh entropy probs (no cross-frame state here)

    # --- token probability updates --------------------------------------
    # HARD GUARD (round 15): this repo's encoder writes a 0 for every
    # update flag, so ANY set flag proves the frame was encoded
    # elsewhere — and COEF_UPDATE_PROBS is mostly synthesized 255-fill
    # (module docstring), so decoding the update stream itself would
    # already be reading unverified probabilities. Refuse loudly
    # rather than desync into silently wrong pixels.
    probs = [[[list(r) for r in c] for c in b]
             for b in DEFAULT_COEF_PROBS]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    if bd.decode(COEF_UPDATE_PROBS[i][j][k][t]):
                        raise ValueError(
                            "VP8 frame requests coefficient-"
                            "probability updates: provably not from "
                            "this module's encoder, and the update-"
                            "probability table is partly synthesized "
                            "(no offline conformance vectors) — "
                            "external lossy VP8 streams are refused "
                            "even under vp8='roundtrip'"
                        )

    mb_no_skip = bd.decode(128)
    skip_prob = bd.literal(8) if mb_no_skip else 0

    if bd.overrun:
        raise ValueError("VP8 first partition truncated")

    # --- frame reconstruction -------------------------------------------
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    Y = _pad_plane(mb_h * 16, mb_w * 16)
    U = _pad_plane(mb_h * 8, mb_w * 8)
    V = _pad_plane(mb_h * 8, mb_w * 8)

    # nonzero contexts
    above_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_y2 = np.zeros(mb_w, dtype=np.int8)
    above_sub = np.full((mb_w, 4), B_DC_PRED, dtype=np.int8)

    mb_info = []  # (filter_level, skip_inner) per MB for the loop filter
    used_synth_bmode = False  # any B_PRED submode read outside (DC,DC)?

    for mby in range(mb_h):
        left_y = np.zeros(4, dtype=np.int8)
        left_u = np.zeros(2, dtype=np.int8)
        left_v = np.zeros(2, dtype=np.int8)
        left_y2 = 0
        left_sub = np.full(4, B_DC_PRED, dtype=np.int8)
        td = parts[mby % n_parts]
        row_info = []
        for mbx in range(mb_w):
            segment = 0
            if seg_enabled and update_map:
                segment = bd.tree(MB_SEGMENT_TREE, seg_tree_probs)
            skip = bd.decode(skip_prob) if mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                submodes = np.empty(16, dtype=np.int8)
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    above_m = (above_sub[mbx][c] if r == 0
                               else submodes[sb - 4])
                    left_m = (left_sub[r] if c == 0
                              else submodes[sb - 1])
                    if above_m != B_DC_PRED or left_m != B_DC_PRED:
                        # only the (B_DC, B_DC) KF_BMODE_PROB row is
                        # transcribed from the RFC appendix; every
                        # other context row is a synthesized prior
                        # (see _kf_bmode_table) — surface that fact
                        # to callers via used_synth_bmode
                        used_synth_bmode = True
                    m = bd.tree(BMODE_TREE,
                                KF_BMODE_PROB[above_m][left_m])
                    submodes[sb] = m
            else:
                submodes = np.full(16, MODE_TO_BMODE[ymode],
                                   dtype=np.int8)
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            above_sub[mbx] = submodes[12:]
            left_sub[:] = submodes[3::4]

            qf = quant[segment]
            have_above = mby > 0
            have_left = mbx > 0
            y0, x0 = mby * 16 + 1, mbx * 16 + 1
            cy0, cx0 = mby * 8 + 1, mbx * 8 + 1

            has_coeffs = False
            y_dcs = None
            if skip:
                left_y[:] = 0
                left_u[:] = 0
                left_v[:] = 0
                above_y[mbx] = 0
                above_u[mbx] = 0
                above_v[mbx] = 0
                if ymode != B_PRED:
                    left_y2 = 0
                    above_y2[mbx] = 0
                resid_y = np.zeros((16, 16), dtype=np.int64)
                resid_u = np.zeros((8, 8), dtype=np.int64)
                resid_v = np.zeros((8, 8), dtype=np.int64)
                if ymode != B_PRED:
                    y_dcs = np.zeros(16, dtype=np.int64)
            else:
                if ymode != B_PRED:
                    c2, nz2 = _decode_block_coeffs(
                        td, probs, 1, int(above_y2[mbx]) + left_y2,
                        qf["y2dc"], qf["y2ac"])
                    above_y2[mbx] = left_y2 = int(nz2)
                    has_coeffs |= nz2
                    y_dcs = iwht4x4(c2.reshape(4, 4)).ravel()
                plane = 0 if ymode != B_PRED else 3
                resid_y = np.zeros((16, 16), dtype=np.int64)
                y_nz = np.zeros(16, dtype=np.int8)
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    ctx = int(above_y[mbx][c] if r == 0
                              else y_nz[sb - 4]) + \
                        int(left_y[r] if c == 0 else y_nz[sb - 1])
                    coeffs, nz = _decode_block_coeffs(
                        td, probs, plane, ctx, qf["y1dc"], qf["y1ac"])
                    if y_dcs is not None:
                        coeffs[0] = y_dcs[sb]
                    y_nz[sb] = int(nz)
                    has_coeffs |= nz
                    resid_y[r * 4: r * 4 + 4, c * 4: c * 4 + 4] = \
                        idct4x4(coeffs.reshape(4, 4))
                above_y[mbx] = y_nz[12:]
                left_y[:] = y_nz[3::4]
                resid_u = np.zeros((8, 8), dtype=np.int64)
                resid_v = np.zeros((8, 8), dtype=np.int64)
                for plane_buf, resid, a_nz, l_nz in (
                        ("u", resid_u, above_u, left_u),
                        ("v", resid_v, above_v, left_v)):
                    nz4 = np.zeros(4, dtype=np.int8)
                    for sb in range(4):
                        r, c = divmod(sb, 2)
                        ctx = int(a_nz[mbx][c] if r == 0
                                  else nz4[sb - 2]) + \
                            int(l_nz[r] if c == 0 else nz4[sb - 1])
                        coeffs, nz = _decode_block_coeffs(
                            td, probs, 2, ctx, qf["uvdc"], qf["uvac"])
                        nz4[sb] = int(nz)
                        has_coeffs |= nz
                        resid[r * 4: r * 4 + 4, c * 4: c * 4 + 4] = \
                            idct4x4(coeffs.reshape(4, 4))
                    a_nz[mbx] = nz4[2:]
                    l_nz[:] = nz4[1::2]
                if td.overrun:
                    raise ValueError("VP8 token partition truncated")

            # ---- reconstruct ----
            if ymode == B_PRED:
                tr4 = Y[y0 - 1, x0 + 16: x0 + 20].copy()
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    sy, sx = y0 + r * 4, x0 + c * 4
                    # right-column subblocks reuse the MB's cached
                    # top-right pixels at every row (RFC 12.3)
                    pred = _pred_b(Y, sy, sx, int(submodes[sb]),
                                   tr4 if c == 3 else None)
                    _clip_add(Y, sy, sx, pred,
                              resid_y[r * 4: r * 4 + 4,
                                      c * 4: c * 4 + 4])
            else:
                pred = _pred_block(Y, y0, x0, 16, ymode, have_above,
                                   have_left)
                Y[y0: y0 + 16, x0: x0 + 16] = np.clip(
                    pred + resid_y, 0, 255)
            predu = _pred_block(U, cy0, cx0, 8, uvmode, have_above,
                                have_left)
            U[cy0: cy0 + 8, cx0: cx0 + 8] = np.clip(
                predu + resid_u, 0, 255)
            predv = _pred_block(V, cy0, cx0, 8, uvmode, have_above,
                                have_left)
            V[cy0: cy0 + 8, cx0: cx0 + 8] = np.clip(
                predv + resid_v, 0, 255)

            # ---- loop filter bookkeeping ----
            lvl = (seg_lf[segment] if seg_abs
                   else filter_level + seg_lf[segment]) \
                if seg_enabled else filter_level
            if lf_delta_enabled:
                lvl += ref_lf_deltas[0]  # intra frame
                if ymode == B_PRED:
                    lvl += mode_lf_deltas[0]
            lvl = max(0, min(63, lvl))
            skip_inner = (not has_coeffs) and ymode != B_PRED
            row_info.append((lvl, skip_inner))
        mb_info.append(row_info)
    if bd.overrun:
        raise ValueError("VP8 first partition truncated")

    # RFC 6386 §9.2: the version field overrides the loop filter —
    # version 1 forces the simple filter, versions 2/3 disable the
    # loop filter entirely regardless of the header fields
    if version >= 2:
        apply_filter = False
    elif version == 1:
        filter_type = 1
    if filter_level and apply_filter:
        _loop_filter_frame(Y, U, V, mb_info, filter_type, sharpness,
                           mb_w, mb_h)

    return {
        "y": Y[1: height + 1, 1: width + 1].astype(np.uint8),
        "u": U[1: (height + 1) // 2 + 1,
               1: (width + 1) // 2 + 1].astype(np.uint8),
        "v": V[1: (height + 1) // 2 + 1,
               1: (width + 1) // 2 + 1].astype(np.uint8),
        "width": width, "height": height,
        "filter_level": filter_level, "filter_type": filter_type,
        "y_ac_qi": y_ac_qi,
        "used_synth_bmode": used_synth_bmode,
    }


# --------------------------------------------------------------------
# In-loop deblocking filter (RFC 6386 §15), vectorized along each edge
# --------------------------------------------------------------------


def _lf_limits(level: int, sharpness: int):
    interior = level
    if sharpness:
        interior >>= 1 if sharpness <= 4 else 2
        interior = min(interior, 9 - sharpness)
    interior = max(1, interior)
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    mb_edge = ((level + 2) * 2) + interior
    sub_edge = (level * 2) + interior
    return interior, hev, mb_edge, sub_edge




def _filter_edge_normal(seg: np.ndarray, I: int, E: int, H: int,
                        mb_edge: bool) -> np.ndarray:
    """seg: (n, 8) int columns [p3 p2 p1 p0 q0 q1 q2 q3]. Hot path of
    the whole decoder: at <= 16 rows per edge, a plain-Python int loop
    runs ~6x faster than the equivalent numpy expression chain (122us
    -> 19us per edge measured) — vector dispatch overhead dominates at
    this size, so this is one of the repo's rare deliberate
    Python-loop hot paths (BASELINE v5.3)."""
    rows = seg.tolist()
    c8 = _c8i
    for r in rows:
        p3, p2, p1, p0, q0, q1, q2, q3 = r
        if not (abs(p3 - p2) <= I and abs(p2 - p1) <= I
                and abs(p1 - p0) <= I and abs(q1 - q0) <= I
                and abs(q2 - q1) <= I and abs(q3 - q2) <= I
                and 2 * abs(p0 - q0) + abs(p1 - q1) // 2 <= E):
            continue
        hev = abs(p1 - p0) > H or abs(q1 - q0) > H
        ps1, ps0 = p1 - 128, p0 - 128
        qs0, qs1 = q0 - 128, q1 - 128
        if mb_edge:
            a = c8(c8(ps1 - qs1) + 3 * (qs0 - ps0))
            if hev:
                # a in [-128,127]: a+4 needs only the top clamp
                r[4] = c8(qs0 - (min(a + 4, 127) >> 3)) + 128
                r[3] = c8(ps0 + (min(a + 3, 127) >> 3)) + 128
            else:
                # (k*a+63)>>7 stays in signed-char range for k <= 27
                a1 = (27 * a + 63) >> 7
                a2 = (18 * a + 63) >> 7
                a3 = (9 * a + 63) >> 7
                r[4] = c8(qs0 - a1) + 128
                r[3] = c8(ps0 + a1) + 128
                r[5] = c8(qs1 - a2) + 128
                r[2] = c8(ps1 + a2) + 128
                r[6] = c8((q2 - 128) - a3) + 128
                r[1] = c8((p2 - 128) + a3) + 128
        else:
            a = c8((c8(ps1 - qs1) if hev else 0) + 3 * (qs0 - ps0))
            f1 = min(a + 4, 127) >> 3
            r[4] = c8(qs0 - f1) + 128
            r[3] = c8(ps0 + (min(a + 3, 127) >> 3)) + 128
            if not hev:
                a2 = (f1 + 1) >> 1
                r[5] = c8(qs1 - a2) + 128
                r[2] = c8(ps1 + a2) + 128
    return np.asarray(rows, dtype=np.int64)


def _c8i(x: int) -> int:
    return -128 if x < -128 else (127 if x > 127 else x)


def _filter_edge_simple(seg: np.ndarray, E: int) -> np.ndarray:
    rows = seg.tolist()
    c8 = _c8i
    for r in rows:
        p1, p0, q0, q1 = r[2], r[3], r[4], r[5]
        if 2 * abs(p0 - q0) + abs(p1 - q1) // 2 > E:
            continue
        ps1, ps0 = p1 - 128, p0 - 128
        qs0, qs1 = q0 - 128, q1 - 128
        a = c8(c8(ps1 - qs1) + 3 * (qs0 - ps0))
        r[4] = c8(qs0 - (min(a + 4, 127) >> 3)) + 128
        r[3] = c8(ps0 + (min(a + 3, 127) >> 3)) + 128
    return np.asarray(rows, dtype=np.int64)


def _v_edge(buf, y, x, n, fn):
    seg = buf[y: y + n, x - 4: x + 4].astype(np.int64)
    buf[y: y + n, x - 4: x + 4] = fn(seg)


def _h_edge(buf, y, x, n, fn):
    seg = buf[y - 4: y + 4, x: x + n].T.astype(np.int64)
    buf[y - 4: y + 4, x: x + n] = fn(seg).T


def _uv_v_edge(U, V, y, x, fn):
    """One filter call for the U and V edges at the same position —
    identical limits, so stacking halves the per-edge numpy overhead
    (the loop filter dominates decode wall; see BASELINE v5.3)."""
    seg = np.concatenate(
        (U[y: y + 8, x - 4: x + 4], V[y: y + 8, x - 4: x + 4])
    ).astype(np.int64)
    out = fn(seg)
    U[y: y + 8, x - 4: x + 4] = out[:8]
    V[y: y + 8, x - 4: x + 4] = out[8:]


def _uv_h_edge(U, V, y, x, fn):
    seg = np.concatenate(
        (U[y - 4: y + 4, x: x + 8].T, V[y - 4: y + 4, x: x + 8].T)
    ).astype(np.int64)
    out = fn(seg)
    U[y - 4: y + 4, x: x + 8] = out[:8].T
    V[y - 4: y + 4, x: x + 8] = out[8:].T


def _loop_filter_frame(Y, U, V, mb_info, filter_type: int,
                       sharpness: int, mb_w: int, mb_h: int):
    for mby in range(mb_h):
        for mbx in range(mb_w):
            lvl, skip_inner = mb_info[mby][mbx]
            if lvl == 0:
                continue
            I, H, E_mb, E_sub = _lf_limits(lvl, sharpness)
            y0, x0 = mby * 16 + 1, mbx * 16 + 1
            cy0, cx0 = mby * 8 + 1, mbx * 8 + 1
            if filter_type == 1:  # simple: Y only
                if mbx > 0:
                    _v_edge(Y, y0, x0, 16,
                            lambda s: _filter_edge_simple(s, E_mb))
                if not skip_inner:
                    for dx in (4, 8, 12):
                        _v_edge(Y, y0, x0 + dx, 16,
                                lambda s: _filter_edge_simple(s, E_sub))
                if mby > 0:
                    _h_edge(Y, y0, x0, 16,
                            lambda s: _filter_edge_simple(s, E_mb))
                if not skip_inner:
                    for dy in (4, 8, 12):
                        _h_edge(Y, y0 + dy, x0, 16,
                                lambda s: _filter_edge_simple(s, E_sub))
                continue

            def mbf(s):
                return _filter_edge_normal(s, I, E_mb, H, True)

            def sbf(s):
                return _filter_edge_normal(s, I, E_sub, H, False)

            if mbx > 0:
                _v_edge(Y, y0, x0, 16, mbf)
                _uv_v_edge(U, V, cy0, cx0, mbf)
            if not skip_inner:
                for dx in (4, 8, 12):
                    _v_edge(Y, y0, x0 + dx, 16, sbf)
                _uv_v_edge(U, V, cy0, cx0 + 4, sbf)
            if mby > 0:
                _h_edge(Y, y0, x0, 16, mbf)
                _uv_h_edge(U, V, cy0, cx0, mbf)
            if not skip_inner:
                for dy in (4, 8, 12):
                    _h_edge(Y, y0 + dy, x0, 16, sbf)
                _uv_h_edge(U, V, cy0 + 4, cx0, sbf)


# --------------------------------------------------------------------
# YUV 4:2:0 <-> RGB (BT.601 studio range, integer arithmetic)
# --------------------------------------------------------------------


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int64)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int64)
    yy = y.astype(np.int64)
    c = 298 * (yy - 16)
    r = (c + 409 * (vv - 128) + 128) >> 8
    g = (c - 100 * (uu - 128) - 208 * (vv - 128) + 128) >> 8
    b = (c + 516 * (uu - 128) + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(
        np.uint8)


def rgb_to_yuv420(rgb: np.ndarray):
    rgb = np.asarray(rgb, dtype=np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    he, we = h + (h & 1), w + (w & 1)
    up = np.empty((he, we), dtype=np.int64)
    vp = np.empty((he, we), dtype=np.int64)
    up[:h, :w], vp[:h, :w] = u, v
    if h & 1:
        up[h], vp[h] = up[h - 1], vp[h - 1]
    if w & 1:
        up[:, w], vp[:, w] = up[:, w - 1], vp[:, w - 1]
    u2 = (up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2]
          + up[1::2, 1::2] + 2) >> 2
    v2 = (vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2]
          + vp[1::2, 1::2] + 2) >> 2
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u2, 0, 255).astype(np.uint8),
            np.clip(v2, 0, 255).astype(np.uint8))


# --------------------------------------------------------------------
# Minimal real encoder (fixture generator for round-trip validation)
# --------------------------------------------------------------------


def _quantize_block(X: np.ndarray, qdc: int, qac: int,
                    first: int) -> np.ndarray:
    """Quantize a 4x4 transform block -> quantized levels (natural
    order), round-to-nearest, clamped to the token alphabet's reach."""
    q = np.empty(16, dtype=np.int64)
    flat = X.ravel()
    for i in range(16):
        d = qdc if i == 0 else qac
        q[i] = int(np.rint(flat[i] / d))
    q[np.abs(q) > 2047] = np.sign(q[np.abs(q) > 2047]) * 2047
    if first == 1:
        q[0] = 0
    return q


def _token_for(v: int):
    a = abs(v)
    if a <= 4:
        return a, []
    for tok in (DCT_CAT1, DCT_CAT2, DCT_CAT3, DCT_CAT4, DCT_CAT5,
                DCT_CAT6):
        lo = CAT_BASE[tok]
        hi = lo + (1 << len(CAT_PROBS[tok])) - 1
        if a <= hi:
            return tok, [((a - lo) >> k) & 1
                         for k in range(len(CAT_PROBS[tok]) - 1, -1,
                                        -1)]
    raise ValueError(f"coefficient {v} out of token range")


def _encode_block_coeffs(be: BoolEncoder, probs, plane: int, ctx: int,
                         qlevels: np.ndarray) -> bool:
    """Mirror of _decode_block_coeffs: emit one block's tokens.
    ``qlevels``: natural-order quantized levels. Returns had_tokens."""
    first = 1 if plane == 0 else 0
    zz = [int(qlevels[ZIGZAG[i]]) for i in range(16)]
    eob = first
    for i in range(first, 16):
        if zz[i]:
            eob = i + 1
    i = first
    prev_zero = False
    while i < 16:
        p = probs[plane][COEF_BANDS[i]][ctx]
        start = 2 if prev_zero else 0
        if i >= eob:
            be.tree(COEF_TREE, p, DCT_EOB, start=start)
            break
        v = zz[i]
        if v == 0:
            be.tree(COEF_TREE, p, DCT_0, start=start)
            ctx = 0
            prev_zero = True
            i += 1
            continue
        prev_zero = False
        tok, extra = _token_for(v)
        be.tree(COEF_TREE, p, tok, start=start)
        for bit, pb in zip(extra, CAT_PROBS.get(tok, [])):
            be.encode(bit, pb)
        be.encode(1 if v < 0 else 0, 128)
        ctx = 2 if abs(v) > 1 else 1
        i += 1
    return eob != first


def _pad_to_mb(plane: np.ndarray, mbs: int) -> np.ndarray:
    h, w = plane.shape
    H = (h + mbs - 1) // mbs * mbs
    W = (w + mbs - 1) // mbs * mbs
    out = np.empty((H, W), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1: h, :]
    out[:h, w:] = plane[:, w - 1: w]
    out[h:, w:] = plane[h - 1, w - 1]
    return out


def encode_vp8_frame(img: np.ndarray, qi: int = 40,
                     filter_level: int = 0, filter_type: int = 0,
                     sharpness: int = 0,
                     bpred_bias: float = 5.0):
    """Encode an RGB (h, w, 3) or gray (h, w) image as one VP8 key
    frame. Returns (frame_bytes, expected) where ``expected`` is the
    encoder's own reconstruction dict (y/u/v planes, post-loop-filter)
    — the exact output a conformant decoder must produce. Mode policy:
    per-MB best-SAD 16x16 mode, switching to B_PRED (per-subblock
    best-SAD over all ten submodes) when the 16x16 SAD per pixel
    exceeds ``bpred_bias``."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError("encode_vp8_frame takes (h, w, 3) RGB or "
                         "(h, w) gray")
    height, width = img.shape[:2]
    if not (0 < width <= 16383 and 0 < height <= 16383):
        raise ValueError("VP8 dimensions must be 1..16383")
    ysrc, usrc, vsrc = rgb_to_yuv420(img)
    ysrc = _pad_to_mb(ysrc.astype(np.int64), 16)
    usrc = _pad_to_mb(usrc.astype(np.int64), 8)
    vsrc = _pad_to_mb(vsrc.astype(np.int64), 8)
    mb_h, mb_w = ysrc.shape[0] // 16, ysrc.shape[1] // 16

    qf = _quant_factors(qi, {})
    Y = _pad_plane(mb_h * 16, mb_w * 16)
    U = _pad_plane(mb_h * 8, mb_w * 8)
    V = _pad_plane(mb_h * 8, mb_w * 8)

    be = BoolEncoder()      # first partition (header + modes)
    bt = BoolEncoder()      # single token partition
    probs = DEFAULT_COEF_PROBS
    skip_prob = 200

    # ---- frame header ----
    be.literal(0, 1)        # color space
    be.literal(0, 1)        # clamping
    be.encode(0, 128)       # segmentation disabled
    be.encode(filter_type & 1, 128)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.encode(0, 128)       # no lf deltas
    be.literal(0, 2)        # 1 token partition
    be.literal(qi, 7)
    for _ in range(5):
        be.encode(0, 128)   # no quantizer deltas
    be.encode(1, 128)       # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for t in range(11):
                    be.encode(0, COEF_UPDATE_PROBS[i][j][k][t])
    be.encode(1, 128)       # mb_no_coeff_skip enabled
    be.literal(skip_prob, 8)

    above_y = np.zeros((mb_w, 4), dtype=np.int8)
    above_u = np.zeros((mb_w, 2), dtype=np.int8)
    above_v = np.zeros((mb_w, 2), dtype=np.int8)
    above_y2 = np.zeros(mb_w, dtype=np.int8)
    above_sub = np.full((mb_w, 4), B_DC_PRED, dtype=np.int8)
    mb_info = []

    for mby in range(mb_h):
        left_y = np.zeros(4, dtype=np.int8)
        left_u = np.zeros(2, dtype=np.int8)
        left_v = np.zeros(2, dtype=np.int8)
        left_y2 = 0
        left_sub = np.full(4, B_DC_PRED, dtype=np.int8)
        row_info = []
        for mbx in range(mb_w):
            y0, x0 = mby * 16 + 1, mbx * 16 + 1
            cy0, cx0 = mby * 8 + 1, mbx * 8 + 1
            have_above, have_left = mby > 0, mbx > 0
            src16 = ysrc[mby * 16: mby * 16 + 16,
                         mbx * 16: mbx * 16 + 16]

            best_mode, best_sad, best_pred = None, None, None
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pred = _pred_block(Y, y0, x0, 16, m, have_above,
                                   have_left)
                sad = int(np.abs(src16 - pred).sum())
                if best_sad is None or sad < best_sad:
                    best_mode, best_sad, best_pred = m, sad, pred
            use_bpred = best_sad > bpred_bias * 256

            # ---- luma: transform/quantize (reconstruct as we go) ----
            sub_q = []          # 16 arrays of quantized levels
            sub_modes = np.full(16, MODE_TO_BMODE[best_mode]
                                if not use_bpred else 0, dtype=np.int8)
            if use_bpred:
                ymode = B_PRED
                tr4 = Y[y0 - 1, x0 + 16: x0 + 20].copy()
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    sy, sx = y0 + r * 4, x0 + c * 4
                    ssrc = src16[r * 4: r * 4 + 4, c * 4: c * 4 + 4]
                    bm, bs, bp = None, None, None
                    for m in range(10):
                        pred = _pred_b(Y, sy, sx, m,
                                       tr4 if c == 3 else None)
                        sad = int(np.abs(ssrc - pred).sum())
                        if bs is None or sad < bs:
                            bm, bs, bp = m, sad, pred
                    sub_modes[sb] = bm
                    X = fdct4x4(ssrc - bp)
                    q = _quantize_block(X, qf["y1dc"], qf["y1ac"], 0)
                    sub_q.append(q)
                    deq = q.copy()
                    deq[0] *= qf["y1dc"]
                    deq[1:] *= qf["y1ac"]
                    _clip_add(Y, sy, sx, bp,
                              idct4x4(deq.reshape(4, 4)))
                y2_q = None
            else:
                ymode = best_mode
                dcs = np.zeros(16, dtype=np.int64)
                Xs = []
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    X = fdct4x4(src16[r * 4: r * 4 + 4,
                                      c * 4: c * 4 + 4]
                                - best_pred[r * 4: r * 4 + 4,
                                            c * 4: c * 4 + 4])
                    dcs[sb] = X[0, 0]
                    Xs.append(X)
                    sub_q.append(_quantize_block(X, qf["y1dc"],
                                                 qf["y1ac"], 1))
                Y2 = fwht4x4(dcs.reshape(4, 4))
                y2_q = _quantize_block(Y2, qf["y2dc"], qf["y2ac"], 0)
                deq2 = y2_q.copy()
                deq2[0] *= qf["y2dc"]
                deq2[1:] *= qf["y2ac"]
                dcs_rec = iwht4x4(deq2.reshape(4, 4)).ravel()
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    deq = sub_q[sb].copy()
                    deq *= qf["y1ac"]
                    deq[0] = dcs_rec[sb]
                    _clip_add(Y, y0 + r * 4, x0 + c * 4,
                              best_pred[r * 4: r * 4 + 4,
                                        c * 4: c * 4 + 4],
                              idct4x4(deq.reshape(4, 4)))

            # ---- chroma ----
            bu, bs_, bpu, bpv = None, None, None, None
            su = usrc[mby * 8: mby * 8 + 8, mbx * 8: mbx * 8 + 8]
            sv = vsrc[mby * 8: mby * 8 + 8, mbx * 8: mbx * 8 + 8]
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = _pred_block(U, cy0, cx0, 8, m, have_above,
                                 have_left)
                pv = _pred_block(V, cy0, cx0, 8, m, have_above,
                                 have_left)
                sad = int(np.abs(su - pu).sum()
                          + np.abs(sv - pv).sum())
                if bs_ is None or sad < bs_:
                    bu, bs_, bpu, bpv = m, sad, pu, pv
            uv_q = []
            for plane_src, pred, buf, oy, ox in (
                    (su, bpu, U, cy0, cx0), (sv, bpv, V, cy0, cx0)):
                for sb in range(4):
                    r, c = divmod(sb, 2)
                    X = fdct4x4(plane_src[r * 4: r * 4 + 4,
                                          c * 4: c * 4 + 4]
                                - pred[r * 4: r * 4 + 4,
                                       c * 4: c * 4 + 4])
                    q = _quantize_block(X, qf["uvdc"], qf["uvac"], 0)
                    uv_q.append(q)
                    deq = q.copy()
                    deq[0] *= qf["uvdc"]
                    deq[1:] *= qf["uvac"]
                    _clip_add(buf, oy + r * 4, ox + c * 4,
                              pred[r * 4: r * 4 + 4,
                                   c * 4: c * 4 + 4],
                              idct4x4(deq.reshape(4, 4)))

            # ---- skip decision + mode/token emission ----
            def has_any(q, first):
                return any(int(q[ZIGZAG[i]]) != 0
                           for i in range(first, 16))

            plane_y = 3 if ymode == B_PRED else 0
            first_y = 0 if ymode == B_PRED else 1
            skip = not (
                (y2_q is not None and has_any(y2_q, 0))
                or any(has_any(q, first_y) for q in sub_q)
                or any(has_any(q, 0) for q in uv_q)
            )
            be.encode(1 if skip else 0, skip_prob)
            be.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    above_m = (above_sub[mbx][c] if r == 0
                               else sub_modes[sb - 4])
                    left_m = (left_sub[r] if c == 0
                              else sub_modes[sb - 1])
                    be.tree(BMODE_TREE,
                            KF_BMODE_PROB[above_m][left_m],
                            int(sub_modes[sb]))
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, bu)
            above_sub[mbx] = sub_modes[12:]
            left_sub[:] = sub_modes[3::4]

            has_coeffs = False
            if skip:
                left_y[:] = 0
                left_u[:] = 0
                left_v[:] = 0
                above_y[mbx] = 0
                above_u[mbx] = 0
                above_v[mbx] = 0
                if ymode != B_PRED:
                    left_y2 = 0
                    above_y2[mbx] = 0
            else:
                if ymode != B_PRED:
                    nz2 = _encode_block_coeffs(
                        bt, probs, 1, int(above_y2[mbx]) + left_y2,
                        y2_q)
                    above_y2[mbx] = left_y2 = int(nz2)
                    has_coeffs |= nz2
                y_nz = np.zeros(16, dtype=np.int8)
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    ctx = int(above_y[mbx][c] if r == 0
                              else y_nz[sb - 4]) + \
                        int(left_y[r] if c == 0 else y_nz[sb - 1])
                    nz = _encode_block_coeffs(bt, probs, plane_y, ctx,
                                              sub_q[sb])
                    y_nz[sb] = int(nz)
                    has_coeffs |= nz
                above_y[mbx] = y_nz[12:]
                left_y[:] = y_nz[3::4]
                for half, (a_nz, l_nz) in enumerate(
                        ((above_u, left_u), (above_v, left_v))):
                    nz4 = np.zeros(4, dtype=np.int8)
                    for sb in range(4):
                        r, c = divmod(sb, 2)
                        ctx = int(a_nz[mbx][c] if r == 0
                                  else nz4[sb - 2]) + \
                            int(l_nz[r] if c == 0 else nz4[sb - 1])
                        nz = _encode_block_coeffs(
                            bt, probs, 2, ctx, uv_q[half * 4 + sb])
                        nz4[sb] = int(nz)
                        has_coeffs |= nz
                    a_nz[mbx] = nz4[2:]
                    l_nz[:] = nz4[1::2]
            row_info.append((max(0, min(63, filter_level)),
                             (not has_coeffs) and ymode != B_PRED))
        mb_info.append(row_info)

    hdr = be.done()
    tokens = bt.done()
    if len(hdr) >= 1 << 19:
        raise ValueError(
            "VP8 first partition exceeds the frame tag's 19-bit size "
            "field — encode smaller tiles (mode data for very large "
            "B_PRED-heavy frames does not fit one key frame header)"
        )
    tag = (0) | (0 << 1) | (1 << 4) | (len(hdr) << 5)
    out = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += b"\x9d\x01\x2a"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += hdr + tokens

    if filter_level:
        _loop_filter_frame(Y, U, V, mb_info, filter_type, sharpness,
                           mb_w, mb_h)
    expected = {
        "y": Y[1: height + 1, 1: width + 1].astype(np.uint8),
        "u": U[1: (height + 1) // 2 + 1,
               1: (width + 1) // 2 + 1].astype(np.uint8),
        "v": V[1: (height + 1) // 2 + 1,
               1: (width + 1) // 2 + 1].astype(np.uint8),
    }
    return out, expected
