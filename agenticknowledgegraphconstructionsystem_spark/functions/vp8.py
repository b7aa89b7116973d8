"""Lossy VP8 (WebP) keyframe decoder - pure stdlib + numpy.

Implements the intra-frame subset of RFC 6386 (the VP8 Data Format and
Decoding Guide), which is the COMPLETE format for still lossy WebP:
a simple-container WebP file's ``VP8 `` chunk is always a keyframe, so
inter-frame tools (motion vectors, reference buffers, golden/altref)
never appear.  Covered here:

* boolean arithmetic decoder (RFC 6386 section 7),
* frame / segmentation / loop-filter / quantizer headers (section 9),
* keyframe intra-mode decoding: 16x16 modes, per-subblock 4x4 B-modes
  with the above/left context table, chroma modes (section 11),
* token decoding with per-(type, band, ctx) tree probabilities,
  header-driven probability updates, skip flags and the left/above
  nonzero-context propagation rules (section 13),
* dequantization with per-segment quantizer indices (section 14.1),
* the exact integer inverse WHT and DCT (sections 14.3-14.4),
* all intra predictors, including the 4x4 above-right replication
  quirk for right-column subblocks (section 12),
* the normal and simple in-loop deblocking filters (section 15).

Correctness tier: per-payload Python, the same contract as
``functions/jpeg.py`` - at cluster scale the catalog built by
``multimodal.media_metadata`` bounds how often a full decode runs, and a
production deployment swaps libwebp behind the identical mapInPandas
batch shape.  The test suite differentially fuzzes this decoder against
the host libwebp (pixel-exact Y/U/V planes across quality levels and
image shapes) and pins a lib-free embedded fixture.

The constant tables live in ``vp8_tables.py`` (generated from the public
RFC 6386 constants carried by libwebp's .rodata; see
``scripts/extract_vp8_tables.py`` for the extraction invariants).

Reference parity note: the reference repo ships no codecs at all (its
PDF path shells out to PyMuPDF - processors/pdf_processor.py); the
multimodal tier including this decoder is rebuild-only surface.
"""
from __future__ import annotations

import struct

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------------------
# Small spec constants (RFC 6386 sections 8.2, 11.2, 13.2-13.3, 14.1)
# ---------------------------------------------------------------------------

# 16x16 luma / chroma intra modes.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 intra modes.
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

# Keyframe mode trees (RFC 6386 section 11.2; negative = leaf).
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
# Implied subblock mode for 16x16-coded macroblocks (context for the
# 4x4 mode table of neighbouring B_PRED macroblocks).
IMPLIED_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# Coefficient token tree (RFC 6386 section 13.2).  Leaves < 0 encode
# token ids; see _decode_coeffs for the category bases / extra bits.
TOKEN_TREE = (
    -11, 2,        # -11 = EOB sentinel
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,        # cat1, cat2
    18, 20,
    -7, -8,        # cat3, cat4
    -9, -10,       # cat5, cat6
)
EOB_TOKEN = 11
CAT_BASE = {5: 5, 6: 7, 7: 11, 8: 19, 9: 35, 10: 67}
CAT_PROBS = {
    5: (159,),
    6: (165, 145),
    7: (173, 148, 140),
    8: (176, 155, 140, 135),
    9: (180, 157, 141, 134, 130),
    10: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def _clip127(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _s8(v: int) -> int:
    """Clamp to signed char [-128, 127] (the spec's c() operator)."""
    return -128 if v < -128 else (127 if v > 127 else v)


# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 section 7.3)
# ---------------------------------------------------------------------------


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
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
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _tree_leaf(tree, br: BoolDecoder, probs) -> int:
    return br.tree(tree, probs)


# ---------------------------------------------------------------------------
# Exact integer inverse transforms (RFC 6386 sections 14.3-14.4)
# ---------------------------------------------------------------------------


def _iwht4x4(inp: list[int]) -> list[int]:
    out = [0] * 16
    tmp = [0] * 16
    for i in range(4):
        a1 = inp[i] + inp[12 + i]
        b1 = inp[4 + i] + inp[8 + i]
        c1 = inp[4 + i] - inp[8 + i]
        d1 = inp[i] - inp[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        a2 = a1 + b1 + 3
        out[base] = (a2) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cospi8sqrt2minus1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def _idct4x4(inp: list[int]) -> list[int]:
    tmp = [0] * 16
    for i in range(4):
        a1 = inp[i] + inp[8 + i]
        b1 = inp[i] - inp[8 + i]
        t1 = (inp[4 + i] * _C2) >> 16
        t2 = inp[12 + i] + ((inp[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = inp[4 + i] + ((inp[4 + i] * _C1) >> 16)
        t2 = (inp[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * _C2) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _C1) >> 16)
        t2 = (tmp[base + 3] * _C2) >> 16
        d1 = t1 + t2
        out[base] = (a1 + d1 + 4) >> 3
        out[base + 3] = (a1 - d1 + 4) >> 3
        out[base + 1] = (b1 + c1 + 4) >> 3
        out[base + 2] = (b1 - c1 + 4) >> 3
    return out


# NOTE (">> 16" above): Python's >> floors, matching C's >> on the
# non-negative products; for negative coefficients C integer division
# semantics differ from floor, BUT RFC 6386's reference decoder defines
# these multiplies on SIGNED values with an arithmetic right shift -
# floor semantics - which Python's >> reproduces exactly.


# ---------------------------------------------------------------------------
# Headers
# ---------------------------------------------------------------------------


class _FrameState:
    pass


def _parse_headers(vp8: bytes) -> _FrameState:
    st = _FrameState()
    if len(vp8) < 10:
        raise ValueError("VP8 payload too short")
    tag = vp8[0] | (vp8[1] << 8) | (vp8[2] << 16)
    key_frame = not (tag & 1)
    st.version = (tag >> 1) & 7
    st.show_frame = (tag >> 4) & 1
    part1_size = tag >> 5
    if not key_frame:
        raise NotImplementedError("VP8 inter frames never occur in still WebP")
    if vp8[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_raw, h_raw = struct.unpack_from("<HH", vp8, 6)
    st.width = w_raw & 0x3FFF
    st.height = h_raw & 0x3FFF
    if st.width == 0 or st.height == 0:
        raise ValueError("zero VP8 frame dimension")

    part1 = vp8[10 : 10 + part1_size]
    if len(part1) < part1_size:
        raise ValueError("truncated VP8 first partition")
    br = BoolDecoder(part1)

    br.bool(128)  # color_space
    br.bool(128)  # clamping_type

    # --- segmentation (RFC 6386 section 9.3) ---
    st.segmentation = br.bool(128)
    st.update_mb_seg_map = 0
    st.seg_abs = 0
    st.seg_quant = [0, 0, 0, 0]
    st.seg_lf = [0, 0, 0, 0]
    st.seg_tree_probs = [255, 255, 255]
    if st.segmentation:
        st.update_mb_seg_map = br.bool(128)
        update_data = br.bool(128)
        if update_data:
            st.seg_abs = br.bool(128)
            for i in range(4):
                if br.bool(128):
                    st.seg_quant[i] = br.signed_literal(7)
            for i in range(4):
                if br.bool(128):
                    st.seg_lf[i] = br.signed_literal(6)
        if st.update_mb_seg_map:
            for i in range(3):
                if br.bool(128):
                    st.seg_tree_probs[i] = br.literal(8)

    # --- loop filter (section 9.4) ---
    st.filter_simple = br.bool(128)
    st.filter_level = br.literal(6)
    st.sharpness = br.literal(3)
    st.lf_delta_enabled = br.bool(128)
    st.ref_lf_delta = [0, 0, 0, 0]
    st.mode_lf_delta = [0, 0, 0, 0]
    if st.lf_delta_enabled:
        if br.bool(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if br.bool(128):
                    st.ref_lf_delta[i] = br.signed_literal(6)
            for i in range(4):
                if br.bool(128):
                    st.mode_lf_delta[i] = br.signed_literal(6)

    # --- token partitions (section 9.5) ---
    st.n_parts = 1 << br.literal(2)

    # --- quantizers (section 9.6) ---
    st.y_ac_qi = br.literal(7)
    read_delta = lambda: br.signed_literal(4) if br.bool(128) else 0
    st.y_dc_delta = read_delta()
    st.y2_dc_delta = read_delta()
    st.y2_ac_delta = read_delta()
    st.uv_dc_delta = read_delta()
    st.uv_ac_delta = read_delta()

    br.bool(128)  # refresh_entropy_probs (irrelevant for a single frame)

    # --- coefficient probability updates (section 13.4) ---
    probs = [
        [[list(COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p in range(11):
                    if br.bool(upd[p]):
                        row[p] = br.literal(8)
    st.coeff_probs = probs

    st.mb_no_skip = br.bool(128)
    st.skip_prob = br.literal(8) if st.mb_no_skip else 0

    st.br = br  # partition-1 decoder continues with per-MB mode data

    # --- DCT partitions ---
    rest = vp8[10 + part1_size :]
    sizes = []
    table = 3 * (st.n_parts - 1)
    if len(rest) < table:
        raise ValueError("truncated VP8 partition table")
    for i in range(st.n_parts - 1):
        sizes.append(rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16))
    body = rest[table:]
    st.partitions = []
    off = 0
    for s in sizes:
        st.partitions.append(BoolDecoder(body[off : off + s]))
        off += s
    st.partitions.append(BoolDecoder(body[off:]))
    return st


# ---------------------------------------------------------------------------
# Dequantization factors (RFC 6386 section 14.1; libwebp VP8ParseQuant)
# ---------------------------------------------------------------------------


def _quant_factors(st: _FrameState, segment: int):
    if st.segmentation:
        q = st.seg_quant[segment] if st.seg_abs else st.y_ac_qi + st.seg_quant[segment]
    else:
        q = st.y_ac_qi
    q = _clip127(q)
    y1dc = DC_QLOOKUP[_clip127(q + st.y_dc_delta)]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[_clip127(q + st.y2_dc_delta)] * 2
    y2ac = (AC_QLOOKUP[_clip127(q + st.y2_ac_delta)] * 155) // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[min(_clip127(q + st.uv_dc_delta), 117)]
    uvac = AC_QLOOKUP[_clip127(q + st.uv_ac_delta)]
    return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)


# ---------------------------------------------------------------------------
# Token decoding (RFC 6386 section 13)
# ---------------------------------------------------------------------------


def _decode_coeffs(br, probs_type, first, quant, ctx):
    """Decode one 4x4 block's tokens; returns (coeffs[16], nonzero)."""
    dcq, acq = quant
    coeffs = [0] * 16
    n = first
    nonzero = 0
    skip_eob = False
    while n < 16:
        p = probs_type[COEFF_BANDS[n]][ctx]
        tok = br.tree(TOKEN_TREE, p, 2 if skip_eob else 0)
        if tok == EOB_TOKEN:
            break
        if tok == 0:
            ctx = 0
            skip_eob = True
            n += 1
            continue
        skip_eob = False
        if tok <= 4:
            val = tok
        else:
            extra = 0
            for cp in CAT_PROBS[tok]:
                extra = (extra << 1) | br.bool(cp)
            val = CAT_BASE[tok] + extra
        if br.bool(128):
            val = -val
        coeffs[ZIGZAG[n]] = val * (dcq if n == 0 else acq)
        nonzero = 1
        ctx = 1 if val in (1, -1) else 2
        n += 1
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# Intra predictors (RFC 6386 section 12)
# ---------------------------------------------------------------------------


def _pred_block(plane, stride, x, y, size, mode, have_up, have_left):
    """Whole-block (16x16 luma / 8x8 chroma) prediction into a list."""
    base = y * stride + x
    up = plane[base - stride : base - stride + size]
    left = [plane[base + r * stride - 1] for r in range(size)]
    out = [0] * (size * size)
    if mode == DC_PRED:
        if have_up and have_left:
            s = sum(up) + sum(left)
            shift = 5 if size == 16 else 4
            dc = (s + (1 << (shift - 1))) >> shift
        elif have_up:
            dc = (sum(up) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (sum(left) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        for i in range(size * size):
            out[i] = dc
    elif mode == V_PRED:
        for r in range(size):
            out[r * size : (r + 1) * size] = up
    elif mode == H_PRED:
        for r in range(size):
            v = left[r]
            for c in range(size):
                out[r * size + c] = v
    else:  # TM_PRED
        tl = plane[base - stride - 1]
        for r in range(size):
            lr = left[r] - tl
            row = r * size
            for c in range(size):
                out[row + c] = _clip255(lr + up[c])
    return out


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred4(plane, stride, x, y, mode, tr):
    """4x4 subblock prediction.  ``tr`` is the 4-pixel above-right row."""
    base = y * stride + x
    T = plane[base - stride : base - stride + 4]
    TL = plane[base - stride - 1]
    L = [plane[base + r * stride - 1] for r in range(4)]
    A, B, C, D = T
    E, F, G, H = tr
    I, J, K, Lp = L
    o = [0] * 16

    def put(c, r, v):
        o[r * 4 + c] = v

    if mode == B_DC:
        dc = (A + B + C + D + I + J + K + Lp + 4) >> 3
        for i in range(16):
            o[i] = dc
    elif mode == B_TM:
        for r in range(4):
            d = L[r] - TL
            for c in range(4):
                o[r * 4 + c] = _clip255(d + T[c])
    elif mode == B_VE:
        vals = (_avg3(TL, A, B), _avg3(A, B, C), _avg3(B, C, D), _avg3(C, D, E))
        for r in range(4):
            o[r * 4 : r * 4 + 4] = vals
    elif mode == B_HE:
        rows = (_avg3(TL, I, J), _avg3(I, J, K), _avg3(J, K, Lp), _avg3(K, Lp, Lp))
        for r in range(4):
            v = rows[r]
            for c in range(4):
                o[r * 4 + c] = v
    elif mode == B_LD:
        t = (A, B, C, D, E, F, G, H)
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    put(c, r, _avg3(t[i], t[i + 1], t[i + 2]))
                else:
                    put(c, r, _avg3(t[6], t[7], t[7]))
    elif mode == B_RD:
        put(0, 3, _avg3(J, K, Lp))
        v = _avg3(I, J, K); put(1, 3, v); put(0, 2, v)
        v = _avg3(TL, I, J); put(2, 3, v); put(1, 2, v); put(0, 1, v)
        v = _avg3(A, TL, I); put(3, 3, v); put(2, 2, v); put(1, 1, v); put(0, 0, v)
        v = _avg3(B, A, TL); put(3, 2, v); put(2, 1, v); put(1, 0, v)
        v = _avg3(C, B, A); put(3, 1, v); put(2, 0, v)
        put(3, 0, _avg3(D, C, B))
    elif mode == B_VR:
        v = _avg2(TL, A); put(0, 0, v); put(1, 2, v)
        v = _avg2(A, B); put(1, 0, v); put(2, 2, v)
        v = _avg2(B, C); put(2, 0, v); put(3, 2, v)
        put(3, 0, _avg2(C, D))
        put(0, 3, _avg3(K, J, I))
        put(0, 2, _avg3(J, I, TL))
        v = _avg3(I, TL, A); put(0, 1, v); put(1, 3, v)
        v = _avg3(TL, A, B); put(1, 1, v); put(2, 3, v)
        v = _avg3(A, B, C); put(2, 1, v); put(3, 3, v)
        put(3, 1, _avg3(B, C, D))
    elif mode == B_VL:
        put(0, 0, _avg2(A, B))
        v = _avg2(B, C); put(1, 0, v); put(0, 2, v)
        v = _avg2(C, D); put(2, 0, v); put(1, 2, v)
        v = _avg2(D, E); put(3, 0, v); put(2, 2, v)
        put(0, 1, _avg3(A, B, C))
        v = _avg3(B, C, D); put(1, 1, v); put(0, 3, v)
        v = _avg3(C, D, E); put(2, 1, v); put(1, 3, v)
        v = _avg3(D, E, F); put(3, 1, v); put(2, 3, v)
        put(3, 2, _avg3(E, F, G))
        put(3, 3, _avg3(F, G, H))
    elif mode == B_HD:
        v = _avg2(I, TL); put(0, 0, v); put(2, 1, v)
        v = _avg2(J, I); put(0, 1, v); put(2, 2, v)
        v = _avg2(K, J); put(0, 2, v); put(2, 3, v)
        put(0, 3, _avg2(Lp, K))
        put(3, 0, _avg3(A, B, C))
        put(2, 0, _avg3(TL, A, B))
        v = _avg3(I, TL, A); put(1, 0, v); put(3, 1, v)
        v = _avg3(TL, I, J); put(1, 1, v); put(3, 2, v)
        v = _avg3(I, J, K); put(1, 2, v); put(3, 3, v)
        put(1, 3, _avg3(J, K, Lp))
    else:  # B_HU
        put(0, 0, _avg2(I, J))
        v = _avg2(J, K); put(2, 0, v); put(0, 1, v)
        v = _avg2(K, Lp); put(2, 1, v); put(0, 2, v)
        put(1, 0, _avg3(I, J, K))
        v = _avg3(J, K, Lp); put(3, 0, v); put(1, 1, v)
        v = _avg3(K, Lp, Lp); put(3, 1, v); put(1, 2, v)
        for c, r in ((2, 2), (3, 2), (0, 3), (1, 3), (2, 3), (3, 3)):
            put(c, r, Lp)
    return o


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 section 15)
# ---------------------------------------------------------------------------


def _filter_params(st: _FrameState, level: int):
    interior = level
    if st.sharpness:
        interior >>= 2 if st.sharpness > 4 else 1
        if interior > 9 - st.sharpness:
            interior = 9 - st.sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    mb_limit = ((level + 2) * 2) + interior
    sb_limit = (level * 2) + interior
    return interior, mb_limit, sb_limit, hev_t


def _get8(plane, stride, pos, step):
    return [plane[pos + (k - 4) * step] for k in range(8)]


def _filter_mask(px, interior, edge_limit):
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    return (
        abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q3 - q2) <= interior
        and abs(q2 - q1) <= interior
        and abs(q1 - q0) <= interior
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit
    )


def _hev(px, thresh):
    _, _, p1, p0, q0, q1, _, _ = px
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC 6386 common_adjust on signed (value-128) pixels."""
    a = _s8((_s8(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _s8(a + 4) >> 3
    f2 = _s8(a + 3) >> 3
    return f1, f2


def _apply_filter(plane, stride, pos, step, kind, hev, px):
    s = [v - 128 for v in px]
    p3, p2, p1, p0, q0, q1, q2, q3 = s
    if kind == "mb" and not hev:
        w = _s8(_s8(p1 - q1) + 3 * (q0 - p0))
        a = _s8((27 * w + 63) >> 7)
        q0n, p0n = q0 - a, p0 + a
        a = _s8((18 * w + 63) >> 7)
        q1n, p1n = q1 - a, p1 + a
        a = _s8((9 * w + 63) >> 7)
        q2n, p2n = q2 - a, p2 + a
        vals = (p3, p2n, p1n, p0n, q0n, q1n, q2n, q3)
    elif kind == "sb" and not hev:
        f1, f2 = _common_adjust(False, p1, p0, q0, q1)
        a3 = (f1 + 1) >> 1
        vals = (p3, p2, p1 + a3, p0 + f2, q0 - f1, q1 - a3, q2, q3)
    else:  # hev (both kinds) and the simple filter: outer-tap adjust only
        f1, f2 = _common_adjust(True, p1, p0, q0, q1)
        vals = (p3, p2, p1, p0 + f2, q0 - f1, q1, q2, q3)
    for k, v in enumerate(vals):
        plane[pos + (k - 4) * step] = _clip255(v + 128)


def _filter_edge(plane, stride, x0, y0, length, vertical, kind, interior,
                 edge_limit, hev_t, simple):
    step = 1 if vertical else stride
    along = stride if vertical else 1
    pos0 = y0 * stride + x0
    for i in range(length):
        pos = pos0 + i * along
        px = _get8(plane, stride, pos, step)
        if simple:
            p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
            if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
                s1, s0, t0, t1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
                f1, f2 = _common_adjust(True, s1, s0, t0, t1)
                plane[pos - step] = _clip255(s0 + f2 + 128)
                plane[pos] = _clip255(t0 - f1 + 128)
            continue
        if _filter_mask(px, interior, edge_limit):
            _apply_filter(plane, stride, pos, step, kind, _hev(px, hev_t), px)


# ---------------------------------------------------------------------------
# Main decode
# ---------------------------------------------------------------------------


def decode_vp8(vp8: bytes, _loop_filter: bool = True):
    """Decode a VP8 keyframe payload (the ``VP8 `` chunk body).

    Returns ``(width, height, y_plane, u_plane, v_plane)`` where the
    planes are ``bytes`` in raster order with strides ``width`` and
    ``(width + 1) // 2`` - the loop-filtered reconstruction, bit-exact
    vs libwebp's decoder output.  ``_loop_filter=False`` skips the
    deblocking pass (differential-debug hook, mirrors libwebp's
    ``bypass_filtering``).
    """
    st = _parse_headers(vp8)
    w, h = st.width, st.height
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4

    # Working canvases with a 1-pixel top/left prediction border and
    # an 8-pixel right apron (above-right reads).  Border conventions
    # (RFC 6386 section 12.2): above row off frame = 127, left column
    # off frame = 129, the corner follows the above row.
    ys = mbw * 16 + 9
    yh = mbh * 16 + 1
    cs = mbw * 8 + 9
    ch = mbh * 8 + 1
    Y = bytearray(ys * yh)
    U = bytearray(cs * ch)
    V = bytearray(cs * ch)
    for buf, stride, height in ((Y, ys, yh), (U, cs, ch), (V, cs, ch)):
        for i in range(stride):
            buf[i] = 127
        for r in range(1, height):
            buf[r * stride] = 129

    br = st.br
    parts = st.partitions
    quants = [_quant_factors(st, s) for s in range(4)]

    # Per-column above contexts.
    above_bmodes = [[B_DC] * 4 for _ in range(mbw)]
    above_nz_y = [[0] * 4 for _ in range(mbw)]
    above_nz_uv = [[0, 0, 0, 0] for _ in range(mbw)]  # u0,u1 / v0,v1 per col pair
    above_nz_y2 = [0] * mbw

    mb_info = []  # (level, i4x4, has_coeffs) per MB for the filter pass

    for mby in range(mbh):
        left_bmodes = [B_DC] * 4
        left_nz_y = [0] * 4
        left_nz_uv = [0, 0, 0, 0]
        left_nz_y2 = 0
        tbr = parts[mby % st.n_parts]
        for mbx in range(mbw):
            # --- modes (partition 1) ---
            segment = 0
            if st.segmentation and st.update_mb_seg_map:
                segment = br.tree(MB_SEGMENT_TREE, st.seg_tree_probs)
            skip = br.bool(st.skip_prob) if st.mb_no_skip else 0
            ymode = br.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = [0] * 16
                for j in range(16):
                    a = above_bmodes[mbx][j & 3] if j < 4 else bmodes[j - 4]
                    l = left_bmodes[j >> 2] if (j & 3) == 0 else bmodes[j - 1]
                    bmodes[j] = br.tree(BMODE_TREE, KF_BMODE_PROBS[a][l])
            else:
                bmodes = [IMPLIED_BMODE[ymode]] * 16
            uvmode = br.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            for j in range(4):
                above_bmodes[mbx][j] = bmodes[12 + j]
                left_bmodes[j] = bmodes[4 * j + 3]

            i4 = ymode == B_PRED
            (y1q, y2q, uvq) = quants[segment]

            # --- residuals (token partition) ---
            yblocks = [None] * 16
            ublocks = [None] * 4
            vblocks = [None] * 4
            y2_coeffs = None
            has_coeffs = 0
            if skip:
                for j in range(4):
                    left_nz_y[j] = 0
                    above_nz_y[mbx][j] = 0
                left_nz_uv[:] = [0, 0, 0, 0]
                above_nz_uv[mbx][:] = [0, 0, 0, 0]
                if not i4:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                first = 0
                if not i4:
                    ctx = left_nz_y2 + above_nz_y2[mbx]
                    y2_coeffs, nz = _decode_coeffs(
                        tbr, st.coeff_probs[1], 0, y2q, ctx
                    )
                    left_nz_y2 = above_nz_y2[mbx] = nz
                    has_coeffs |= nz
                    ytype = 0
                    first = 1
                else:
                    ytype = 3
                ynz = [0] * 16
                for j in range(16):
                    row, col = j >> 2, j & 3
                    l = left_nz_y[row] if col == 0 else ynz[j - 1]
                    a = above_nz_y[mbx][col] if row == 0 else ynz[j - 4]
                    coeffs, nz = _decode_coeffs(
                        tbr, st.coeff_probs[ytype], first, y1q, l + a
                    )
                    yblocks[j] = coeffs
                    ynz[j] = nz
                    if col == 3:
                        left_nz_y[row] = nz
                    if row == 3:
                        above_nz_y[mbx][col] = nz
                    has_coeffs |= nz
                for pi, blocks in ((0, ublocks), (1, vblocks)):
                    unz = [0] * 4
                    for j in range(4):
                        row, col = j >> 1, j & 1
                        l = left_nz_uv[2 * pi + row] if col == 0 else unz[j - 1]
                        a = above_nz_uv[mbx][2 * pi + col] if row == 0 else unz[j - 2]
                        coeffs, nz = _decode_coeffs(
                            tbr, st.coeff_probs[2], 0, uvq, l + a
                        )
                        blocks[j] = coeffs
                        unz[j] = nz
                        if col == 1:
                            left_nz_uv[2 * pi + row] = nz
                        if row == 1:
                            above_nz_uv[mbx][2 * pi + col] = nz
                        has_coeffs |= nz

            # --- reconstruction ---
            bx, by = mbx * 16, mby * 8  # luma x, chroma y (chroma x = mbx*8)
            yx, yy = mbx * 16 + 1, mby * 16 + 1
            cx, cy = mbx * 8 + 1, mby * 8 + 1
            have_up = mby > 0
            have_left = mbx > 0

            if not i4:
                if y2_coeffs is not None:
                    wht = _iwht4x4(y2_coeffs)
                else:
                    wht = [0] * 16
                pred = _pred_block(Y, ys, yx, yy, 16, ymode, have_up, have_left)
                for j in range(16):
                    coeffs = yblocks[j] or [0] * 16
                    coeffs[0] = wht[j]
                    if any(coeffs):
                        res = _idct4x4(coeffs)
                    else:
                        res = None
                    ox, oy = (j & 3) * 4, (j >> 2) * 4
                    for r in range(4):
                        prow = (oy + r) * 16 + ox
                        drow = (yy + oy + r) * ys + yx + ox
                        if res is None:
                            Y[drow : drow + 4] = bytes(pred[prow : prow + 4])
                        else:
                            rr = r * 4
                            for c in range(4):
                                Y[drow + c] = _clip255(pred[prow + c] + res[rr + c])
            else:
                # 4x4 prediction: subblocks in raster order; above-right
                # quirk - right-column subblocks below the top row reuse
                # the MB-level above-right (RFC 6386 section 12.3).
                mb_tr_pos = (yy - 1) * ys + yx + 16
                if mbx == mbw - 1:
                    rep = Y[(yy - 1) * ys + yx + 15]
                    mb_tr = [rep] * 4
                    if mby == 0:
                        mb_tr = [127] * 4
                else:
                    mb_tr = list(Y[mb_tr_pos : mb_tr_pos + 4])
                for j in range(16):
                    row, col = j >> 2, j & 3
                    sx, sy = yx + col * 4, yy + row * 4
                    if col == 3:
                        # Right-column subblocks always use the MB-level
                        # above-right row captured before reconstruction
                        # (for row 0 the live read would be identical;
                        # for rows > 0 the true above-right belongs to a
                        # not-yet-decoded MB, hence the quirk).
                        tr = mb_tr
                    else:
                        p = (sy - 1) * ys + sx + 4
                        tr = list(Y[p : p + 4])
                    pred = _pred4(Y, ys, sx, sy, bmodes[j], tr)
                    coeffs = yblocks[j]
                    res = _idct4x4(coeffs) if coeffs is not None and any(coeffs) else None
                    for r in range(4):
                        drow = (sy + r) * ys + sx
                        if res is None:
                            Y[drow : drow + 4] = bytes(pred[r * 4 : r * 4 + 4])
                        else:
                            rr = r * 4
                            for c in range(4):
                                Y[drow + c] = _clip255(pred[rr + c] + res[rr + c])

            for plane, blocks in ((U, ublocks), (V, vblocks)):
                pred = _pred_block(plane, cs, cx, cy, 8, uvmode, have_up, have_left)
                for j in range(4):
                    coeffs = blocks[j]
                    res = _idct4x4(coeffs) if coeffs is not None and any(coeffs) else None
                    ox, oy = (j & 1) * 4, (j >> 1) * 4
                    for r in range(4):
                        prow = (oy + r) * 8 + ox
                        drow = (cy + oy + r) * cs + cx + ox
                        if res is None:
                            plane[drow : drow + 4] = bytes(pred[prow : prow + 4])
                        else:
                            rr = r * 4
                            for c in range(4):
                                plane[drow + c] = _clip255(pred[prow + c] + res[rr + c])

            # --- per-MB loop-filter level (section 15.2) ---
            if st.segmentation:
                lvl = st.seg_lf[segment] if st.seg_abs else st.filter_level + st.seg_lf[segment]
            else:
                lvl = st.filter_level
            if st.lf_delta_enabled:
                lvl += st.ref_lf_delta[0]
                if i4:
                    lvl += st.mode_lf_delta[0]
            lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
            mb_info.append((lvl, i4, has_coeffs))

    # --- loop filter pass (section 15) ---
    if st.filter_level > 0 and _loop_filter:
        simple = bool(st.filter_simple)
        for mby in range(mbh):
            for mbx in range(mbw):
                lvl, i4, has_coeffs = mb_info[mby * mbw + mbx]
                if lvl == 0:
                    continue
                interior, mb_lim, sb_lim, hev_t = _filter_params(st, lvl)
                inner = has_coeffs or i4
                yx, yy = mbx * 16 + 1, mby * 16 + 1
                cx, cy = mbx * 8 + 1, mby * 8 + 1
                if mbx > 0:
                    _filter_edge(Y, ys, yx, yy, 16, True, "mb", interior, mb_lim, hev_t, simple)
                    if not simple:
                        _filter_edge(U, cs, cx, cy, 8, True, "mb", interior, mb_lim, hev_t, False)
                        _filter_edge(V, cs, cx, cy, 8, True, "mb", interior, mb_lim, hev_t, False)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(Y, ys, yx + dx, yy, 16, True, "sb", interior, sb_lim, hev_t, simple)
                    if not simple:
                        _filter_edge(U, cs, cx + 4, cy, 8, True, "sb", interior, sb_lim, hev_t, False)
                        _filter_edge(V, cs, cx + 4, cy, 8, True, "sb", interior, sb_lim, hev_t, False)
                if mby > 0:
                    _filter_edge(Y, ys, yx, yy, 16, False, "mb", interior, mb_lim, hev_t, simple)
                    if not simple:
                        _filter_edge(U, cs, cx, cy, 8, False, "mb", interior, mb_lim, hev_t, False)
                        _filter_edge(V, cs, cx, cy, 8, False, "mb", interior, mb_lim, hev_t, False)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(Y, ys, yx, yy + dy, 16, False, "sb", interior, sb_lim, hev_t, simple)
                    if not simple:
                        _filter_edge(U, cs, cx, cy + 4, 8, False, "sb", interior, sb_lim, hev_t, False)
                        _filter_edge(V, cs, cx, cy + 4, 8, False, "sb", interior, sb_lim, hev_t, False)

    # --- crop to frame dimensions ---
    cw, chh = (w + 1) >> 1, (h + 1) >> 1
    yout = bytearray(w * h)
    for r in range(h):
        yout[r * w : (r + 1) * w] = Y[(r + 1) * ys + 1 : (r + 1) * ys + 1 + w]
    uout = bytearray(cw * chh)
    vout = bytearray(cw * chh)
    for r in range(chh):
        uout[r * cw : (r + 1) * cw] = U[(r + 1) * cs + 1 : (r + 1) * cs + 1 + cw]
        vout[r * cw : (r + 1) * cw] = V[(r + 1) * cs + 1 : (r + 1) * cs + 1 + cw]
    return w, h, bytes(yout), bytes(uout), bytes(vout)


# ---------------------------------------------------------------------------
# RGB conversion (documented simple path - see decode_vp8 for the
# differential-tested YUV output)
# ---------------------------------------------------------------------------


def yuv_to_rgb_rows(w, h, y, u, v):
    """BT.601 full-range conversion with nearest-neighbour chroma
    upsampling, using libwebp's fixed-point coefficients (dsp/yuv.h:
    19077/26149/6419/13320, rounding bias 14234/8708/17685, >> 6 after
    the >> 8 product shift).  The Y/U/V planes themselves are the
    bit-exact decode; RGB is a presentation-layer conversion."""
    cw = (w + 1) >> 1
    rows = []
    for r in range(h):
        row = []
        crow = (r >> 1) * cw
        yrow = r * w
        for c in range(w):
            yy = 19077 * y[yrow + c]
            uu = u[crow + (c >> 1)]
            vv = v[crow + (c >> 1)]
            rr = (yy + 26149 * vv - 14234 * 256) >> 14
            gg = (yy - 6419 * uu - 13320 * vv + 8708 * 256) >> 14
            bb = (yy + 33050 * uu - 17685 * 256) >> 14
            row.append((_clip255(rr), _clip255(gg), _clip255(bb)))
        rows.append(row)
    return rows


def decode_vp8_rgb(vp8: bytes):
    w, h, y, u, v = decode_vp8(vp8)
    return w, h, yuv_to_rgb_rows(w, h, y, u, v)
