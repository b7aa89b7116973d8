"""Pure-stdlib WebP-lossless (VP8L) codec — the decoder covers the FULL
bitstream (all four transforms, color cache, meta prefix codes, LZ77
backward references incl. the 120 two-dimensional near-distance codes),
plus a minimal valid encoder for self-contained roundtrip tests.

Format: "WebP Lossless Bitstream Specification" (RFC 9649 / Google
WebP container spec).  Like functions/jpeg.py, this is the honest
correctness tier for the multimodal decode path (operators/multimodal.py
— the reference has no media pipeline at all; this belongs to the
brief's first-class training-data operations): per-payload Python behind
the SAME mapInPandas batch shape a libwebp-backed production build would
use, with the media catalog (`media_metadata`) bounding how often the
expensive path runs.

Correctness evidence (tests/test_webp.py):
* hand-built bitstreams with known pixels (simple codes, subtract-green,
  LZ77 run, color cache);
* encoder→decoder roundtrips over structured and random images;
* when the host happens to ship libwebp (this sandbox does), a
  ctypes-driven differential fuzz: libwebp-ENCODED payloads (real
  encoder output exercising predictors/color transforms/palettes/cache)
  must decode pixel-identically to libwebp's own decoder.  The 120-entry
  near-distance table below was additionally verified byte-for-byte
  against the table embedded in libwebp.so.

Unsupported on purpose: lossy VP8 chunks and animations raise
``NotImplementedError`` (a lossy VP8 intra decoder is a different
project); those payloads stay in the honest-raise tier.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# bit reader / writer (LSB-first within bytes, per the VP8L spec §3)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # absolute bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + n
        byte0 = p >> 3
        # gather enough bytes to cover the span (n <= 24 in practice)
        span = (p % 8 + n + 7) >> 3
        val = int.from_bytes(self.data[byte0 : byte0 + span], "little")
        return (val >> (p % 8)) & ((1 << n) - 1)


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):  # LSB first
            self._bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits enter the stream MSB of the code first (the
        DEFLATE convention VP8L shares)."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (spec §5.2 — DEFLATE-style code assignment)
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Canonical prefix decoder: codes assigned in (length, symbol) order;
    decoding walks one bit at a time with code = (code << 1) | bit.  A
    single-symbol code consumes ZERO bits (spec: simple code with one
    symbol, and a normal code where exactly one symbol has a nonzero
    length)."""

    __slots__ = ("single", "first_code", "first_sym", "syms")

    def __init__(self, lengths: list[int]):
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        kraft = sum(1 << (max_len - ln) for ln, _ in used)
        if kraft != (1 << max_len):
            raise ValueError("VP8L: prefix code not complete")
        used.sort()
        # per-length first code / first symbol-index tables
        self.first_code = [0] * (max_len + 1)
        self.first_sym = [0] * (max_len + 1)
        self.syms = [s for _, s in used]
        code = 0
        i = 0
        for ln in range(1, max_len + 1):
            self.first_code[ln] = code
            self.first_sym[ln] = i
            cnt = 0
            while i < len(used) and used[i][0] == ln:
                i += 1
                cnt += 1
            code = (code + cnt) << 1

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, len(self.first_code)):
            code = (code << 1) | br.read(1)
            nxt = (
                self.first_code[ln + 1] >> 1
                if ln + 1 < len(self.first_code)
                else 1 << ln
            )
            if code < nxt:
                return self.syms[self.first_sym[ln] + (code - self.first_code[ln])]
        raise ValueError("VP8L: invalid prefix code in stream")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under the canonical assignment (encoder
    side; must mirror _PrefixCode exactly)."""
    used = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, s in used:
        code <<= ln - prev_len
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


#: kCodeLengthCodeOrder (spec §5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """Spec §5.2.1/§5.2.2: 'simple' (1-2 symbols) or normal (code-length-
    coded) prefix code."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("VP8L: simple-code symbol invalid")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single symbol → 0-bit code in _PrefixCode
        return _PrefixCode(lengths)
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # kDefaultCodeLength
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 value coding + the 120 near-distance plane codes (spec §4.2.2)
# ---------------------------------------------------------------------------


def _lz77_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _near_offsets() -> list[tuple[int, int]]:
    """The 120 two-dimensional near-distance offsets, generated by the
    spec's enumeration: all (dx, dy) with dy in [0,7], dx in [-7,8],
    dy > 0 or dx > 0, ordered by squared distance, then larger dy first,
    then positive dx before negative.  Verified byte-for-byte against the
    kCodeToPlane table embedded in libwebp.so (tests/test_webp.py pins
    the first/last entries)."""
    offs = [
        (x, y) for y in range(8) for x in range(-7, 9) if y > 0 or x > 0
    ]
    offs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] > 0 else 1))
    return offs


_NEAR = _near_offsets()


def _plane_to_distance(plane_code: int, width: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _NEAR[plane_code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image (spec §5.2.3) — shared by the ARGB image, transform
# data, entropy image, and the palette
# ---------------------------------------------------------------------------

_ALPHABET_EXTRA = 24  # length codes appended to the green alphabet


def _decode_pixels(
    br: _BitReader,
    width: int,
    height: int,
    meta: tuple[list[int], int, int] | None,
    is_level0: bool,
) -> list[int]:
    """→ flat ARGB uint32 list of width*height pixels (spec §5.2.3) —
    shared by the ARGB image, transform data, entropy image, and the
    palette.  Recursion passes is_level0=False: no transforms, no meta
    prefix codes — but a color cache is legal at every level."""
    # color cache (spec §4.3)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix codes (spec §5.3) — ARGB image only
    meta_img = None
    meta_bits = 0
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_pixels(br, mw, mh, None, False)
    if meta is not None:  # pre-decoded (unused today; kept for symmetry)
        meta_img, meta_bits, _ = meta
    if meta_img is not None:
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta_img) + 1
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
    else:
        num_groups = 1
        mw = 0
    green_size = 256 + _ALPHABET_EXTRA + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        green = _read_prefix_code(br, green_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    total = width * height
    pixels = [0] * total
    pos = 0
    g_green = g_red = g_blue = g_alpha = g_dist = None
    cur_group_idx = -1
    while pos < total:
        if meta_img is not None:
            x = pos % width
            y = pos // width
            gi = (meta_img[(y >> meta_bits) * mw + (x >> meta_bits)] >> 8) & 0xFFFF
        else:
            gi = 0
        if gi != cur_group_idx:
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
            cur_group_idx = gi
        s = g_green.decode(br)
        if s < 256:
            r = g_red.decode(br)
            b = g_blue.decode(br)
            a = g_alpha.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + _ALPHABET_EXTRA:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(g_dist.decode(br), br)
            dist = _plane_to_distance(dist_code, width)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
            cur_group_idx = -1  # group may differ after a long copy
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            pixels[pos] = cache[s - 256 - _ALPHABET_EXTRA]
            pos += 1
    return pixels


# ---------------------------------------------------------------------------
# transforms (spec §4), applied inverse in reverse read order
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(l_px: int, t_px: int, tl_px: int) -> int:  # noqa: E741
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (l_px >> sh) & 0xFF
        tc = (t_px >> sh) & 0xFF
        tlc = (tl_px >> sh) & 0xFF
        pred = lc + tc - tlc
        p_l += abs(pred - lc)
        p_t += abs(pred - tc)
    return l_px if p_l < p_t else t_px


def _clamp_add_sub_full(l_px: int, t_px: int, tl_px: int) -> int:  # noqa: E741
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l_px >> sh) & 0xFF) + ((t_px >> sh) & 0xFF) - ((tl_px >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(avg_px: int, tl_px: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg_px >> sh) & 0xFF
        d = a - ((tl_px >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncating division
        out |= max(0, min(255, a + half)) << sh
    return out


def _apply_predictor_inverse(
    pixels: list[int], w: int, h: int, pred_img: list[int], bits: int
) -> None:
    pw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]
            elif x == 0:
                pred = pixels[pos - w]
            else:
                mode = (pred_img[(y >> bits) * pw + (x >> bits)] >> 8) & 0xFF
                l_px = pixels[pos - 1]
                t_px = pixels[pos - w]
                tl_px = pixels[pos - w - 1]
                # TR of the last column = leftmost pixel of the CURRENT
                # row (the libwebp memory layout made normative)
                tr_px = pixels[pos - w + 1] if x + 1 < w else pixels[row]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l_px
                elif mode == 2:
                    pred = t_px
                elif mode == 3:
                    pred = tr_px
                elif mode == 4:
                    pred = tl_px
                elif mode == 5:
                    pred = _avg2(_avg2(l_px, tr_px), t_px)
                elif mode == 6:
                    pred = _avg2(l_px, tl_px)
                elif mode == 7:
                    pred = _avg2(l_px, t_px)
                elif mode == 8:
                    pred = _avg2(tl_px, t_px)
                elif mode == 9:
                    pred = _avg2(t_px, tr_px)
                elif mode == 10:
                    pred = _avg2(_avg2(l_px, tl_px), _avg2(t_px, tr_px))
                elif mode == 11:
                    pred = _select(l_px, t_px, tl_px)
                elif mode == 12:
                    pred = _clamp_add_sub_full(l_px, t_px, tl_px)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(l_px, t_px), tl_px)
                else:
                    raise ValueError(f"VP8L: predictor mode {mode} invalid")
            px = pixels[pos]
            pixels[pos] = (
                ((((px >> 24) + (pred >> 24)) & 0xFF) << 24)
                | ((((px >> 16) + (pred >> 16)) & 0xFF) << 16)
                | ((((px >> 8) + (pred >> 8)) & 0xFF) << 8)
                | ((px + pred) & 0xFF)
            )


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _apply_color_transform_inverse(
    pixels: list[int], w: int, h: int, cte_img: list[int], bits: int
) -> None:
    pw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            cte = cte_img[(y >> bits) * pw + (x >> bits)]
            g2r = _s8(cte & 0xFF)  # stored in the blue byte
            g2b = _s8((cte >> 8) & 0xFF)  # green byte
            r2b = _s8((cte >> 16) & 0xFF)  # red byte
            px = pixels[pos]
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r = (r + ((g2r * _s8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * _s8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * _s8(r)) >> 5)) & 0xFF
            pixels[pos] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _apply_subtract_green_inverse(pixels: list[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _apply_color_indexing_inverse(
    pixels: list[int], w: int, packed_w: int, h: int, palette: list[int]
) -> list[int]:
    if packed_w == w and len(palette) > 16:
        bits_per_px = 8
    else:
        if len(palette) <= 2:
            bits_per_px = 1
        elif len(palette) <= 4:
            bits_per_px = 2
        elif len(palette) <= 16:
            bits_per_px = 4
        else:
            bits_per_px = 8
    mask = (1 << bits_per_px) - 1
    per_byte = 8 // bits_per_px
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = pixels[y * packed_w + x // per_byte]
            idx = ((packed >> 8) & 0xFF) >> (bits_per_px * (x % per_byte)) & mask
            if idx >= len(palette):
                raise ValueError("VP8L: palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

#: transform type tags (spec §4)
_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3


def decode_vp8l(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int, int]]]]:
    """Raw VP8L stream (starting with the 0x2F signature byte) →
    (width, height, rows), rows[y][x] = (r, g, b, a) top-down."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    cur_w = w
    transforms: list[tuple[int, object]] = []
    seen: set[int] = set()
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(t)
        if t in (_T_PREDICTOR, _T_COLOR):
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            data = _decode_pixels(br, tw, th, None, False)
            transforms.append((t, (bits, data)))
        elif t == _T_SUBTRACT_GREEN:
            transforms.append((t, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            raw = _decode_pixels(br, n_colors, 1, None, False)
            palette = []
            prev = 0
            for v in raw:  # per-channel delta accumulation
                px = (
                    (((v >> 24) + (prev >> 24)) & 0xFF) << 24
                    | (((v >> 16) + (prev >> 16)) & 0xFF) << 16
                    | (((v >> 8) + (prev >> 8)) & 0xFF) << 8
                    | ((v + prev) & 0xFF)
                )
                palette.append(px)
                prev = px
            full_w = cur_w
            if n_colors <= 2:
                cur_w = (cur_w + 7) >> 3
            elif n_colors <= 4:
                cur_w = (cur_w + 3) >> 2
            elif n_colors <= 16:
                cur_w = (cur_w + 1) >> 1
            transforms.append((t, (full_w, palette)))
    pixels = _decode_pixels(br, cur_w, h, None, True)
    for t, info in reversed(transforms):
        if t == _T_COLOR_INDEX:
            full_w, palette = info  # type: ignore[misc]
            pixels = _apply_color_indexing_inverse(pixels, full_w, cur_w, h, palette)
            cur_w = full_w
        elif t == _T_PREDICTOR:
            bits, data = info  # type: ignore[misc]
            _apply_predictor_inverse(pixels, cur_w, h, data, bits)
        elif t == _T_COLOR:
            bits, data = info  # type: ignore[misc]
            _apply_color_transform_inverse(pixels, cur_w, h, data, bits)
        else:
            _apply_subtract_green_inverse(pixels)
    rows = [
        [
            (
                (px >> 16) & 0xFF,
                (px >> 8) & 0xFF,
                px & 0xFF,
                (px >> 24) & 0xFF,
            )
            for px in pixels[y * w : (y + 1) * w]
        ]
        for y in range(h)
    ]
    return w, h, rows


def decode_webp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """RIFF/WEBP container → (w, h, rows[(r, g, b)]).  Lossless (VP8L)
    decodes here; lossy (VP8) dispatches to functions/vp8.py's RFC 6386
    keyframe decoder (bit-exact Y/U/V vs libwebp, then the documented
    BT.601 fixed-point RGB conversion).  Alpha is dropped (the
    decode_image_any contract).  Animations raise NotImplementedError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            w, h, rows = decode_vp8l(body)
            return w, h, [[(r, g, b) for r, g, b, _a in row] for row in rows]
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_rgb

            return decode_vp8_rgb(body)
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            raise NotImplementedError("animated WebP is not supported")
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP: no VP8 or VP8L chunk found")


def webp_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Header-only dimensions for the media catalog (media_metadata tier):
    VP8L 14+14-bit size field, the lossy VP8 keyframe 14-bit fields, or
    the VP8X canvas size.  None if no size-bearing chunk parses."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            v = int.from_bytes(body[1:5], "little")
            return (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        if fourcc == b"VP8 " and len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            return w, h
        if fourcc == b"VP8X" and len(body) >= 10:
            wm1 = int.from_bytes(body[4:7], "little")
            hm1 = int.from_bytes(body[7:10], "little")
            return wm1 + 1, hm1 + 1
        pos += 8 + size + (size & 1)
    return None


# ---------------------------------------------------------------------------
# minimal valid encoder (tests' self-contained roundtrip path): literal-only
# stream — no transforms, no cache, no meta codes, real per-channel
# canonical prefix codes (simple codes where a channel has <= 2 values)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    import heapq
    import itertools

    used = [s for s, f in freqs.items() if f > 0]
    if len(used) <= 2:
        return {s: 1 for s in used} if len(used) == 2 else {used[0]: 1}
    tie = itertools.count()
    heap = [(f, next(tie), s, None, None) for s, f in freqs.items() if f > 0]
    heapq.heapify(heap)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], next(tie), None, a, b))
    lengths: dict[int, int] = {}

    def walk(node, depth):
        if node[2] is not None:
            lengths[node[2]] = max(depth, 1)
            return
        walk(node[3], depth + 1)
        walk(node[4], depth + 1)

    walk(heap[0], 0)
    if max(lengths.values()) > max_len:
        # flat complete fallback (tiny inputs never hit this; guard anyway)
        k = len(used)
        top = 1
        while (1 << top) < k:
            top += 1
        n_short = (1 << top) - k
        lengths = {}
        for i, s in enumerate(sorted(used)):
            lengths[s] = top - 1 if i < n_short else top
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] < 2:
            bw.write(0, 1)  # 1-bit symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)  # 8-bit symbol
            bw.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2 and used[0] < 256 and used[1] < 256:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    # code-length code over the DIRECT symbols 0..15 only (no repeats) —
    # valid, just not maximally compact; fine for a test encoder
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths_map = _huffman_lengths(cl_freq, max_len=7)
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    # num_code_lengths must cover every used slot of _CL_ORDER
    last_used = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0)
    num_code_lengths = max(4, last_used + 1)
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    for ln in lengths:
        code, n = cl_codes[ln]
        bw.write_code(code, n)
    return _canonical_codes(lengths)


def encode_vp8l(rows: list[list[tuple[int, int, int, int]]]) -> bytes:
    """(r, g, b, a) rows → a valid literal-only VP8L stream (the test
    encoder: no transforms, no cache, real canonical prefix codes)."""
    h = len(rows)
    w = len(rows[0])
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L: dimensions out of range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if any(px[3] != 255 for row in rows for px in row) else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    green_size = 256 + _ALPHABET_EXTRA
    freqs = [dict() for _ in range(4)]  # type: list[dict[int, int]]
    for row in rows:
        for r, g, b, a in row:
            for i, v in enumerate((g, r, b, a)):
                freqs[i][v] = freqs[i].get(v, 0) + 1
    tables = []
    for i, alphabet in enumerate((green_size, 256, 256, 256)):
        lengths = [0] * alphabet
        for s, ln in _huffman_lengths(freqs[i]).items():
            lengths[s] = ln
        tables.append(_write_prefix_code(bw, lengths))
    dist_lengths = [0] * 40
    dist_lengths[0] = 1  # unused distance code must still be present
    _write_prefix_code(bw, dist_lengths)
    g_t, r_t, b_t, a_t = tables
    for row in rows:
        for r, g, b, a in row:
            for table, v in ((g_t, g), (r_t, r), (b_t, b), (a_t, a)):
                code, n = table[v]
                bw.write_code(code, n)
    return bw.getvalue()


def encode_webp_lossless(rows: list[list[tuple[int, int, int, int]]]) -> bytes:
    """Wrap :func:`encode_vp8l` output in a RIFF/WEBP container."""
    vp8l = encode_vp8l(rows)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
