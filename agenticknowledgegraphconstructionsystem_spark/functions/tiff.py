"""Baseline TIFF 6.0 codec — stdlib only.

Public format: TIFF 6.0 specification (Adobe, 1992-06-03).  Implements
the baseline subset a web crawl / document corpus actually contains:

* both byte orders (``II`` little / ``MM`` big endian),
* 8-bit grayscale (photometric 0/1), RGB(A) chunky, and palette-color,
* strip organisation (any RowsPerStrip, multi-strip),
* compressions: none (1), LZW (5) with horizontal-differencing
  predictor (2), Deflate (8/32946, stdlib zlib), PackBits (32773),
* multi-IFD files decode the FIRST image (the thumbnail convention).

TIFF LZW differs from GIF LZW (functions/gif.py) in two load-bearing
ways pinned by tests: codes are packed MSB-first, and the code width
bumps one code EARLY (at table length 511/1023/2047, spec §13 "LZW
Differencing" reference implementation — the "early change" giflib
never does).

``decode_tiff`` plugs into operators/multimodal.py's
``decode_image_any`` contract (alpha dropped); ``encode_tiff`` is the
fixture writer; ``tiff_dimensions`` feeds the header-only
``media_metadata`` probe.  tests/test_tiff.py roundtrips every
compression, and differentially fuzzes BOTH directions against the
REAL libtiff (TIFFReadRGBAImage / TIFFWriteScanline via ctypes) when
the host ships it.

Reference parity note: the reference ingests PDFs only
(src/tools/pdf-extractor.ts); the image tier is rebuild-only surface
for the multimodal columns mandated by the build brief.
"""

from __future__ import annotations

import struct
import zlib

_MAX_CODE = 4096
_CLEAR = 256
_EOI = 257


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, early change)
# ---------------------------------------------------------------------------


def tiff_lzw_decode(data: bytes, n_out: int) -> bytes:
    """TIFF-variant LZW → exactly ``n_out`` bytes."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    code_size = 9
    bitpos = 0
    nbits = len(data) * 8
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_out:
        if bitpos + code_size > nbits:
            raise ValueError("truncated TIFF LZW stream")
        byte = bitpos >> 3
        window = int.from_bytes(data[byte : byte + 3].ljust(3, b"\0"), "big")
        code = (window >> (24 - (bitpos & 7) - code_size)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == _CLEAR:
            table = list(base)
            code_size = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(f"first TIFF LZW code {code} is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table frontier")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            # EARLY CHANGE: widen one entry before the table actually
            # overflows the width (spec reference implementation)
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_out:
        raise ValueError(f"TIFF LZW ended at {len(out)} of {n_out} bytes")
    return bytes(out[:n_out])


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor mirroring :func:`tiff_lzw_decode`'s
    width timing; re-emits Clear when the table fills (what libtiff
    does), so long streams stay compressed."""
    d: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    code_size = 9
    emitted = 0
    acc = 0
    acc_bits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << code_size) | code
        acc_bits += code_size
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8
        acc &= (1 << acc_bits) - 1

    def after_emit() -> int:
        """Mirror the decoder: its table (258 base entries, one add per
        data code after the first) has length ``257 + i`` after our
        i-th data code since Clear — the next learned string's slot —
        and the EARLY width change fires when that hits
        ``(1 << code_size) - 1``."""
        nonlocal emitted, code_size
        emitted += 1
        slot = 257 + emitted
        if slot == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        return slot

    def reset() -> None:
        nonlocal d, code_size, emitted
        emit(_CLEAR)
        d = {bytes([i]): i for i in range(256)}
        code_size = 9
        emitted = 0

    emit(_CLEAR)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in d:
            prefix = cand
            continue
        emit(d[prefix])
        slot = after_emit()
        if slot < _MAX_CODE - 2:
            d[cand] = slot
        else:
            # near-full table: re-Clear like libtiff's encoder (its
            # decoder does not accept frozen no-Clear streams)
            reset()
        prefix = bytes([b])
    if prefix:
        emit(d[prefix])
        after_emit()
    emit(_EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits (Apple RLE, TIFF §9)
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, n_out: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < n_out:
        if pos >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != n_out:
        raise ValueError(f"PackBits produced {len(out)} of {n_out} bytes")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs ≥ 2 become repeats, the rest
    literal chunks of ≤ 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    if off + 2 > len(payload):
        raise ValueError("IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", payload, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(payload):
            raise ValueError("truncated IFD")
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # private/unknown type: skip, per spec
        total = size * count
        vpos = base + 8
        if total > 4:
            (vpos,) = struct.unpack_from(bo + "I", payload, base + 8)
        if vpos + total > len(payload):
            raise ValueError(f"tag {tag} value out of range")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt is None:
            continue  # rationals/floats/ascii: nothing baseline needs
        tags[tag] = list(
            struct.unpack_from(bo + str(count) + fmt, payload, vpos)
        )
    return tags


def tiff_dimensions(payload: bytes) -> tuple[int, int]:
    """Header+IFD walk → (width, height); never touches strip data."""
    bo = _byte_order(payload)
    tags = _read_ifd(payload, bo)
    try:
        return tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    except KeyError as e:
        raise ValueError("TIFF without dimension tags") from e


def _byte_order(payload: bytes) -> str:
    if payload[:4] == b"II*\x00":
        return "<"
    if payload[:4] == b"MM\x00*":
        return ">"
    raise ValueError("not a TIFF payload")


def decode_tiff(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """First IFD → (w, h, rgb_rows).  Raises ValueError for non-TIFF
    bytes and NotImplementedError for beyond-baseline features (JPEG-
    in-TIFF, CCITT fax, tiles, planar, 16-bit)."""
    bo = _byte_order(payload)
    tags = _read_ifd(payload, bo)
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_HEIGHT][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag: {e}") from e
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bps = tags.get(_TAG_BPS, [1] * spp)
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    planar = tags.get(_TAG_PLANAR, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar TIFF is beyond baseline")
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"only 8-bit samples supported, got {bps}")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"photometric {photo} (fax/YCbCr/...) unsupported")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    row_bytes = w * spp
    raster = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(payload):
            raise ValueError(f"strip {si} out of range")
        strip = payload[o : o + c]
        rows_here = min(rps, h - si * rps)
        if rows_here <= 0:
            raise ValueError("more strips than rows")
        n_out = rows_here * row_bytes
        if comp == 1:
            if len(strip) < n_out:
                raise ValueError(f"strip {si} shorter than raster")
            data = strip[:n_out]
        elif comp == 5:
            data = tiff_lzw_decode(strip, n_out)
        elif comp in (8, 32946):
            data = zlib.decompress(strip)
            if len(data) != n_out:
                raise ValueError(f"deflate strip {si} wrong length")
        elif comp == 32773:
            data = packbits_decode(strip, n_out)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} (JPEG/CCITT/...) unsupported"
            )
        if predictor == 2:
            buf = bytearray(data)
            for y in range(rows_here):
                base = y * row_bytes
                for x in range(spp, row_bytes):
                    buf[base + x] = (buf[base + x] + buf[base + x - spp]) & 0xFF
            data = bytes(buf)
        elif predictor != 1:
            raise NotImplementedError(f"predictor {predictor} unsupported")
        raster += data
    cmap = None
    if photo == 3:
        cm = tags.get(_TAG_COLORMAP)
        if not cm or len(cm) != 3 * 256:
            raise ValueError("palette TIFF without a 3x256 ColorMap")
        # 16-bit color map entries; the spec's 8-bit reduction is >> 8
        cmap = [
            (cm[i] >> 8, cm[256 + i] >> 8, cm[512 + i] >> 8) for i in range(256)
        ]
    rows = []
    for y in range(h):
        base = y * row_bytes
        if photo == 2:
            row = [
                (raster[base + x * spp], raster[base + x * spp + 1],
                 raster[base + x * spp + 2])
                for x in range(w)
            ]
        elif photo == 3:
            row = [cmap[raster[base + x]] for x in range(w)]
        else:
            inv = photo == 0  # WhiteIsZero
            row = [
                ((255 - raster[base + x * spp]) if inv else raster[base + x * spp],) * 3
                for x in range(w)
            ]
        rows.append(row)
    return w, h, rows


def encode_tiff(
    rows: list[list[tuple[int, int, int]]],
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    photometric: int = 2,
    big_endian: bool = False,
) -> bytes:
    """Fixture writer: RGB rows (or grayscale via photometric 1, using
    each pixel's red channel) → a single-IFD TIFF."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    spp = 3 if photometric == 2 else 1
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for top in range(0, h, rps):
        chunk = rows[top : top + rps]
        if photometric == 2:
            data = bytes(v for r in chunk for px in r for v in px)
        else:
            data = bytes(px[0] for r in chunk for px in r)
        if predictor == 2:
            row_bytes = w * spp
            buf = bytearray(data)
            for y in range(len(chunk)):
                base = y * row_bytes
                for x in range(row_bytes - 1, spp - 1, -1):
                    buf[base + x] = (buf[base + x] - buf[base + x - spp]) & 0xFF
            data = bytes(buf)
        if compression == 5:
            strips.append(tiff_lzw_encode(data))
        elif compression == 8:
            strips.append(zlib.compress(data))
        elif compression == 32773:
            strips.append(packbits_encode(data))
        elif compression == 1:
            strips.append(data)
        else:
            raise ValueError(f"encoder does not write compression {compression}")
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    entries: list[tuple[int, int, list[int]]] = [
        (_TAG_WIDTH, 4, [w]),
        (_TAG_HEIGHT, 4, [h]),
        (_TAG_BPS, 3, [8] * spp),
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3, [photometric]),
        (_TAG_STRIP_OFFSETS, 4, [0] * len(strips)),  # patched below
        (_TAG_SPP, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 4, [rps]),
        (_TAG_STRIP_COUNTS, 4, [len(s) for s in strips]),
    ]
    if predictor != 1:
        entries.append((_TAG_PREDICTOR, 3, [predictor]))
    entries.sort()
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    # overflow area for >4-byte values, then strip data
    over_off = ifd_off + ifd_len
    over = bytearray()
    sizes = {3: 2, 4: 4}
    fixed: list[tuple[int, int, int, bytes]] = []
    for tag, typ, vals in entries:
        total = sizes[typ] * len(vals)
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack(bo + str(len(vals)) + fmt, *vals)
        if total <= 4:
            fixed.append((tag, typ, len(vals), packed.ljust(4, b"\0")))
        else:
            fixed.append(
                (tag, typ, len(vals),
                 struct.pack(bo + "I", over_off + len(over)))
            )
            over += packed
    data_off = over_off + len(over)
    # now patch real strip offsets
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    out = bytearray(header)
    out += struct.pack(bo + "H", len(entries))
    oi = 0
    for (tag, typ, count, val), (etag, etyp, evals) in zip(fixed, entries):
        if tag == _TAG_STRIP_OFFSETS:
            packed = struct.pack(bo + str(len(offsets)) + "I", *offsets)
            if len(packed) <= 4:
                val = packed.ljust(4, b"\0")
            else:
                # replace the overflow bytes reserved above
                slot = struct.unpack_from(bo + "I", val)[0] - over_off
                over[slot : slot + len(packed)] = packed
        out += struct.pack(bo + "HHI", tag, typ, count) + val
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += over
    for s in strips:
        out += s
    return bytes(out)
