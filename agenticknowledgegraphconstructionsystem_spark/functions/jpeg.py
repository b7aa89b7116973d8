"""Baseline JPEG codec in pure stdlib + numpy (ITU-T T.81 / ISO 10918-1,
sequential DCT, 8-bit) — the dominant web image format, closing the
multimodal tier's biggest realism gap (a Common-Crawl media corpus is
overwhelmingly JPEG/PNG; PNG/BMP/WAV/Y4M already decode in
operators/multimodal.py).

Decoder scope: baseline SOF0, 8-bit precision, 1 or 3 components, any
sampling factors (4:4:4 / 4:2:2 / 4:2:0 via the generic interleaved MCU
loop), multiple DQT/DHT segments, restart markers (DRI/RSTn), 0xFF00
byte-stuffing.  Progressive (SOF2) and arithmetic coding raise an honest
``NotImplementedError``; malformed streams raise ``ValueError``.

Encoder scope (test-fixture writer, the ``encode_bmp``/``encode_png``
sibling): baseline, single interleaved scan, 4:4:4 or 4:2:0, optional
grayscale and restart intervals.  Huffman tables are built per image as
FIXED-LENGTH canonical tables over the symbols actually used (a valid
degenerate Huffman table; the all-ones code stays unused as T.81
requires) — deliberately suboptimal compression in exchange for zero
dependence on the Annex K example tables.

Like the other stdlib codecs this is the honest correctness tier: a
production 100 TB media pipeline would swap the per-payload Python call
for libjpeg-turbo behind the same mapInPandas batch shape
(operators/multimodal.py), which is exactly why the Spark-side plumbing
is the part under test.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) coefficient positions in T.81 zig-zag stream
    order, generated (not transcribed) to keep the table error-proof."""
    order: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


ZIGZAG = _zigzag_order()

#: orthonormal 8-point DCT-II basis: forward F = A @ f @ A.T, inverse
#: f = A.T @ F @ A (A is orthogonal)
_A = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            / 2.0
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal; stops (ValueError) on an unexpected marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted mid-block")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                        if nxt is not None
                        else "truncated entropy data at 0xFF"
                    )
                self.pos += 2
            else:
                self.pos += 1
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, n: int) -> None:
        """Discard partial byte, consume the expected RSTn marker."""
        self.nbits = 0
        if self.data[self.pos : self.pos + 2] != bytes([0xFF, 0xD0 + (n % 8)]):
            raise ValueError(
                f"expected RST{n % 8} at byte {self.pos}, "
                f"got {self.data[self.pos:self.pos + 2]!r}"
            )
        self.pos += 2


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(BITS, HUFFVAL) → {(code_length, code): symbol} — canonical T.81
    code assignment (annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: s-bit received value → signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    r: _BitReader,
    dc_tbl: dict[tuple[int, int], int],
    ac_tbl: dict[tuple[int, int], int],
    quant: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8×8 block: Huffman decode → dequantize → de-zigzag → IDCT.
    Returns (spatial block float64 [0..255-ish, pre-clip], new DC pred)."""
    zz = np.zeros(64, dtype=np.int32)
    s = _decode_huff(r, dc_tbl)
    dc = pred + _extend(r.read_bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(r.read_bits(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    for i, (row, col) in enumerate(ZIGZAG):
        coef[row, col] = zz[i] * quant[i]
    return _A.T @ coef @ _A + 128.0, dc


def decode_jpeg(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Baseline JPEG bytes → (width, height, rows of (r, g, b)) — the
    same return convention as multimodal.decode_bmp / decode_png.
    Grayscale decodes with r = g = b = Y."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []  # id, h, v, tq — SOF order
    width = height = 0
    restart = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI without an SOS scan")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                quants[tq] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline+extended seq
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X} — progressive/"
                "hierarchical/arithmetic); only sequential baseline is supported"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                huffs[(tc, th)] = _build_huff(counts, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — single interleaved baseline scan
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan: list[dict] = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            return _decode_scan(
                payload, pos + seglen, scan, quants, huffs, width, height, restart
            )
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    scan: list[dict],
    quants: dict[int, np.ndarray],
    huffs: dict,
    width: int,
    height: int,
    restart: int,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if len(scan) == 1:  # non-interleaved single-component scan: MCU = 1 block
        scan[0] = {**scan[0], "h": 1, "v": 1}
        hmax = vmax = 1
        mcus_x = (width + 7) // 8
        mcus_y = (height + 7) // 8
    else:
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"])) for c in scan
    ]
    r = _BitReader(data, pos)
    preds = [0] * len(scan)
    n_rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            r.sync_restart(n_rst)
            n_rst += 1
            preds = [0] * len(scan)
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(scan):
            quant = quants[c["tq"]]
            dc_t, ac_t = huffs[(0, c["dc"])], huffs[(1, c["ac"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block, preds[ci] = _decode_block(r, dc_t, ac_t, quant, preds[ci])
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample each component to full resolution by sample replication
    ys = np.arange(height)
    xs = np.arange(width)
    full = []
    for ci, c in enumerate(scan):
        full.append(
            planes[ci][np.ix_(ys * c["v"] // vmax, xs * c["h"] // hmax)]
        )
    if len(scan) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, [
        [tuple(int(v) for v in px) for px in row] for row in rgb
    ]


# ---------------------------------------------------------------------------
# Encoder (test-fixture writer)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per T.81


def _category(v: int) -> int:
    return abs(v).bit_length()


def _fixed_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Used symbols → a valid fixed-length canonical Huffman table:
    (BITS counts, ordered symbols, {symbol: (code, length)}).  Length is
    the smallest L with 2**L > n so the all-ones code stays unused."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) <= n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return counts, vals, {s: (i, length) for i, s in enumerate(vals)}


def _blocks_mcu_order(
    plane: np.ndarray, h: int, v: int, mcus_x: int, mcus_y: int
) -> "list[tuple[int, np.ndarray]]":
    """(mcu_index, 8×8 block) pairs in interleaved scan order for a
    component with sampling factors (h, v)."""
    out = []
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for by in range(v):
            for bx in range(h):
                y0 = (my * v + by) * 8
                x0 = (mx * h + bx) * 8
                out.append((mcu, plane[y0 : y0 + 8, x0 : x0 + 8]))
    return out


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(
        plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
    )


def encode_jpeg(
    rows: list[list[tuple[int, int, int]]],
    quant: int | list[int] = 1,
    chroma_subsample: int = 1,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Pixel rows → baseline JPEG bytes.  ``quant`` is one value or a
    64-list in zig-zag order shared by all components (1 = near-lossless);
    ``chroma_subsample=2`` emits 4:2:0 (mean-pooled chroma).  Fixture
    writer — compression ratio is a non-goal (fixed-length Huffman codes).
    """
    px = np.array(rows, dtype=np.float64)
    h_img, w_img = px.shape[0], px.shape[1]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    qtab = np.array(
        [quant] * 64 if isinstance(quant, int) else list(quant), dtype=np.int32
    )
    if grayscale:
        comps = [(1, 1, 1, 0, yy)]
    else:
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        k = chroma_subsample
        if k > 1:  # mean-pool chroma k×k
            ph, pw = -(-h_img // k) * k, -(-w_img // k) * k
            cb = _pad_to(cb, ph, pw).reshape(ph // k, k, pw // k, k).mean(axis=(1, 3))
            cr = _pad_to(cr, ph, pw).reshape(ph // k, k, pw // k, k).mean(axis=(1, 3))
        comps = [(1, k, k, 0, yy), (2, 1, 1, 0, cb), (3, 1, 1, 0, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h_img + 8 * vmax - 1) // (8 * vmax)

    # per-component quantized zig-zag blocks in MCU order
    per_comp: list[list[tuple[int, np.ndarray]]] = []
    for _cid, ch, cv, _tq, plane in comps:
        padded = _pad_to(plane, mcus_y * 8 * cv, mcus_x * 8 * ch)
        quantized = []
        for mcu, block in _blocks_mcu_order(padded, ch, cv, mcus_x, mcus_y):
            coef = _A @ (block - 128.0) @ _A.T
            zz = np.array(
                [int(round(coef[row, col] / qtab[i])) for i, (row, col) in enumerate(ZIGZAG)]
            )
            quantized.append((mcu, zz))
        per_comp.append(quantized)

    # symbol stream: (class_key, symbol, extra_value, extra_bits)
    stream: list[tuple[tuple[int, int], int, int, int]] = []
    preds = [0] * len(comps)
    block_idx = [0] * len(comps)
    n_rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            stream.append(((-1, -1), 0xD0 + (n_rst % 8), 0, 0))  # RST sentinel
            n_rst += 1
            preds = [0] * len(comps)
        for ci, (_cid, ch, cv, _tq, _p) in enumerate(comps):
            tid = 0 if ci == 0 else 1  # luma tables / chroma tables
            for _ in range(ch * cv):
                _mcu, zz = per_comp[ci][block_idx[ci]]
                block_idx[ci] += 1
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s = _category(diff)
                extra = diff if diff >= 0 else diff + (1 << s) - 1
                stream.append(((0, tid), s, extra, s))
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        stream.append(((1, tid), 0xF0, 0, 0))
                        run -= 16
                    v = int(zz[i])
                    s = _category(v)
                    extra = v if v >= 0 else v + (1 << s) - 1
                    stream.append(((1, tid), (run << 4) | s, extra, s))
                    run = 0
                if last_nz < 63:
                    stream.append(((1, tid), 0x00, 0, 0))  # EOB

    # fixed-length Huffman tables over the symbols actually used
    used: dict[tuple[int, int], set[int]] = {}
    for key, sym, _e, _n in stream:
        if key != (-1, -1):
            used.setdefault(key, set()).add(sym)
    tables = {key: _fixed_table(syms) for key, syms in used.items()}

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    qbytes = bytes(int(q) for q in qtab)
    seg(0xDB, b"\x00" + qbytes)  # Pq=0, Tq=0 shared by all components
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(comps))
    for cid, ch, cv, tq, _p in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    seg(0xC0, sof)
    for (tc, th), (counts, vals, _enc) in sorted(tables.items()):
        seg(0xC4, bytes([(tc << 4) | th] + counts + vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci, (cid, _ch, _cv, _tq, _p) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al — fixed for baseline
    seg(0xDA, sos)

    w = _BitWriter()
    for key, sym, extra, nbits in stream:
        if key == (-1, -1):  # restart marker: byte-align, emit raw
            w.flush()
            w.out.extend(bytes([0xFF, sym]))
            continue
        code, length = tables[key][2][sym]
        w.write(code, length)
        if nbits:
            w.write(extra, nbits)
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
