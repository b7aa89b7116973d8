"""Lossless-WebP (VP8L) codec: own-encoder roundtrips, hand-built
bitstream fixtures with known pixels (normal prefix codes, repeat-18
code lengths, LZ77 backward references over the 2-D near-distance
table, subtract-green), the near-distance table pinned byte-for-byte
against the constants extracted from libwebp, a ctypes differential
fuzz against the REAL libwebp when the host ships it (real encoder
output exercises predictors / color transforms / palettes / color
cache), and the Spark mapInPandas wiring."""

from __future__ import annotations

import ctypes
import random
import struct

import pytest

from agenticknowledgegraphconstructionsystem_spark.functions.vp8l import (
    _NEAR,
    _BitWriter,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp_lossless,
    webp_dimensions,
)


def _rgb(rows):
    return [[(r, g, b) for r, g, b, _a in row] for row in rows]


def test_own_encoder_roundtrip():
    random.seed(7)
    for w, h, nvals in [(1, 1, 256), (3, 2, 256), (8, 8, 256), (17, 5, 4), (31, 7, 2)]:
        img = [
            [
                (
                    random.randrange(nvals),
                    random.randrange(nvals),
                    random.randrange(nvals),
                    255,
                )
                for _ in range(w)
            ]
            for _ in range(h)
        ]
        dw, dh, rows = decode_vp8l(encode_vp8l(img))
        assert (dw, dh, rows) == (w, h, img)
        cw, ch, crows = decode_webp(encode_webp_lossless(img))
        assert (cw, ch, crows) == (w, h, _rgb(img))
        assert webp_dimensions(encode_webp_lossless(img)) == (w, h)


def test_near_distance_table_matches_libwebp_constants():
    """First/last entries of the generated 120-entry plane-code table,
    pinned against kCodeToPlane as extracted byte-for-byte from
    libwebp.so (offsets packed (y<<4) | (8-x))."""
    assert len(_NEAR) == len(set(_NEAR)) == 120
    assert _NEAR[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    assert _NEAR[-8:] == [
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]


def _simple_single(bw: _BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple code
    bw.write(0, 1)  # one symbol
    if sym < 2:
        bw.write(0, 1)
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


def test_hand_built_subtract_green_stream():
    """2x1, subtract-green transform, every prefix code a zero-bit simple
    code: stored (r', g, b') = (5, 5, 2) must decode to (10, 5, 7) after
    the inverse transform adds green back."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(1, 14)  # w-1
    bw.write(0, 14)  # h-1
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    _simple_single(bw, 5)  # green
    _simple_single(bw, 5)  # red (stored residual)
    _simple_single(bw, 2)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)  # distance (unused but mandatory)
    # zero-bit codes -> no per-pixel data bits at all
    w, h, rows = decode_vp8l(bw.getvalue())
    assert (w, h) == (2, 1)
    assert rows == [[(10, 5, 7, 255), (10, 5, 7, 255)]]


def test_hand_built_lz77_backward_reference():
    """4x1: one literal then a length-3 distance-1 backward reference.
    The green code is a NORMAL code (symbols 0 and 258 at length 1,
    zeros written with repeat-18s), the distance code a single-symbol
    code whose value 1 maps through the near table's (1, 0) entry to
    distance 1 — pinning the LZ77 value coding, the plane-code mapping,
    and code-length-code reading without libwebp."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(3, 14)  # w=4
    bw.write(0, 14)  # h=1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green: normal code, lengths[0]=1, lengths[258]=1, rest 0
    bw.write(0, 1)  # normal
    bw.write(0, 4)  # num_code_lengths = 4 -> order slots 17,18,0,1
    bw.write(0, 3)  # len(17) = 0
    bw.write(1, 3)  # len(18) = 1
    bw.write(0, 3)  # len(0)  = 0
    bw.write(1, 3)  # len(1)  = 1
    bw.write(0, 1)  # no explicit max_symbol
    # canonical over {1:len1, 18:len1}: sym1 -> code 0, sym18 -> code 1
    bw.write_code(0, 1)  # length 1 for green symbol 0
    bw.write_code(1, 1)  # 18: repeat zero
    bw.write(127, 7)  # 11+127 = 138 zeros (i=139)
    bw.write_code(1, 1)
    bw.write(108, 7)  # 119 zeros (i=258)
    bw.write_code(0, 1)  # length 1 for green symbol 258
    bw.write_code(1, 1)
    bw.write(10, 7)  # 21 zeros (i=280, done)
    _simple_single(bw, 9)  # red
    _simple_single(bw, 3)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 1)  # distance: value 2 -> plane code 2 -> (1,0) -> 1
    # data: green sym 0 (literal, code 0) then green sym 258 (code 1):
    # length code 2 -> 3, distance zero-bit
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    w, h, rows = decode_vp8l(bw.getvalue())
    assert (w, h) == (4, 1)
    assert rows == [[(9, 0, 3, 255)] * 4]


def test_animated_and_garbage_raise():
    # Lossy VP8 now decodes (tests/test_vp8_lossy.py) - an EMPTY VP8
    # chunk is a truncation error, not an honest-raise.
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="too short"):
        decode_webp(lossy)
    anim = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"ANIM" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(anim)
    with pytest.raises(ValueError):
        decode_webp(b"not a webp")


def test_vp8x_canvas_dimensions():
    """Extended-format header: the catalog must read the VP8X 24-bit
    canvas size without decoding (and the chunk walk must keep looking
    past VP8X for the VP8L payload)."""
    body = b"\x00" + b"\x00\x00\x00" + struct.pack("<I", 639)[:3] + struct.pack("<I", 359)[:3]
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_dimensions(payload) == (640, 360)


def test_probe_image_dims_webp():
    from agenticknowledgegraphconstructionsystem_spark.functions.mediameta import (
        probe_image_dims,
    )

    img = [[(1, 2, 3, 255)] * 5] * 3
    assert probe_image_dims(encode_webp_lossless(img)) == ("webp", 5, 3)


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _vp8l_chunk(payload: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"VP8L":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8L chunk")


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not on this host")
def test_differential_fuzz_against_libwebp():
    """REAL-encoder coverage: libwebp's lossless encoder picks transforms
    (predictors, color transform, palette), color cache and 2-D LZ77 on
    its own; our decoder must reproduce libwebp's decoder pixel-exactly
    on every payload."""
    lib = _libwebp()
    random.seed(42)

    def enc(rgba: bytes, w: int, h: int) -> bytes:
        out = ctypes.c_char_p()
        n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
        assert n > 0
        return ctypes.string_at(out, n)

    def ref_dec(payload: bytes) -> tuple[int, int, bytes]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lib.WebPDecodeRGBA(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
        assert p
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)

    cases = []
    for w, h in [(1, 1), (7, 3), (16, 16), (33, 9)]:
        cases.append(
            bytes(
                v
                for y in range(h)
                for x in range(w)
                for v in (
                    (x * 255) // max(w - 1, 1),
                    (y * 255) // max(h - 1, 1),
                    ((x + y) * 255) // max(w + h - 2, 1),
                    255,
                )
            )
        )
        pal = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255), (9, 8, 7, 255)]
        cases.append(
            bytes(v for y in range(h) for x in range(w) for v in pal[(x * 7 + y * 3) % 4])
        )
        cases.append(bytes(random.randrange(256) for _ in range(w * h * 4)))
        tile = bytes(random.randrange(256) for _ in range(16))
        cases.append((tile * (w * h // 4 + 1))[: w * h * 4])
        sizes = [(1, 1), (7, 3), (16, 16), (33, 9)]
    for i, rgba in enumerate(cases):
        w, h = sizes[i // 4]
        payload = enc(rgba, w, h)
        lw, lh, ref = ref_dec(payload)
        mw, mh, rows = decode_vp8l(_vp8l_chunk(payload))
        mine = bytes(v for row in rows for (r, g, b, a) in row for v in (r, g, b, a))
        assert (mw, mh) == (lw, lh) == (w, h)
        assert mine == ref, f"pixel divergence vs libwebp on case {i}"


def test_webp_resize_roundtrips_same_container(spark):
    from pyspark.sql import Row

    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        resize_images,
    )

    img = [
        [((x * 50) % 256, (y * 80) % 256, 7, 255) for x in range(8)]
        for y in range(8)
    ]
    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", mime="image/webp",
             payload=encode_webp_lossless(img), meta="{}")]
    )
    out = resize_images(media, width=4, height=4, fake=False).collect()[0]
    w, h, rows = decode_webp(bytes(out["payload"]))
    assert (w, h) == (4, 4)
    # nearest-neighbor: output (x,y) samples input (x*8//4, y*8//4)
    assert rows[1][2] == tuple(img[2][4][:3])


def test_webp_through_decode_images_mapinpandas(spark):
    """Spark wiring: a lossless-WebP payload rides decode_images
    (fake=False) through mapInPandas and lands real channel means."""
    from pyspark.sql import Row

    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        decode_images,
    )

    img = [[(255, 0, 0, 255)] * 4] * 4  # solid red
    payload = encode_webp_lossless(img)
    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", mime="image/webp", payload=payload, meta="{}")]
    )
    row = decode_images(media, dim=4, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    assert row["features"][0] == pytest.approx(1.0)  # red mean
    assert row["features"][1] == pytest.approx(0.0)
