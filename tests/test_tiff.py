"""Baseline TIFF codec (functions/tiff.py): TIFF-variant LZW (MSB-first
+ EARLY width change, the two deltas vs GIF LZW) and PackBits
roundtrips, container roundtrips across both byte orders / every
supported compression / strip splits / photometrics, honest raises for
beyond-baseline features, a ctypes differential in BOTH directions
against the REAL libtiff when the host ships it (via temp files —
TIFFReadRGBAImageOriented and TIFFWriteScanline), and the Spark
mapInPandas wiring."""

from __future__ import annotations

import ctypes
import os
import random

import pytest

from agenticknowledgegraphconstructionsystem_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_dimensions,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def _rand_rows(w, h, seed):
    rng = random.Random(seed)
    return [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
         for _ in range(w)]
        for _ in range(h)
    ]


# ---------------------------------------------------------------------------
# LZW + PackBits cores
# ---------------------------------------------------------------------------


def test_tiff_lzw_roundtrip_and_reclear():
    random.seed(41)
    for n in (1, 2, 509, 5000, 60_000):  # 60k random -> multiple re-Clears
        data = bytes(random.randrange(256) for _ in range(n))
        assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data
    run = bytes([9]) * 60_000  # KwKwK chains + re-Clear
    assert tiff_lzw_decode(tiff_lzw_encode(run), len(run)) == run


def test_tiff_lzw_is_msb_first_with_early_change():
    """A hand-pinned stream: Clear(256), literal 0, EOI(257) pack
    MSB-first as 100000000|000000000|100000001 + pad → bytes
    10000000 00000000 00100000 00100000 = 80 00 20 20 — a byte
    layout a GIF-style LSB packer cannot produce."""
    enc = tiff_lzw_encode(b"\x00")
    assert enc == bytes([0x80, 0x00, 0x20, 0x20])
    assert tiff_lzw_decode(enc, 1) == b"\x00"
    # early change: 253 learned strings put the table at 510; the
    # ENCODER must widen one code early or the decoder misreads the
    # 511th-table-entry stream — the roundtrip at exactly that boundary
    random.seed(42)
    data = bytes(random.randrange(256) for _ in range(600))
    assert tiff_lzw_decode(tiff_lzw_encode(data), 600) == data


def test_tiff_lzw_errors():
    with pytest.raises(ValueError, match="truncated"):
        tiff_lzw_decode(b"", 4)
    with pytest.raises(ValueError, match="ended at 0 of 4"):
        # Clear + EOI with no data codes
        tiff_lzw_decode(tiff_lzw_encode(b""), 4)


def test_packbits_roundtrip_and_forms():
    assert packbits_encode(b"") == b""
    assert packbits_decode(b"\xfe\x07", 3) == b"\x07\x07\x07"  # repeat form
    assert packbits_decode(b"\x02abc", 3) == b"abc"  # literal form
    assert packbits_decode(b"\x80\x02abc", 3) == b"abc"  # no-op 128 skipped
    random.seed(43)
    for n in (1, 127, 128, 129, 4000):
        data = bytes(random.randrange(3) for _ in range(n))
        assert packbits_decode(packbits_encode(data), n) == data
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab", 6)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def test_container_roundtrip_matrix():
    rows = _rand_rows(17, 11, 44)
    for comp in (1, 5, 8, 32773):
        for pred in ((1, 2) if comp in (5, 8) else (1,)):
            for be in (False, True):
                t = encode_tiff(rows, compression=comp, predictor=pred,
                                rows_per_strip=4, big_endian=be)
                assert tiff_dimensions(t) == (17, 11)
                assert decode_tiff(t) == (17, 11, rows)


def test_grayscale_and_single_strip():
    rows = [[(v, v, v) for v in r]
            for r in [[10, 200, 31], [7, 0, 255]]]
    t = encode_tiff(rows, compression=5, photometric=1)
    assert decode_tiff(t) == (3, 2, rows)


def test_beyond_baseline_raises_honestly():
    t = bytearray(encode_tiff(_rand_rows(4, 4, 45)))
    # patch Compression (tag 259) to 7 = JPEG-in-TIFF
    i = t.index(bytes([3, 1, 3, 0]))  # 259 LE, type SHORT
    t[i + 8] = 7
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(t))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"II+\x00 bigtiff rejected")
    with pytest.raises(ValueError, match="out of range"):
        decode_tiff(b"II*\x00\xff\xff\xff\xff")


# ---------------------------------------------------------------------------
# Differential vs the real libtiff
# ---------------------------------------------------------------------------


def _libtiff():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    lib.TIFFWriteScanline.restype = ctypes.c_int
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
    ]
    for h in ("TIFFSetErrorHandler", "TIFFSetWarningHandler"):
        fn = getattr(lib, h)
        fn.restype = ctypes.c_void_p
        fn.argtypes = [ctypes.c_void_p]
        fn(None)  # keep expected-failure probes off stderr
    return lib


def _libtiff_rgb(lib, path: str, w: int, h: int):
    tif = lib.TIFFOpen(path.encode(), b"r")
    assert tif, "libtiff refused the file"
    buf = (ctypes.c_uint32 * (w * h))()
    ok = lib.TIFFReadRGBAImageOriented(tif, w, h, buf, 1, 0)  # TOPLEFT
    lib.TIFFClose(tif)
    assert ok == 1, "libtiff decode failed"
    return [
        [((v := buf[y * w + x]) & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF)
         for x in range(w)]
        for y in range(h)
    ]


def _libtiff_write(lib, path: str, rows, comp: int, pred: int | None):
    h, w = len(rows), len(rows[0])
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif
    set_field = lib.TIFFSetField  # varargs: ints promote fine on x86-64
    for tag, val in [(256, w), (257, h), (258, 8), (277, 3), (259, comp),
                     (262, 2), (284, 1), (278, 4)] + (
                     [(317, pred)] if pred else []):
        set_field(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(val))
    for y, r in enumerate(rows):
        buf = (ctypes.c_ubyte * (w * 3))(*[v for px in r for v in px])
        assert lib.TIFFWriteScanline(tif, buf, y, 0) == 1
    lib.TIFFClose(tif)


_CONFIGS = [(1, None), (5, None), (5, 2), (8, 2), (32773, None)]


@pytest.mark.skipif(_libtiff() is None, reason="libtiff not on this host")
def test_differential_our_encoder_to_libtiff(tmp_path):
    """Every compression we write — including LZW streams long enough
    to force the early-change boundary AND a mid-stream re-Clear — must
    decode pixel-exactly in the real libtiff."""
    lib = _libtiff()
    for i, (comp, pred) in enumerate(_CONFIGS):
        rows = _rand_rows(23, 17, 50 + i)
        t = encode_tiff(rows, compression=comp, predictor=pred or 1,
                        rows_per_strip=5)
        p = tmp_path / f"ours_{comp}_{pred}.tif"
        p.write_bytes(t)
        assert _libtiff_rgb(lib, str(p), 23, 17) == rows
    big = _rand_rows(150, 120, 60)  # 54k bytes/strip-run: re-Clear territory
    p = tmp_path / "big_lzw.tif"
    p.write_bytes(encode_tiff(big, compression=5, predictor=2))
    assert _libtiff_rgb(lib, str(p), 150, 120) == big


@pytest.mark.skipif(_libtiff() is None, reason="libtiff not on this host")
def test_differential_libtiff_writer_to_us(tmp_path):
    """The reverse: real libtiff-encoded strips (its own LZW hash
    compressor, horizontal predictor, PackBits and Deflate) decode
    pixel-exactly in ours."""
    lib = _libtiff()
    for i, (comp, pred) in enumerate(_CONFIGS):
        rows = _rand_rows(31, 13, 70 + i)
        p = tmp_path / f"lib_{comp}_{pred}.tif"
        _libtiff_write(lib, str(p), rows, comp, pred)
        payload = p.read_bytes()
        assert decode_tiff(payload) == (31, 13, rows)
        assert tiff_dimensions(payload) == (31, 13)
    big = _rand_rows(150, 120, 80)
    p = tmp_path / "lib_big_lzw.tif"
    _libtiff_write(lib, str(p), big, 5, 2)
    assert decode_tiff(p.read_bytes()) == (150, 120, big)


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------


def test_decode_images_real_tiff_through_mapinpandas(spark):
    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        _bmp_features,
        decode_images,
        media_metadata,
    )

    payloads = {
        1: encode_tiff(_rand_rows(16, 16, 90), compression=5, predictor=2),
        2: encode_tiff(_rand_rows(8, 4, 91), compression=32773,
                       big_endian=True),
    }
    media = spark.createDataFrame(
        [(k, "image", "image/tiff", p, "{}") for k, p in payloads.items()],
        schema="media_id long, kind string, mime string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in
           decode_images(media, dim=8, fake=False).collect()}
    for k, p in payloads.items():
        want = _bmp_features(p, 8)
        assert got[k]["n_bytes"] == want[0]
        assert (got[k]["width"], got[k]["height"]) == (want[1], want[2])
        assert got[k]["features"] == pytest.approx(want[3])
    meta = {r["media_id"]: r for r in media_metadata(media).collect()}
    assert meta[1]["format"] == "tiff"
    assert (meta[1]["width"], meta[1]["height"]) == (16, 16)
    assert meta[2]["format"] == "tiff" and meta[2]["width"] == 8
