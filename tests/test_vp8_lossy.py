"""Lossy-WebP (VP8 keyframe, RFC 6386) decoder: a lib-free embedded
fixture with pinned Y/U/V output, a ctypes differential fuzz against
the REAL libwebp when the host ships it (simple API across qualities /
shapes, plus advanced-config streams: simple loop filter, sharpness,
multiple token partitions, segment counts, quality extremes), the
container dispatch (decode_webp now routes ``VP8 `` chunks), catalog
dimensions, and the Spark mapInPandas wiring.

Reference parity note: the reference repo ships no codecs (its PDF path
shells out to PyMuPDF - processors/pdf_processor.py); the multimodal
tier including this decoder is rebuild-only surface."""

from __future__ import annotations

import ctypes
import hashlib
import random
import struct

import pytest

from agenticknowledgegraphconstructionsystem_spark.functions.vp8 import (
    decode_vp8,
    decode_vp8_rgb,
)
from agenticknowledgegraphconstructionsystem_spark.functions.vp8l import (
    decode_webp,
    webp_dimensions,
)

# libwebp's own encoder output for a 16x16 RGB gradient at quality 50
# (captured once; the decode is pinned below, so this test needs no
# codec library at runtime).
FIXTURE_WEBP = (
    b"RIFFD\x00\x00\x00WEBPVP8 8\x00\x00\x00\xf0\x01\x00\x9d\x01*\x10\x00"
    b"\x10\x00\x02\xc0L%\xb0\x02\xb0\x01\x0f\x0b\xfb\xcb\xd5\x00\x00\xfe"
    b"\xf8\x94\xe7N\x97\x00<\xdd5\xf4\x1b\x9b\xecUU\x10\x7f\x18\xab\xfc"
    b"\xc3\xa7\xff\xf6\xcdn\x93\xa0\x00\x00"
)
FIXTURE_YUV_SHA = "b657dcd3d8409ecac1d868d88e755ac5d98d744212397427aea26401afcb6337"


def _vp8_chunk(payload: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"VP8 ":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def test_embedded_fixture_pinned():
    w, h, y, u, v = decode_vp8(_vp8_chunk(FIXTURE_WEBP))
    assert (w, h) == (16, 16)
    assert len(y) == 256 and len(u) == len(v) == 64
    assert hashlib.sha256(y + u + v).hexdigest() == FIXTURE_YUV_SHA
    assert list(y[:8]) == [20, 24, 30, 33, 36, 40, 46, 52]
    assert list(y[-8:]) == [200, 205, 210, 214, 219, 224, 230, 234]
    assert list(u[:4]) == [128, 128, 130, 131]
    assert list(v[:4]) == [128, 142, 161, 175]


def test_container_dispatch_and_dimensions():
    w, h, rows = decode_webp(FIXTURE_WEBP)
    assert (w, h) == (16, 16) and len(rows) == 16 and len(rows[0]) == 16
    # gradient: top-left dark, bottom-right bright in every channel
    assert sum(rows[0][0]) < sum(rows[15][15])
    assert webp_dimensions(FIXTURE_WEBP) == (16, 16)
    # RGB twin goes through the documented BT.601 fixed-point conversion
    rw, rh, rgb_rows = decode_vp8_rgb(_vp8_chunk(FIXTURE_WEBP))
    assert (rw, rh) == (16, 16) and rgb_rows == rows


def test_truncated_and_interframe_raise():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00\x00\x00")
    chunk = bytearray(_vp8_chunk(FIXTURE_WEBP))
    chunk[0] |= 1  # keyframe bit inverted -> inter frame
    with pytest.raises(NotImplementedError, match="inter"):
        decode_vp8(bytes(chunk))
    bad = bytearray(_vp8_chunk(FIXTURE_WEBP))
    bad[3] = 0x00  # start code
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(bad))


# ---------------------------------------------------------------------------
# differential fuzz vs the host libwebp
# ---------------------------------------------------------------------------


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _ref_yuv(lib, payload: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert y
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, chh = (W + 1) >> 1, (H + 1) >> 1
    grab = lambda p, st, ww, hh: b"".join(
        ctypes.string_at(ctypes.byref(p.contents, r * st), ww) for r in range(hh)
    )
    return W, H, grab(y, S, W, H), grab(u, US, cw, chh), grab(v, US, cw, chh)


def _gradient(w, h):
    return bytes(
        v for y in range(h) for x in range(w)
        for v in ((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
                  ((x + y) * 255) // max(w + h - 2, 1))
    )


def _noisy(w, h, seed):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(w * h * 3))


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not on this host")
def test_differential_fuzz_simple_api():
    """Real-encoder coverage: libwebp picks modes, segment quantizers,
    skip flags and filter levels on its own; our decoder must reproduce
    libwebp's final (loop-filtered) Y/U/V planes pixel-exactly."""
    lib = _libwebp()

    def enc(rgb, w, h, q):
        out = ctypes.c_char_p()
        n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
        assert n > 0
        return ctypes.string_at(out, n)

    for w, h in [(16, 16), (8, 8), (33, 17), (64, 48)]:
        for q in (20.0, 50.0, 80.0, 95.0):
            for img in (_gradient(w, h), _noisy(w, h, w * h + int(q))):
                payload = enc(img, w, h, q)
                ref = _ref_yuv(lib, payload)
                mine = decode_vp8(_vp8_chunk(payload))
                assert mine == ref, f"{w}x{h} q{q} diverged"


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class _WebPPicture(ctypes.Structure):
    pass


_WRITER = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
    ctypes.POINTER(_WebPPicture),
)

_WebPPicture._fields_ = [
    ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
    ("width", ctypes.c_int), ("height", ctypes.c_int),
    ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
    ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
    ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
    ("pad1", ctypes.c_uint32 * 2),
    ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
    ("pad2", ctypes.c_uint32 * 3),
    ("writer", _WRITER), ("custom_ptr", ctypes.c_void_p),
    ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
    ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
    ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
    ("pad3", ctypes.c_uint32 * 3),
    ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
    ("pad6", ctypes.c_uint32 * 8),
    ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
    ("pad7", ctypes.c_void_p * 2),
]


class _MemWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32 * 1)]


_ENC_ABI = 0x020F


def _encode_cfg(lib, rgb, w, h, **knobs):
    cfg = _WebPConfig()
    q = ctypes.c_float(knobs.pop("quality", 75.0))
    lib.WebPConfigInitInternal.argtypes = [
        ctypes.POINTER(_WebPConfig), ctypes.c_int, ctypes.c_float, ctypes.c_int,
    ]
    if not lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, q, _ENC_ABI):
        pytest.skip("libwebp encoder ABI mismatch")
    for k, v in knobs.items():
        setattr(cfg, k, v)
    assert lib.WebPValidateConfig(ctypes.byref(cfg))
    pic = _WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), _ENC_ABI)
    pic.width, pic.height = w, h
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3)
    wr = _MemWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, _WRITER)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    assert lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic)), pic.error_code
    out = ctypes.string_at(wr.mem, wr.size)
    lib.WebPPictureFree(ctypes.byref(pic))
    lib.WebPMemoryWriterClear(ctypes.byref(wr))
    return out


@pytest.mark.slow
@pytest.mark.skipif(_libwebp() is None, reason="libwebp not on this host")
def test_differential_fuzz_advanced_config():
    """Explicit encoder knobs reach the decoder paths the default config
    never emits: the SIMPLE loop filter, nonzero sharpness, 4/8 token
    partitions, 1-2 segments, quality extremes, disabled filtering."""
    lib = _libwebp()
    cases = [
        {"filter_type": 0},
        {"filter_type": 0, "filter_strength": 100},
        {"filter_sharpness": 3},
        {"filter_sharpness": 7, "filter_strength": 80},
        {"partitions": 2},
        {"partitions": 3},
        {"segments": 1},
        {"segments": 2, "quality": 30.0},
        {"quality": 0.0},
        {"quality": 100.0},
        {"filter_strength": 0},
        {"sns_strength": 100},
    ]
    for w, h in [(16, 16), (48, 32)]:
        for img in (_gradient(w, h), _noisy(w, h, w + h)):
            for knobs in cases:
                payload = _encode_cfg(lib, img, w, h, **dict(knobs))
                ref = _ref_yuv(lib, payload)
                mine = decode_vp8(_vp8_chunk(payload))
                assert mine == ref, f"{w}x{h} {knobs} diverged"


def test_lossy_through_decode_images_mapinpandas(spark):
    """Spark wiring: a lossy payload rides decode_images (fake=False)
    through mapInPandas and lands real channel means."""
    from pyspark.sql import Row

    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        decode_images,
    )

    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", mime="image/webp",
             payload=FIXTURE_WEBP, meta="{}")]
    )
    row = decode_images(media, dim=16, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (16, 16)
    # gradient image: every channel mean well inside (0, 1)
    assert 0.2 < row["features"][0] < 0.8
