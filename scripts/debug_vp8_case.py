"""Drill into one failing VP8 differential case with bypass_filtering."""
from __future__ import annotations

import ctypes
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from diff_vp8 import encode, gradient, noisy, blocky, vp8_chunk  # noqa: E402
from agenticknowledgegraphconstructionsystem_spark.functions.vp8 import decode_vp8  # noqa: E402

lib = ctypes.CDLL("libwebp.so.7")


# Advanced decoder API via WebPDecoderConfig for bypass_filtering.
class WebPDecBuffer(ctypes.Structure):
    _fields_ = [
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("is_external_memory", ctypes.c_int),
        ("u", ctypes.c_uint8 * 80),  # union YUVA/RGBA buffer descriptors
        ("pad", ctypes.c_uint32 * 4),
        ("private_memory", ctypes.c_void_p),
    ]


class WebPBitstreamFeatures(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("has_alpha", ctypes.c_int),
        ("has_animation", ctypes.c_int),
        ("format", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class WebPDecoderOptions(ctypes.Structure):
    _fields_ = [
        ("bypass_filtering", ctypes.c_int),
        ("no_fancy_upsampling", ctypes.c_int),
        ("use_cropping", ctypes.c_int),
        ("crop_left", ctypes.c_int),
        ("crop_top", ctypes.c_int),
        ("crop_width", ctypes.c_int),
        ("crop_height", ctypes.c_int),
        ("use_scaling", ctypes.c_int),
        ("scaled_width", ctypes.c_int),
        ("scaled_height", ctypes.c_int),
        ("use_threads", ctypes.c_int),
        ("dithering_strength", ctypes.c_int),
        ("flip", ctypes.c_int),
        ("alpha_dithering_strength", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class WebPDecoderConfig(ctypes.Structure):
    _fields_ = [
        ("input", WebPBitstreamFeatures),
        ("output", WebPDecBuffer),
        ("options", WebPDecoderOptions),
    ]


# YUVA union layout within WebPDecBuffer.u:
# struct WebPYUVABuffer { uint8_t* y, *u, *v, *a; int y_stride; int u_stride, v_stride, a_stride; size_t y_size, u_size, v_size, a_size; }
class YUVA(ctypes.Structure):
    _fields_ = [
        ("y", ctypes.POINTER(ctypes.c_ubyte)),
        ("u", ctypes.POINTER(ctypes.c_ubyte)),
        ("v", ctypes.POINTER(ctypes.c_ubyte)),
        ("a", ctypes.POINTER(ctypes.c_ubyte)),
        ("y_stride", ctypes.c_int),
        ("u_stride", ctypes.c_int),
        ("v_stride", ctypes.c_int),
        ("a_stride", ctypes.c_int),
        ("y_size", ctypes.c_size_t),
        ("u_size", ctypes.c_size_t),
        ("v_size", ctypes.c_size_t),
        ("a_size", ctypes.c_size_t),
    ]


MODE_YUV = 11  # WEBP_CSP_MODE: MODE_YUV
WEBP_DECODER_ABI_VERSION = 0x0209

lib.WebPInitDecoderConfigInternal.restype = ctypes.c_int
lib.WebPDecode.restype = ctypes.c_int
lib.WebPDecode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(WebPDecoderConfig)]


def ref_yuv_nofilter(payload: bytes, bypass: int):
    cfg = WebPDecoderConfig()
    ok = lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), WEBP_DECODER_ABI_VERSION)
    assert ok, "ABI mismatch"
    cfg.options.bypass_filtering = bypass
    cfg.output.colorspace = MODE_YUV
    r = lib.WebPDecode(payload, len(payload), ctypes.byref(cfg))
    assert r == 0, f"WebPDecode VP8StatusCode={r}"
    yuva = YUVA.from_buffer_copy(bytes(cfg.output.u))
    W, H = cfg.output.width, cfg.output.height
    cw, chh = (W + 1) >> 1, (H + 1) >> 1
    def grab(ptr, stride, w, h):
        return b"".join(ctypes.string_at(ctypes.byref(ptr.contents, r * stride), w) for r in range(h))
    return W, H, grab(yuva.y, yuva.y_stride, W, H), grab(yuva.u, yuva.u_stride, cw, chh), grab(yuva.v, yuva.v_stride, cw, chh)


def dump_plane(name, a, b, w):
    print(f"--- {name} (mine vs ref), width {w}")
    h = len(a) // w
    for r in range(h):
        ra = a[r * w : (r + 1) * w]
        rb = b[r * w : (r + 1) * w]
        mark = "  " if ra == rb else "<<"
        print("mine", " ".join(f"{v:3d}" for v in ra), mark)
        if ra != rb:
            print(" ref", " ".join(f"{v:3d}" for v in rb))


def main():
    kind, w, h, q = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])
    gen = {"grad": lambda: gradient(w, h), "noise": lambda: noisy(w, h, w * h + int(q)), "block": lambda: blocky(w, h, int(q))}[kind]
    payload = encode(gen(), w, h, q)
    chunk = vp8_chunk(payload)
    for bypass in (1, 0):
        ref = ref_yuv_nofilter(payload, bypass)
        mine = decode_vp8(chunk, _loop_filter=not bypass)
        tag = "NOFILTER" if bypass else "FILTERED"
        if mine == ref:
            print(f"{tag}: MATCH")
        else:
            print(f"{tag}: DIFF")
            for name, i, j in (("Y", 2, 2), ("U", 3, 3), ("V", 4, 4)):
                if mine[i] != ref[j]:
                    pw = w if name == "Y" else (w + 1) // 2
                    dump_plane(name, mine[i], ref[j], pw)
            break


if __name__ == "__main__":
    main()
