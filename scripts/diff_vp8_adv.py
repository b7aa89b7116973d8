"""Advanced-API differential: drive libwebp's encoder with explicit
config knobs (filter_type, sharpness, partitions, segments, quality
extremes) and check our VP8 decoder pixel-exactly on every stream."""
from __future__ import annotations

import ctypes
from ctypes import (
    CFUNCTYPE, POINTER, byref, c_float, c_int, c_size_t, c_uint8, c_uint32,
    c_void_p,
)
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from diff_vp8 import gradient, noisy, blocky, vp8_chunk, ref_yuv  # noqa: E402
from agenticknowledgegraphconstructionsystem_spark.functions.vp8 import decode_vp8  # noqa: E402

lib = ctypes.CDLL("libwebp.so.7")
ENC_ABI = 0x020F


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", c_int), ("quality", c_float), ("method", c_int),
        ("image_hint", c_int), ("target_size", c_int), ("target_PSNR", c_float),
        ("segments", c_int), ("sns_strength", c_int), ("filter_strength", c_int),
        ("filter_sharpness", c_int), ("filter_type", c_int), ("autofilter", c_int),
        ("alpha_compression", c_int), ("alpha_filtering", c_int), ("alpha_quality", c_int),
        ("pass_", c_int), ("show_compressed", c_int), ("preprocessing", c_int),
        ("partitions", c_int), ("partition_limit", c_int), ("emulate_jpeg_size", c_int),
        ("thread_level", c_int), ("low_memory", c_int), ("near_lossless", c_int),
        ("exact", c_int), ("use_delta_palette", c_int), ("use_sharp_yuv", c_int),
        ("qmin", c_int), ("qmax", c_int),
    ]


class WebPPicture(ctypes.Structure):
    pass


WRITER = CFUNCTYPE(c_int, POINTER(c_uint8), c_size_t, POINTER(WebPPicture))

WebPPicture._fields_ = [
    ("use_argb", c_int), ("colorspace", c_int), ("width", c_int), ("height", c_int),
    ("y", c_void_p), ("u", c_void_p), ("v", c_void_p),
    ("y_stride", c_int), ("uv_stride", c_int),
    ("a", c_void_p), ("a_stride", c_int),
    ("pad1", c_uint32 * 2),
    ("argb", c_void_p), ("argb_stride", c_int),
    ("pad2", c_uint32 * 3),
    ("writer", WRITER), ("custom_ptr", c_void_p),
    ("extra_info_type", c_int), ("extra_info", c_void_p),
    ("stats", c_void_p),
    ("error_code", c_int),
    ("progress_hook", c_void_p), ("user_data", c_void_p),
    ("pad3", c_uint32 * 3),
    ("pad4", c_void_p), ("pad5", c_void_p),
    ("pad6", c_uint32 * 8),
    ("memory_", c_void_p), ("memory_argb_", c_void_p),
    ("pad7", c_void_p * 2),
]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", c_void_p), ("size", c_size_t), ("max_size", c_size_t),
                ("pad", c_uint32 * 1)]


lib.WebPConfigInitInternal.restype = c_int
lib.WebPConfigInitInternal.argtypes = [POINTER(WebPConfig), c_int, c_float, c_int]
lib.WebPValidateConfig.restype = c_int
lib.WebPPictureInitInternal.restype = c_int
lib.WebPPictureInitInternal.argtypes = [POINTER(WebPPicture), c_int]
lib.WebPPictureImportRGB.restype = c_int
lib.WebPPictureImportRGB.argtypes = [POINTER(WebPPicture), ctypes.c_char_p, c_int]
lib.WebPEncode.restype = c_int
lib.WebPEncode.argtypes = [POINTER(WebPConfig), POINTER(WebPPicture)]


def encode_cfg(rgb: bytes, w: int, h: int, **knobs) -> bytes:
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(byref(cfg), 0, c_float(knobs.pop("quality", 75.0)), ENC_ABI)
    for k, v in knobs.items():
        setattr(cfg, k, v)
    assert lib.WebPValidateConfig(byref(cfg)), f"bad config {knobs}"
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(byref(pic), ENC_ABI)
    pic.width, pic.height = w, h
    assert lib.WebPPictureImportRGB(byref(pic), rgb, w * 3)
    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, WRITER)
    pic.custom_ptr = ctypes.cast(byref(wr), c_void_p)
    ok = lib.WebPEncode(byref(cfg), byref(pic))
    assert ok, f"encode failed: error_code={pic.error_code} knobs={knobs}"
    out = ctypes.string_at(wr.mem, wr.size)
    lib.WebPPictureFree(byref(pic))
    lib.WebPMemoryWriterClear(byref(wr))
    return out


def main():
    fails = 0
    cases = []
    for w, h in [(16, 16), (48, 32), (130, 70)]:
        for img, kind in ((gradient(w, h), "grad"), (noisy(w, h, w + h), "noise"),
                          (blocky(w, h, h), "block")):
            cases.append((img, w, h, {"filter_type": 0}, f"{kind} simple-filter"))
            cases.append((img, w, h, {"filter_type": 0, "filter_strength": 100}, f"{kind} simple-strong"))
            cases.append((img, w, h, {"filter_sharpness": 3}, f"{kind} sharp3"))
            cases.append((img, w, h, {"filter_sharpness": 7, "filter_strength": 80}, f"{kind} sharp7"))
            cases.append((img, w, h, {"partitions": 2}, f"{kind} 4parts"))
            cases.append((img, w, h, {"partitions": 3}, f"{kind} 8parts"))
            cases.append((img, w, h, {"segments": 1}, f"{kind} 1seg"))
            cases.append((img, w, h, {"segments": 2, "quality": 30.0}, f"{kind} 2seg-q30"))
            cases.append((img, w, h, {"quality": 0.0}, f"{kind} q0"))
            cases.append((img, w, h, {"quality": 100.0}, f"{kind} q100"))
            cases.append((img, w, h, {"filter_strength": 0}, f"{kind} nofilter"))
            cases.append((img, w, h, {"autofilter": 1}, f"{kind} autofilter"))
            cases.append((img, w, h, {"method": 0}, f"{kind} method0"))
            cases.append((img, w, h, {"method": 6, "quality": 90.0}, f"{kind} method6"))
            cases.append((img, w, h, {"sns_strength": 100}, f"{kind} sns100"))
    for i, (rgb, w, h, knobs, label) in enumerate(cases):
        payload = encode_cfg(rgb, w, h, **knobs)
        ref = ref_yuv(payload)
        try:
            mine = decode_vp8(vp8_chunk(payload))
        except Exception as e:  # noqa: BLE001
            print(f"case {i} {label} {w}x{h}: EXC {type(e).__name__}: {e}")
            fails += 1
            continue
        if mine != ref:
            fails += 1
            tags = []
            for name, a, b in (("Y", mine[2], ref[2]), ("U", mine[3], ref[3]), ("V", mine[4], ref[4])):
                if a != b:
                    nd = sum(1 for x, yv in zip(a, b) if x != yv)
                    first = next(k for k, (x, yv) in enumerate(zip(a, b)) if x != yv)
                    tags.append(f"{name}:{nd}/{len(a)} first@{first}")
            print(f"case {i} {label} {w}x{h}: DIFF {' '.join(tags)}")
    print("FAILS:", fails, "/", len(cases))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
