"""Differential harness: our RFC 6386 VP8 keyframe decoder vs the host
libwebp, on payloads produced by libwebp's own lossy encoder.  Compares
the final (loop-filtered) Y/U/V planes pixel-exactly."""
from __future__ import annotations

import ctypes
import random
import struct
import sys

sys.path.insert(0, "/root/repo")
from agenticknowledgegraphconstructionsystem_spark.functions.vp8 import decode_vp8  # noqa: E402

lib = ctypes.CDLL("libwebp.so.7")
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


def encode(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.c_char_p()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    return ctypes.string_at(out, n)


def vp8_chunk(payload: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"VP8 ":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def ref_yuv(payload: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(payload, len(payload), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, chh = (W + 1) >> 1, (H + 1) >> 1
    ybuf = bytes(b"".join(ctypes.string_at(ctypes.byref(y.contents, r * S), W) for r in range(H)))
    ubuf = bytes(b"".join(ctypes.string_at(ctypes.byref(u.contents, r * US), cw) for r in range(chh)))
    vbuf = bytes(b"".join(ctypes.string_at(ctypes.byref(v.contents, r * US), cw) for r in range(chh)))
    return W, H, ybuf, ubuf, vbuf


def gradient(w, h):
    return bytes(
        v for y in range(h) for x in range(w)
        for v in ((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
                  ((x + y) * 255) // max(w + h - 2, 1))
    )


def noisy(w, h, seed):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(w * h * 3))


def blocky(w, h, seed):
    rnd = random.Random(seed)
    cols = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256)) for _ in range(8)]
    return bytes(v for y in range(h) for x in range(w) for v in cols[((x // 8) + (y // 8)) % 8])


def main():
    fails = 0
    cases = []
    for w, h in [(16, 16), (8, 8), (33, 17), (64, 48), (130, 70)]:
        for q in (20.0, 50.0, 80.0, 95.0):
            cases.append((gradient(w, h), w, h, q, "grad"))
            cases.append((noisy(w, h, w * h + int(q)), w, h, q, "noise"))
            cases.append((blocky(w, h, int(q)), w, h, q, "block"))
    for i, (rgb, w, h, q, kind) in enumerate(cases):
        payload = encode(rgb, w, h, q)
        ref = ref_yuv(payload)
        try:
            mine = decode_vp8(vp8_chunk(payload))
        except Exception as e:  # noqa: BLE001
            print(f"case {i} {kind} {w}x{h} q{q}: EXC {type(e).__name__}: {e}")
            fails += 1
            continue
        if mine == ref:
            print(f"case {i} {kind} {w}x{h} q{q}: OK")
        else:
            fails += 1
            tags = []
            for name, a, b in (("Y", mine[2], ref[2]), ("U", mine[3], ref[3]), ("V", mine[4], ref[4])):
                if a != b:
                    nd = sum(1 for x, yv in zip(a, b) if x != yv)
                    first = next(k for k, (x, yv) in enumerate(zip(a, b)) if x != yv)
                    tags.append(f"{name}:{nd}/{len(a)} first@{first}")
            print(f"case {i} {kind} {w}x{h} q{q}: DIFF {' '.join(tags)}")
    print("FAILS:", fails, "/", len(cases))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
