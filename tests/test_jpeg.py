"""Baseline JPEG codec (functions/jpeg.py) + its multimodal wiring.

Ground truth comes from three independent directions: a hand-assembled
byte stream whose pixel values follow analytically from the T.81 IDCT
definition (no codec code involved in constructing it), an IDCT
re-implemented from the standard's formula here in the test, and
encoder→decoder roundtrips with known tolerance envelopes."""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pytest

from agenticknowledgegraphconstructionsystem_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _handmade_gray_jpeg(scan_bits: str, quant: int = 1) -> bytes:
    """Assemble an 8×8 grayscale baseline JPEG byte-by-byte in the test
    (independent of encode_jpeg): quant table all ``quant``, DC Huffman
    table = {category c: code '0'+bin(c)... } — one 4-bit code per
    category 0..11, AC table = {EOB: '0', (0,1): '10'}."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, b"\x00" + bytes([quant] * 64))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table 0: categories 0..11 as fixed 4-bit codes 0..11
    seg(0xC4, bytes([0x00] + [0, 0, 0, 12] + [0] * 12 + list(range(12))))
    # AC table 0: EOB ('0', len 1) and run0/size1 ('10', len 2)
    seg(0xC4, bytes([0x10] + [1, 1] + [0] * 14 + [0x00, 0x01]))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = scan_bits + "1" * (-len(scan_bits) % 8)
    out.extend(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out.extend(b"\xff\xd9")
    return bytes(out)


def _idct_ref(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT, written directly from the formula (independent
    of the codec's matrix form)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y, x] = s / 4 + 128
    return out


def test_handmade_dc_only_block_is_analytically_exact():
    """DC coefficient 64 (quant 1) → every pixel exactly 64/8+128 = 136.
    Scan: DC category 7 (code 0111) + 7 magnitude bits 1000000 + EOB."""
    w, h, rows = decode_jpeg(_handmade_gray_jpeg("0111" + "1000000" + "0"))
    assert (w, h) == (8, 8)
    assert all(px == (136, 136, 136) for row in rows for px in row)


def test_handmade_ac_coefficient_matches_reference_idct():
    """DC 0 (category 0: code 0000) then AC (run 0, size 1) value 1 at
    zig-zag index 1 = coefficient (0,1), then EOB — compare against the
    from-the-formula IDCT with quant 32 amplifying the coefficient."""
    q = 32
    w, h, rows = decode_jpeg(_handmade_gray_jpeg("0000" + "10" + "1" + "0", quant=q))
    coef = np.zeros((8, 8))
    coef[ZIGZAG[1]] = 1 * q
    want = np.clip(np.round(_idct_ref(coef)), 0, 255).astype(int)
    got = np.array([[px[0] for px in row] for row in rows])
    assert np.array_equal(got, want)


def test_flat_color_roundtrip_exact():
    rows = [[(120, 64, 200)] * 16 for _ in range(8)]
    w, h, out = decode_jpeg(encode_jpeg(rows))
    assert (w, h) == (16, 8)
    assert all(px == (120, 64, 200) for row in out for px in row)


def test_random_rgb_roundtrip_within_quantization_envelope():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 16, 3))
    rows = [[tuple(int(v) for v in px) for px in r] for r in img]
    w, h, out = decode_jpeg(encode_jpeg(rows, quant=1))
    assert (w, h) == (16, 24)
    assert np.abs(np.array(out, dtype=int) - img).max() <= 3
    # coarser quant table → still decodes, bounded-degradation
    _, _, out8 = decode_jpeg(encode_jpeg(rows, quant=8))
    assert np.abs(np.array(out8, dtype=int) - img).max() <= 24


def test_420_subsampling_roundtrip():
    """4:2:0: chroma-constant data survives mean-pool + replication
    nearly exactly; dimensions not multiples of 16 exercise padding."""
    rng = np.random.RandomState(11)
    v = rng.randint(0, 256, (20, 12))
    img = np.stack([v, v, v], axis=-1)  # r=g=b → Cb=Cr=128 everywhere
    rows = [[tuple(int(x) for x in px) for px in r] for r in img]
    w, h, out = decode_jpeg(encode_jpeg(rows, chroma_subsample=2))
    assert (w, h) == (12, 20)
    assert np.abs(np.array(out, dtype=int) - img).max() <= 1


def test_grayscale_and_restart_markers():
    g = [[((x * 10 + y) % 256,) * 3 for x in range(10)] for y in range(9)]
    w, h, out = decode_jpeg(encode_jpeg(g, grayscale=True))
    assert (w, h) == (10, 9)
    assert np.abs(np.array(out, dtype=int) - np.array(g)).max() <= 1
    # restart markers (DRI=1: RSTn between every MCU) decode identically
    rows = [[(5 * x, 10 * y, 40) for x in range(32)] for y in range(16)]
    base = decode_jpeg(encode_jpeg(rows))
    rst = decode_jpeg(encode_jpeg(rows, restart_interval=1))
    assert base == rst


def test_unsupported_frames_raise_honestly():
    rows = [[(0, 0, 0)] * 8 for _ in range(8)]
    payload = bytearray(encode_jpeg(rows, grayscale=True))
    i = payload.index(bytes([0xFF, 0xC0]))
    payload[i + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(payload))
    payload[i + 1] = 0xC9  # SOF9 (arithmetic-coded sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


@pytest.mark.parametrize(
    "kw,shape",
    [
        (dict(grayscale=True), (9, 10)),
        (dict(), (24, 16)),
        (dict(chroma_subsample=2), (20, 12)),
        (dict(restart_interval=2), (16, 32)),
        (dict(quant=16), (40, 40)),
    ],
    ids=["gray", "444", "420", "rst", "coarse"],
)
def test_progressive_decodes_same_pixels_as_baseline(kw, shape):
    """A progressive encoding carries the SAME quantized coefficients as
    the baseline encoding, just reordered across scans — so decoding
    both must give byte-identical pixels.  Covers DC first+refine, split
    spectral AC bands, AC refinement with buffered correction bits,
    cross-block EOB runs (coarse quant → many all-zero bands), and
    per-scan restart markers."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, shape + (3,))
    rows = [[tuple(int(v) for v in px) for px in r] for r in img]
    base = decode_jpeg(encode_jpeg(rows, **kw))
    prog = decode_jpeg(encode_jpeg(rows, progressive=True, **kw))
    assert prog == base


def _handmade_progressive_jpeg(quant: int) -> bytes:
    """Hand-assemble a 16×8 grayscale PROGRESSIVE JPEG (two blocks A, B)
    byte-by-byte, independent of encode_jpeg: four scans exercising DC
    first (Al=1), AC first with an EOB run that skips block B, DC
    refinement bits, and AC refinement with an EOB run carrying a
    correction bit.  Final coefficients: A has DC=6 and coefficient 2 at
    zig-zag index 1; B has DC=-3 (× quant)."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    def scan(header, bits):
        seg(0xDA, header)
        padded = bits + "1" * (-len(bits) % 8)
        out.extend(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8))

    seg(0xDB, b"\x00" + bytes([quant] * 64))
    seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    # DC table 0: categories 0..11 as fixed 4-bit codes 0..11
    seg(0xC4, bytes([0x00] + [0, 0, 0, 12] + [0] * 12 + list(range(12))))
    # AC table 0: (0,1) → '00', EOB1 (0x10) → '01'
    seg(0xC4, bytes([0x10] + [0, 2] + [0] * 14 + [0x01, 0x10]))
    # scan 1 — DC first, Al=1: A diff 3 (cat 2 '0010' + '11'),
    # B diff -5 (cat 3 '0011' + '010') → DCs 3<<1=6, (3-5)<<1=-4
    scan(bytes([1, 1, 0x00, 0, 0, 0x01]), "0010" + "11" + "0011" + "010")
    # scan 2 — AC first 1..63, Al=1: A: (run0,size1) '00' + value '1'
    # (→ coef 1<<1 = 2 at zz 1), then EOB run '01' + 1 extra bit '0'
    # (eobrun = 2^1-1+0 = 1 → block B skipped entirely)
    scan(bytes([1, 1, 0x00, 1, 63, 0x01]), "00" + "1" + "01" + "0")
    # scan 3 — DC refinement to Al=0: raw bits 6&1=0 for A, then 1 for B
    # (-4 | 1 = -3)
    scan(bytes([1, 1, 0x00, 0, 0, 0x10]), "0" + "1")
    # scan 4 — AC refinement 1..63 to Al=0: EOB run of 2 ('01' + extra
    # '0' → eobrun = 2^1+0 = 2 covers both blocks) followed by the
    # correction bit '0' for A's nonzero-history coefficient (2 stays 2)
    scan(bytes([1, 1, 0x00, 1, 63, 0x10]), "01" + "0" + "0")
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_handmade_progressive_matches_reference_idct():
    """Decoder-only ground truth for the progressive path: the
    hand-assembled four-scan stream must reconstruct exactly the pixels
    the from-the-formula IDCT gives for its known final coefficients."""
    q = 16
    w, h, rows = decode_jpeg(_handmade_progressive_jpeg(q))
    assert (w, h) == (16, 8)
    coef_a = np.zeros((8, 8))
    coef_a[0, 0] = 6 * q
    coef_a[ZIGZAG[1]] = 2 * q
    coef_b = np.zeros((8, 8))
    coef_b[0, 0] = -3 * q
    want = np.concatenate(
        [
            np.clip(np.round(_idct_ref(coef_a)), 0, 255),
            np.clip(np.round(_idct_ref(coef_b)), 0, 255),
        ],
        axis=1,
    ).astype(int)
    got = np.array([[px[0] for px in row] for row in rows])
    assert np.array_equal(got, want)


_MINI_DJPEG_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int main(void) {
  size_t cap = 1 << 20, n = 0, r;
  unsigned char *buf = malloc(cap);
  while ((r = fread(buf + n, 1, cap - n, stdin)) > 0) {
    n += r;
    if (n == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_FLOAT;
  cinfo.do_fancy_upsampling = FALSE; /* sample replication, like ours */
  jpeg_start_decompress(&cinfo);
  printf("P6\n%u %u\n255\n", cinfo.output_width, cinfo.output_height);
  JSAMPROW row = malloc((size_t)cinfo.output_width * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &row, 1);
    fwrite(row, 3, cinfo.output_width, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
"""


@pytest.fixture(scope="session")
def mini_djpeg(tmp_path_factory):
    """Compile a 30-line libjpeg decoder as an independent differential
    oracle (subprocess-contained: libjpeg's default error path exits).
    Skips when the host lacks gcc or jpeglib.h."""
    import shutil
    import subprocess

    if shutil.which("gcc") is None or not os.path.exists("/usr/include/jpeglib.h"):
        pytest.skip("no gcc/jpeglib on this host")
    d = tmp_path_factory.mktemp("jpegdiff")
    src = d / "mini_djpeg.c"
    src.write_text(_MINI_DJPEG_C)
    exe = d / "mini_djpeg"
    subprocess.run(
        ["gcc", "-O2", "-o", str(exe), str(src), "-ljpeg"], check=True
    )

    def run(payload: bytes) -> np.ndarray:
        out = subprocess.run(
            [str(exe)], input=payload, capture_output=True, check=True
        ).stdout
        assert out[:2] == b"P6"
        head, dims, maxv, body = out.split(b"\n", 3)
        w, h = map(int, dims.split())
        return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3).astype(int)

    return run


@pytest.mark.parametrize(
    "kw,shape",
    [
        (dict(grayscale=True), (9, 10)),
        (dict(), (24, 16)),
        (dict(chroma_subsample=2), (20, 12)),
        (dict(restart_interval=2), (16, 32)),
        (dict(quant=16), (40, 40)),
    ],
    ids=["gray", "444", "420", "rst", "coarse"],
)
def test_differential_vs_libjpeg(mini_djpeg, kw, shape):
    """libjpeg as an independent oracle for BOTH encoders and the
    decoder: (1) libjpeg accepts our baseline and progressive streams
    and decodes them to IDENTICAL pixels (the two encodings carry the
    same coefficients — any scan-script bug would desync its entropy
    decoder, not just perturb pixels); (2) our decoder matches libjpeg
    within the known IDCT/color-convert rounding envelope (float DCT,
    fixed-point YCbCr: ±2)."""
    rng = np.random.RandomState(1234)
    img = rng.randint(0, 256, shape + (3,))
    if kw.get("grayscale"):
        img[..., 1] = img[..., 0]
        img[..., 2] = img[..., 0]
    rows = [[tuple(int(v) for v in px) for px in r] for r in img]
    jb = encode_jpeg(rows, **kw)
    jp = encode_jpeg(rows, progressive=True, **kw)
    lib_b, lib_p = mini_djpeg(jb), mini_djpeg(jp)
    assert np.array_equal(lib_b, lib_p)
    ours = np.array(decode_jpeg(jb)[2], dtype=int)
    assert np.abs(ours - lib_b).max() <= 2
    assert np.array_equal(ours, np.array(decode_jpeg(jp)[2], dtype=int))


def test_decode_images_real_jpeg_through_mapinpandas(spark):
    """The Spark wiring: JPEG payloads through decode_images(fake=False)
    and resize_images(fake=False) — features match the direct pixel
    arithmetic, resized payloads are themselves decodable JPEGs."""
    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        _bmp_features,
        decode_image_any,
        decode_images,
        resize_images,
    )

    rng = np.random.RandomState(3)
    imgs = {
        1: rng.randint(0, 256, (16, 16, 3)),
        2: rng.randint(0, 256, (8, 24, 3)),
    }
    payloads = {
        k: encode_jpeg([[tuple(int(x) for x in px) for px in r] for r in v])
        for k, v in imgs.items()
    }
    media = spark.createDataFrame(
        [(k, "image", "image/jpeg", p, "{}") for k, p in payloads.items()],
        schema="media_id long, kind string, mime string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in decode_images(media, dim=8, fake=False).collect()}
    for k, p in payloads.items():
        want = _bmp_features(p, 8)
        assert got[k]["n_bytes"] == want[0]
        assert (got[k]["width"], got[k]["height"]) == (want[1], want[2])
        assert got[k]["features"] == pytest.approx(want[3])

    small = {
        r["media_id"]: r for r in resize_images(media, 8, 8, fake=False).collect()
    }
    for k in payloads:
        w, h, rows = decode_image_any(bytes(small[k]["payload"]))
        assert (w, h) == (8, 8) and bytes(small[k]["payload"])[:3] == b"\xff\xd8\xff"
