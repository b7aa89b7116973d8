#!/usr/bin/env python3
"""Extract the VP8 (lossy WebP) constant tables from the host libwebp.so
and emit agenticknowledgegraphconstructionsystem_spark/functions/vp8_tables.py.

The tables are public constants from RFC 6386 (the VP8 bitstream spec,
sections 13.4/13.5/11.2/14.1); libwebp (BSD-licensed) carries the same
bytes in its .rodata.  We locate them by content anchors (not fixed file
offsets, so the script survives other libwebp builds), cross-check the
decoder and encoder copies against each other, verify the structural
invariants that pin the layout, and emit pinned Python literals.

Layout facts this script verifies (discovered against libwebp 1.2.x):

* ``CoeffsProba0`` is [4 types][8 bands][3 ctx][11 probs] = 1056 bytes and
  BEGINS with a 33-byte all-128 block: block type 0 ("luma after Y2")
  starts token decoding at coefficient 1, so its band-0 slot is never
  read and libwebp stores the neutral 128 filler there.  The familiar
  RFC row {253,136,254,...} is type 0 band ONE.  Anchoring the table at
  the {253,136,...} row and assuming it is the array head truncates the
  final (type 3, band 7) rows into unrelated data - the bug this script's
  invariants exist to catch.
* ``CoeffsUpdateProba`` (same shape) sits immediately BEFORE
  ``kBModesProba`` with zero gap; its head is all-255 rows (the unused
  type-0 band-0 slot again - 255 means "never update").
* ``kBModesProba`` is the keyframe 4x4-mode table [10 above][10 left][9].
* ``kDcTable[128]`` is uint8 (max 157); ``kAcTable[128]`` is uint16
  LE (max 284).

Run:  python scripts/extract_vp8_tables.py [path-to-libwebp.so]
"""
from __future__ import annotations

import sys
from pathlib import Path

OUT = (
    Path(__file__).resolve().parents[1]
    / "agenticknowledgegraphconstructionsystem_spark"
    / "functions"
    / "vp8_tables.py"
)

DEFAULT_LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"

# Content anchors (RFC 6386 rows that are unmistakable in .rodata).
ROW_T0B1C0 = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
ROW_KB00 = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
DC_HEAD = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18])


def _find_all(data: bytes, needle: bytes) -> list[int]:
    offs, i = [], data.find(needle)
    while i != -1:
        offs.append(i)
        i = data.find(needle, i + 1)
    return offs


def extract(lib_path: str) -> dict[str, object]:
    data = Path(lib_path).read_bytes()

    kb_offs = _find_all(data, ROW_KB00)
    cp_offs = [o - 33 for o in _find_all(data, ROW_T0B1C0)]
    if not kb_offs or not cp_offs:
        raise SystemExit("anchor rows not found - not a libwebp build?")

    # kBModesProba anchors the cluster: CoeffsUpdateProba ends flush
    # against it, CoeffsProba0 follows it (past alignment padding).
    kb = kb_offs[0]
    up = kb - 1056
    cps = [o for o in cp_offs if 0 < o - (kb + 900) <= 64]
    if not cps:
        raise SystemExit("CoeffsProba0 not adjacent to kBModesProba")
    cp = cps[0]

    coeffs = data[cp : cp + 1056]
    update = data[up : up + 1056]
    bmodes = data[kb : kb + 900]

    # Structural invariants that pin the 33-byte shift.
    assert coeffs[:33] == bytes([128] * 33), "t0b0 filler missing"
    row = lambda t, b, c: coeffs[((t * 8 + b) * 3 + c) * 11 :][:11]
    assert row(0, 1, 0) == ROW_T0B1C0
    # type 1 (Y2) band 0 is real data (Y2 decodes from coefficient 0).
    assert row(1, 0, 0)[0] != 128 and row(3, 7, 0) != bytes([128] * 11)
    # chroma band 7 is the other neutral-filler slot in libwebp's copy.
    assert row(2, 7, 0) == bytes([128] * 11)
    assert update[:33] == bytes([255] * 33), "update head not all-255"
    assert min(update) >= 128, "update probs out of range"
    # decoder and encoder carry identical copies - cross-check.
    others = [o for o in cp_offs if o != cp]
    assert any(data[o : o + 1056] == coeffs for o in others), "no 2nd copy"

    dc_off = data.find(DC_HEAD)
    assert dc_off != -1, "kDcTable not found"
    dc = list(data[dc_off : dc_off + 128])
    assert dc[-1] == 157 and all(a <= b for a, b in zip(dc, dc[1:]))

    import struct

    ac_off = data.find(struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11))
    assert ac_off != -1, "kAcTable not found"
    ac = list(struct.unpack_from("<128H", data, ac_off))
    assert ac[-1] == 284 and all(a < b for a, b in zip(ac, ac[1:]))

    unflat = lambda flat: [
        [[list(flat[((t * 8 + b) * 3 + c) * 11 :][:11]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    # libwebp's 4x4-mode enum orders the diagonal modes B_RD=4, B_VR=5,
    # B_LD=6 (vp8i_dec.h), while RFC 6386 section 11.2 numbers them
    # B_LD=4, B_RD=5, B_VR=6.  kBModesProba is indexed [above][left] in
    # libwebp numbering; permute both axes into RFC numbering so the
    # decoder can index with spec mode ids.  (The 9 probs inside a cell
    # parameterize tree NODES - both trees share the same shape, so the
    # inner order is already aligned.)
    to_lib = {4: 6, 5: 4, 6: 5}
    m = lambda x: to_lib.get(x, x)
    kf_b = [
        [list(bmodes[(m(a) * 10 + m(l)) * 9 :][:9]) for l in range(10)]
        for a in range(10)
    ]
    return {
        "COEFF_PROBS": unflat(coeffs),
        "COEFF_UPDATE_PROBS": unflat(update),
        "KF_BMODE_PROBS": kf_b,
        "DC_QLOOKUP": dc,
        "AC_QLOOKUP": ac,
    }


def main() -> None:
    lib = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_LIB
    tables = extract(lib)
    lines = [
        '"""VP8 (lossy WebP) constant tables - RFC 6386 sections 13.4/13.5',
        "(token probabilities), 11.2 (keyframe 4x4-mode probabilities) and",
        "14.1 (quantizer lookup).  GENERATED by scripts/extract_vp8_tables.py",
        "from the public constants in the host libwebp build; the extraction",
        "cross-checks libwebp's decoder and encoder copies byte-for-byte and",
        "pins the structural invariants documented in that script.",
        '"""',
        "",
    ]
    for name, val in tables.items():
        lines.append(f"{name} = {val!r}")
        lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
