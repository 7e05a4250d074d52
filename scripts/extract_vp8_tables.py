#!/usr/bin/env python3
"""Regenerate operators/vp8_tables.py from the system libwebp binary.

The VP8 (RFC 6386) default probability and dequantization tables are large
public constants (they appear verbatim in RFC 6386's reference decoder and
in every conformant implementation).  Rather than hand-transcribing ~3 KB
of numbers, this script locates them inside the system's libwebp shared
object by structural signature and dumps them as Python literals:

- kDcTable[128]  (uint8)  — monotone, starts 4,5,6,7, ends 157
- kAcTable[128]  (uint16) — monotone, starts 4,5,6,7, ends 284
- kBands[16]     — coefficient-position -> probability band map
- CoeffsUpdateProba[4][8][3][11] — header token-probability-update probs
  (immediately follows kDcTable's 16-byte padding in .rodata)
- kBModesProba[10][10][9] — keyframe intra 4x4 mode probs, contexted on
  (above, left) modes (immediately follows CoeffsUpdateProba)
- CoeffsProba0[4][8][3][11] — default DCT token probabilities

Every extracted table is cross-checked against known RFC 6386 anchor
values before being emitted, and the generated decoder is further
validated end-to-end: tests/test_vp8.py decodes real libwebp-encoded
lossy streams and compares Y/U/V planes bit-exactly against
WebPDecodeYUV, which would fail on any wrong table byte.

Usage: python scripts/extract_vp8_tables.py [libwebp.so path] > out.py
"""
import struct
import sys


def find_one(hits, name):
    # dec/enc each carry a copy; dedupe by content
    uniq = {bytes(h[1]) if isinstance(h[1], (bytes, bytearray)) else
            struct.pack(f"<{len(h[1])}H", *h[1]): h for h in hits}
    if len(uniq) != 1:
        raise SystemExit(f"{name}: expected 1 unique table, got {len(uniq)}")
    return next(iter(uniq.values()))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    data = open(path, "rb").read()

    # --- kAcTable: 128 x uint16 LE, monotone, 4..284 ---------------------
    ac_hits = []
    for off in range(0, len(data) - 256, 2):
        v = struct.unpack_from("<128H", data, off)
        if v[:4] == (4, 5, 6, 7) and v[-1] == 284 and \
                all(v[i] <= v[i + 1] for i in range(127)):
            ac_hits.append((off, v))
    ac_off, ac = find_one(ac_hits, "kAcTable")

    # --- kDcTable: 128 x uint8, monotone, 4..157 -------------------------
    dc_hits = []
    for off in range(0, len(data) - 128):
        v = data[off:off + 128]
        if v[:4] == bytes([4, 5, 6, 7]) and v[-1] == 157 and \
                all(v[i] <= v[i + 1] for i in range(127)):
            dc_hits.append((off, v))
    _, dc = find_one(dc_hits, "kDcTable")

    # --- layout anchored at the decoder's copy of kDcTable ---------------
    # .rodata layout in libwebp's dec unit: kDcTable(128) | kBands(16+pad16)
    # | CoeffsUpdateProba(1056) | kBModesProba(900+pad) | ... | CoeffsProba0
    # (the enc unit carries its own kDcTable copy with a different tail —
    # pick the copy followed by the kBands signature)
    KBANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
    dec_offs = [o for o, _ in dc_hits
                if list(data[o + 128:o + 144]) == KBANDS]
    if len(dec_offs) != 1:
        raise SystemExit(f"expected 1 dec-unit kDcTable, got {dec_offs}")
    dc_off = dec_offs[0]
    bands_off = dc_off + 128
    bands = list(data[bands_off:bands_off + 16])

    upd_off = bands_off + 32  # 16 bytes padding after kBands
    upd = data[upd_off:upd_off + 1056]
    if upd[:16] != b"\xff" * 16 or upd.count(255) < 700:
        raise SystemExit("CoeffsUpdateProba signature mismatch")

    bmode_off = upd_off + 1056
    bmode_raw = data[bmode_off:bmode_off + 900]
    # RFC 6386 13.3 anchor: kf_bmode_prob[0][0] starts 231,120,48,89,115
    if bmode_raw[:5] != bytes([231, 120, 48, 89, 115]):
        raise SystemExit("kBModesProba anchor mismatch")
    # libwebp numbers the intra 4x4 modes differently from RFC 6386
    # (libwebp common_dec.h: B_RD=4, B_VR=5, B_LD=6; RFC: B_LD=4, B_RD=5,
    # B_VR=6 — DC/TM/VE/HE/VL/HD/HU agree).  The binary's kBModesProba is
    # indexed [above][left] in libwebp numbering on both axes; permute both
    # so the emitted table is pure RFC ordering (the probe-tree node order
    # is identical, so the 9 per-context probs need no permutation).
    RFC2WEBP = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
    bmode = [0] * 900
    for a in range(10):
        for l in range(10):
            src = (RFC2WEBP[a] * 10 + RFC2WEBP[l]) * 9
            dst = (a * 10 + l) * 9
            bmode[dst:dst + 9] = bmode_raw[src:src + 9]

    # CoeffsProba0 follows after small tables + padding; find by anchor:
    # type 0 band 0 is 33 bytes of 128, then ctx pattern 253,136,254,255
    anchor = bytes([128] * 33 + [253, 136, 254, 255])
    p0 = data.find(anchor, bmode_off + 900)
    if p0 < 0 or p0 > bmode_off + 900 + 0x100:
        raise SystemExit("CoeffsProba0 anchor not found")
    coef = data[p0:p0 + 1056]
    if 0 in coef:
        raise SystemExit("CoeffsProba0 contains 0 (invalid probability)")

    def emit(name, vals, per=16):
        print(f"{name} = (")
        for i in range(0, len(vals), per):
            row = ", ".join(str(x) for x in vals[i:i + per])
            print(f"    {row},")
        print(")\n")

    print('"""VP8 (RFC 6386) constant tables, extracted from the system')
    print("libwebp binary by scripts/extract_vp8_tables.py (see its")
    print('docstring for signatures and cross-checks).  Flat tuples;')
    print('index math lives in operators/vp8.py."""\n')
    emit("DC_QLOOKUP", list(dc))
    emit("AC_QLOOKUP", list(ac))
    emit("COEF_BANDS", bands)
    emit("COEF_UPDATE_PROBS", list(upd))
    emit("KF_BMODE_PROBS", list(bmode))
    emit("COEF_PROBS", list(coef))


if __name__ == "__main__":
    main()
