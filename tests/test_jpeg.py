"""Baseline JPEG codec unit coverage (functions/jpeg.py).

The registered query (`multimodal_jpeg_decode`) proves the end-to-end
solid-block contract against the DuckDB oracle; these tests pin the
decoder's general machinery: exact roundtrips across sizes and DC
magnitudes, the AC coefficient path against an INDEPENDENT loop-form
IDCT, and the fail-fast guards (progressive, arithmetic, truncation).
"""

from __future__ import annotations

import math
import struct

import pytest

from kamiyo_hive_spark.functions.jpeg import (
    _jpeg_kit,
    decode_jpeg,
    encode_jpeg_solid_blocks,
)


def test_roundtrip_exact_across_sizes_and_values():
    for w, h, a, step in [(16, 16, 0, 0), (48, 32, 7, 13), (32, 16, 250, 251)]:
        n_blocks = (w // 8) * (h // 8)
        vals = [(a + i * step) % 256 for i in range(n_blocks)]
        data = encode_jpeg_solid_blocks(w, h, lambda i: vals[i], chroma=77)
        out = decode_jpeg(data)
        assert out["width"] == w and out["height"] == h
        assert out["n_components"] == 3
        assert out["mean_luma"] == pytest.approx(sum(vals) / len(vals), abs=1e-9)


def test_roundtrip_extreme_dc_swings():
    # 0 -> 255 -> 0 ... exercises the largest DC difference categories.
    data = encode_jpeg_solid_blocks(
        32, 32, lambda i: 255 if i % 2 else 0, chroma=0
    )
    out = decode_jpeg(data)
    assert out["mean_luma"] == pytest.approx(127.5)


def test_arithmetic_and_lossless_rejected():
    base = encode_jpeg_solid_blocks(16, 16, lambda i: 100)
    # rewrite the SOF0 marker (FFC0) to SOF9 (arith) / SOF3 (lossless)
    for sof, msg in [(0xC9, "arithmetic"), (0xC3, "lossless")]:
        mutated = bytearray(base)
        idx = bytes(mutated).find(b"\xff\xc0")
        mutated[idx + 1] = sof
        with pytest.raises(NotImplementedError, match=msg):
            decode_jpeg(bytes(mutated))
    # SOF2 is now SUPPORTED — but a baseline scan script under a
    # progressive frame is spec-invalid (DC scan must have Se = 0)
    mutated = bytearray(base)
    idx = bytes(mutated).find(b"\xff\xc0")
    mutated[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(mutated))


def test_truncated_stream_and_non_jpeg_rejected():
    data = encode_jpeg_solid_blocks(16, 16, lambda i: 42)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg(b"\x89PNG....")


def _independent_idct(coef_block):
    """Textbook double-loop IDCT (T.81 A.3.3) — deliberately NOT the
    basis-matmul the decoder uses."""
    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef_block[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = s / 4 + 128.0
    return out


def test_ac_coefficient_path_matches_independent_idct():
    """Hand-build a single-component 8x8 JPEG carrying a DC AND two AC
    coefficients (one after a zero run), decode it, and compare the
    luma mean against the loop-form IDCT. This exercises the run/size
    AC Huffman decode, zigzag placement, and dequantization with a
    non-trivial quant table — none of which the solid-block encoder
    touches."""
    kit_encode, kit_decode, _kit_prog = _jpeg_kit()
    # Build by hand: quant table with q[0]=2 q[1]=3 q[5]=4 (zigzag order)
    qt_z = [1] * 64
    qt_z[0], qt_z[1], qt_z[5] = 2, 3, 4

    # DC=5 (diff 5, category 3), AC1: (run 0, size 2, value -2),
    # then a run of 3 zeros and (run 3, size 1, value 1), then EOB.
    from kamiyo_hive_spark.functions import jpeg as jmod

    # reuse the kit's internal tables via a fresh kit closure: craft the
    # bitstream with the same canonical code assignment the decoder uses
    def huff_codes(bits, values):
        out = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[values[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    DC_LUMA_VALS = list(range(12))
    AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    AC_LUMA_VALS_HEAD = [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21]
    # only the symbols used below need to exist; take the real table
    from kamiyo_hive_spark.functions.jpeg import _jpeg_kit as _k

    dc_codes = huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)

    # pull the full AC table out of the module source of truth by
    # encoding a dummy image and reusing its DHT segment is overkill —
    # the three symbols below (0x02, 0x31, 0x00) are all in the Annex-K
    # table; reconstruct it exactly as the kit does:
    AC_LUMA_VALS = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
    ac_codes = huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    bits_out = []

    def put(code, ln):
        for i in range(ln - 1, -1, -1):
            bits_out.append((code >> i) & 1)

    # DC: category 3, value 5 -> extra bits '101'
    c, ln = dc_codes[3]
    put(c, ln)
    put(5, 3)
    # AC at k=1: run 0, size 2, value -2 -> symbol 0x02, extra bits for
    # -2 in category 2: v = -2 + 3 = 1 -> '01'
    c, ln = ac_codes[0x02]
    put(c, ln)
    put(1, 2)
    # AC: run 3, size 1, value 1 -> symbol 0x31, extra bit '1' (k=2..4
    # zeros, coefficient lands at k=5)
    c, ln = ac_codes[0x31]
    put(c, ln)
    put(1, 1)
    # EOB
    c, ln = ac_codes[0x00]
    put(c, ln)
    while len(bits_out) % 8:
        bits_out.append(1)
    entropy = bytearray()
    for i in range(0, len(bits_out), 8):
        b = 0
        for bit in bits_out[i : i + 8]:
            b = (b << 1) | bit
        entropy.append(b)
        if b == 0xFF:
            entropy.append(0x00)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    jpg = bytearray(b"\xff\xd8")
    jpg += seg(0xFFDB, bytes([0]) + bytes(qt_z))
    jpg += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    jpg += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    jpg += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    jpg += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jpg += bytes(entropy)
    jpg += b"\xff\xd9"

    out = kit_decode(bytes(jpg))
    assert out["width"] == 8 and out["height"] == 8 and out["n_components"] == 1

    # independent reference: dequantized coefficients in NATURAL order
    coef = [[0.0] * 8 for _ in range(8)]
    coef[0][0] = 5 * qt_z[0]          # zigzag 0 -> (0,0)
    coef[0][1] = -2 * qt_z[1]         # zigzag 1 -> (0,1)
    coef[0][2] = 1 * qt_z[5]          # zigzag 5 -> (0,2)... wait: see map
    # zigzag index 5 maps to natural position 2 (row 0, col 2)? The
    # T.81 zigzag: idx 5 -> natural 2? Use the canonical table instead:
    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    coef = [[0.0] * 8 for _ in range(8)]
    for zi, val, q in [(0, 5, qt_z[0]), (1, -2, qt_z[1]), (5, 1, qt_z[5])]:
        nat = ZZ[zi]
        coef[nat // 8][nat % 8] = val * q
    ref = _independent_idct(coef)
    flat = [min(255, max(0, round(v))) for row in ref for v in row]
    assert out["mean_luma"] == pytest.approx(sum(flat) / 64, abs=1e-9)


def test_dims_must_be_mcu_aligned():
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_jpeg_solid_blocks(20, 16, lambda i: 0)


# ---------------- progressive (SOF2) coverage ----------------


def _idct_ref_block(coefs_z):
    import numpy as np

    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    m = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            m[x, u] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    blk = np.zeros((8, 8))
    for i, z in enumerate(zig):
        blk[z // 8, z % 8] = coefs_z[i]
    return m @ blk @ m.T + 128.0


def _progressive_expected_mean(blocks, w, h):
    import numpy as np

    nbx = w // 8
    plane = np.zeros((h, w))
    for i, c in enumerate(blocks):
        by, bx = divmod(i, nbx)
        plane[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = _idct_ref_block(c)
    return float(np.clip(np.rint(plane), 0, 255).mean())


def test_progressive_solid_blocks_roundtrip():
    from kamiyo_hive_spark.functions.jpeg import encode_jpeg_progressive

    for w, h, a, step in [(16, 16, 0, 0), (48, 32, 7, 13), (32, 16, 250, 251)]:
        n_blocks = (w // 8) * (h // 8)
        vals = [(a + i * step) % 256 for i in range(n_blocks)]
        data = encode_jpeg_progressive(
            w, h, lambda i: [(vals[i] - 128) * 8] + [0] * 63, chroma_dc=0
        )
        out = decode_jpeg(data)
        assert out["width"] == w and out["height"] == h
        assert out["n_components"] == 3
        assert abs(out["mean_luma"] - sum(vals) / len(vals)) < 1e-9


def test_progressive_refinement_protocol_randomized():
    """The full successive-approximation protocol — DC first+refine, AC
    first with EOB runs and ZRL, AC refinement with newly-significant
    coefficients, correction bits, and buffered EOB-run bits — against
    an INDEPENDENT loop-form IDCT, across randomized coefficient
    layouts (the seed set that caught the ZRL-before-correction
    encoder bug live)."""
    import random

    from kamiyo_hive_spark.functions.jpeg import encode_jpeg_progressive

    w = h = 32
    nb = (w // 8) * (h // 8)
    for seed in range(8):
        random.seed(seed)
        blocks = []
        for _ in range(nb):
            c = [0] * 64
            c[0] = random.randint(-300, 300)
            for k in random.sample(range(1, 64), random.randint(0, 10)):
                c[k] = random.choice([-1, 1, -3, 5, -17, 33, 2, -2, 127, -128, 64])
            blocks.append(c)
        blocks[3] = [0] * 64  # all-EOB block inside an EOB run
        dense = [((-1) ** k) * (k % 5) for k in range(64)]
        dense[0] = 50
        blocks[5] = dense  # dense block: long symbol streams
        data = encode_jpeg_progressive(w, h, lambda i: blocks[i])
        out = decode_jpeg(data)
        assert out["width"] == w and out["height"] == h
        exp = _progressive_expected_mean(blocks, w, h)
        assert abs(out["mean_luma"] - exp) < 1e-9, (seed, out["mean_luma"], exp)


def test_progressive_truncation_rejected():
    from kamiyo_hive_spark.functions.jpeg import encode_jpeg_progressive

    data = encode_jpeg_progressive(16, 16, lambda i: [80] + [0] * 63)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
