"""Dependency-free JPEG codec: baseline (SOF0/1) and progressive (SOF2)
(VERDICT r2 task 8; progressive added per VERDICT r4 task 7).

The format that actually dominates multimodal corpora, decoded with
nothing but the stdlib + numpy: marker walk, DQT/DHT/SOF/SOS parsing,
Huffman entropy decode (DC differential + AC run/size with ZRL/EOB),
dequantization, zigzag, 8×8 IDCT (numpy basis matmul), and chroma
upsampling to a per-pixel luma plane. Progressive decode accumulates
coefficients across scans: interleaved or single-component DC
first/refinement, and single-component AC scans with EOB runs and the
full T.81 G.1.2.3 successive-approximation refinement protocol
(newly-significant ±2^Al values, per-coefficient correction bits,
buffered EOB-run bits). Arithmetic coding, lossless/hierarchical
frames, 12-bit precision, and restart markers raise
`NotImplementedError` with a clear message.

The encoder half is deliberately minimal: it writes spec-correct
baseline 4:2:0 JPEGs whose blocks are SOLID colors (DC-only, all-ones
quantization), because with those inputs the decoded pixels are exact
integers — which is what lets a SQL oracle predict the decode output
in closed form (see `multimodal_jpeg_decode`). The decoder does NOT
know this: it runs the full general path (per-coefficient Huffman, all
64 dequant multiplies, full IDCT) on every file.

Everything is built inside `_jpeg_kit()` as nested functions so
cloudpickle ships the code BY VALUE to executor workers (the same
pattern as `operators/multimodal._codec_kit` — the package may not be
importable on workers under the external harness).

Reference tables: the Huffman table layouts are the "typical" tables of
the public JPEG specification (ITU-T T.81 Annex K.3) — the ones every
baseline encoder ships.
"""

from __future__ import annotations


def _jpeg_kit():
    import struct

    # ITU-T T.81 Annex K.3 typical Huffman tables: (bits[1..16], values)
    DC_LUMA = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    DC_CHROMA = (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    AC_LUMA = (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
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
        ],
    )
    AC_CHROMA = (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    )

    ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def _huff_codes(bits, values):
        """(value -> (code, length)) per T.81 C.2 canonical assignment."""
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return out

    def _huff_decoder(bits, values):
        """((code, length) -> value) lookup for the bit-reader."""
        return {v: k for k, v in _huff_codes(bits, values).items()}

    # ---------------- encoder (solid-block baseline 4:2:0) -----------

    class _BitWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def write(self, code, length):
            for i in range(length - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    if self.acc == 0xFF:  # byte stuffing
                        self.buf.append(0x00)
                    self.acc = 0
                    self.n = 0

        def flush(self):
            while self.n:  # pad with 1s per spec
                self.write(1, 1)

    def _dht_segment(tc_th, table):
        bits, values = table
        body = bytes([tc_th]) + bytes(bits) + bytes(values)
        return struct.pack(">HH", 0xFFC4, len(body) + 2) + body

    def _category(v):
        a, n = abs(v), 0
        while a:
            a >>= 1
            n += 1
        return n

    def encode_jpeg_solid_blocks(width, height, y_of_block, chroma=128):
        """Baseline 4:2:0 JPEG, all-ones quant tables, every 8×8 block a
        solid color: Y block i (raster order over the Y plane, MCU
        scan order respected) has value `y_of_block(i)`; both chroma
        planes are the constant `chroma`. Decoded pixels reproduce
        these values exactly (DC-only blocks survive quantization
        bit-for-bit), which is what the SQL oracle relies on.
        Width/height must be multiples of 16 (whole MCUs)."""
        if width % 16 or height % 16:
            raise ValueError("solid-block encoder: dims must be multiples of 16")
        mcux, mcuy = width // 16, height // 16
        dc_l = _huff_codes(*DC_LUMA)
        dc_c = _huff_codes(*DC_CHROMA)
        ac_l = _huff_codes(*AC_LUMA)
        ac_c = _huff_codes(*AC_CHROMA)

        out = bytearray()
        out += b"\xff\xd8"  # SOI
        qt = bytes([0]) + bytes([1] * 64)  # table 0, all ones
        out += struct.pack(">HH", 0xFFDB, len(qt) + 2) + qt
        qt1 = bytes([1]) + bytes([1] * 64)
        out += struct.pack(">HH", 0xFFDB, len(qt1) + 2) + qt1
        # SOF0: 8-bit, 3 components, Y 2x2 q0, Cb 1x1 q1, Cr 1x1 q1
        sof = struct.pack(">BHHB", 8, height, width, 3)
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        out += struct.pack(">HH", 0xFFC0, len(sof) + 2) + sof
        out += _dht_segment(0x00, DC_LUMA)
        out += _dht_segment(0x10, AC_LUMA)
        out += _dht_segment(0x01, DC_CHROMA)
        out += _dht_segment(0x11, AC_CHROMA)
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        out += struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos

        w = _BitWriter()
        pred = {"y": 0, "cb": 0, "cr": 0}

        def put_dc_only(dc, pred_key, dc_table, ac_table):
            diff = dc - pred[pred_key]
            pred[pred_key] = dc
            cat = _category(diff)
            code, length = dc_table[cat]
            w.write(code, length)
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                w.write(v, cat)
            code, length = ac_table[0x00]  # EOB
            w.write(code, length)

        yblocks_per_row = mcux * 2
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        i = (my * 2 + by) * yblocks_per_row + mx * 2 + bx
                        val = int(y_of_block(i)) & 0xFF
                        put_dc_only((val - 128) * 8, "y", dc_l, ac_l)
                put_dc_only((int(chroma) - 128) * 8, "cb", dc_c, ac_c)
                put_dc_only((int(chroma) - 128) * 8, "cr", dc_c, ac_c)
        w.flush()
        out += w.buf
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ------------- progressive encoder (general coefficients) --------

    def encode_jpeg_progressive(width, height, y_coefs_of_block, chroma_dc=0):
        """Progressive (SOF2) 4:2:0 JPEG, all-ones quant tables.
        `y_coefs_of_block(i)` returns the 64 zigzag-order INTEGER
        coefficients of Y block i (same raster block index as the
        solid-block encoder); chroma blocks are DC-only with
        coefficient `chroma_dc`. The scan script deliberately exercises
        every progressive decode path: interleaved DC first (Al=1) +
        DC refinement, per-component AC first (Al=1) with EOB runs and
        ZRL, and per-component AC successive-approximation refinement
        (Ah=1, Al=0) with newly-significant coefficients, correction
        bits, and buffered EOB-run bits (the T.81 G.1.2.3 protocol)."""
        if width % 16 or height % 16:
            raise ValueError("progressive encoder: dims must be multiples of 16")
        mcux, mcuy = width // 16, height // 16
        dc_l = _huff_codes(*DC_LUMA)
        dc_c = _huff_codes(*DC_CHROMA)
        # The Annex-K AC tables only define EOB(0x00) and ZRL(0xF0) —
        # progressive scans also need the EOBn run-length symbols
        # (0x10..0xE0), so ship a custom flat table: every needed
        # symbol at 8 bits (valid canonical assignment; decoders build
        # whatever the DHT declares).
        prog_ac_vals = (
            [n << 4 for n in range(15)]            # EOB1..EOB16384 runs
            + [0xF0]                               # ZRL
            + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        )
        PROG_AC = ([0, 0, 0, 0, 0, 0, 0, len(prog_ac_vals)] + [0] * 8, prog_ac_vals)
        ac_l = _huff_codes(*PROG_AC)
        ac_c = ac_l
        yb_per_row = mcux * 2
        yblocks = [
            [int(x) for x in y_coefs_of_block(i)]
            for i in range(yb_per_row * mcuy * 2)
        ]
        for b in yblocks:
            if len(b) != 64:
                raise ValueError("y_coefs_of_block must return 64 coefficients")
        cblock = [int(chroma_dc)] + [0] * 63

        out = bytearray()
        out += b"\xff\xd8"  # SOI
        qt0 = bytes([0]) + bytes([1] * 64)
        out += struct.pack(">HH", 0xFFDB, len(qt0) + 2) + qt0
        qt1 = bytes([1]) + bytes([1] * 64)
        out += struct.pack(">HH", 0xFFDB, len(qt1) + 2) + qt1
        sof = struct.pack(">BHHB", 8, height, width, 3)
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
        out += struct.pack(">HH", 0xFFC2, len(sof) + 2) + sof  # SOF2
        out += _dht_segment(0x00, DC_LUMA)
        out += _dht_segment(0x10, PROG_AC)
        out += _dht_segment(0x01, DC_CHROMA)
        out += _dht_segment(0x11, PROG_AC)

        def sos(comps_spec, ss, se, ah, al):
            body = bytes([len(comps_spec)])
            for cs, tdta in comps_spec:
                body += bytes([cs, tdta])
            body += bytes([ss, se, (ah << 4) | al])
            return struct.pack(">HH", 0xFFDA, len(body) + 2) + body

        def dc_blocks_interleaved():
            """(comp_id, dc_table, coefs) in MCU order."""
            for my in range(mcuy):
                for mx in range(mcux):
                    for by in range(2):
                        for bx in range(2):
                            i = (my * 2 + by) * yb_per_row + mx * 2 + bx
                            yield 1, dc_l, yblocks[i]
                    yield 2, dc_c, cblock
                    yield 3, dc_c, cblock

        # --- scan 1: DC first, interleaved, Al=1 ---
        w = _BitWriter()
        out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
        pred = {1: 0, 2: 0, 3: 0}
        for cid, table, blk in dc_blocks_interleaved():
            t = blk[0] >> 1  # arithmetic shift = the decoder's (val<<1) inverse
            diff = t - pred[cid]
            pred[cid] = t
            cat = _category(diff)
            code, length = table[cat]
            w.write(code, length)
            if cat:
                v = diff if diff >= 0 else diff + (1 << cat) - 1
                w.write(v, cat)
        w.flush()
        out += w.buf

        # --- scan 2: DC refinement, Al=0 (raw bits, no Huffman) ---
        w = _BitWriter()
        out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
        for _cid, _table, blk in dc_blocks_interleaved():
            w.write(blk[0] & 1, 1)
        w.flush()
        out += w.buf

        def comp_blocks(cid):
            if cid == 1:
                return yblocks  # row-major == non-interleaved order
            return [cblock] * (mcux * mcuy)

        # --- AC first scans (per component, Al=1) ---
        for cid, tdta, table in ((1, 0x00, ac_l), (2, 0x01, ac_c), (3, 0x01, ac_c)):
            w = _BitWriter()
            out += sos([(cid, tdta)], 1, 63, 0, 1)
            eobrun = [0]

            def flush_eobrun():
                n = eobrun[0]
                if n:
                    nb = n.bit_length() - 1
                    code, length = table[nb << 4]
                    w.write(code, length)
                    if nb:
                        w.write(n - (1 << nb), nb)
                    eobrun[0] = 0

            for blk in comp_blocks(cid):
                r = 0
                for k in range(1, 64):
                    v = blk[k]
                    t = abs(v) >> 1  # magnitude point transform (Al=1)
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        code, length = table[0xF0]  # ZRL
                        w.write(code, length)
                        r -= 16
                    s = _category(t)
                    sv = t if v >= 0 else -t
                    code, length = table[(r << 4) | s]
                    w.write(code, length)
                    bits = sv if sv >= 0 else sv + (1 << s) - 1
                    w.write(bits, s)
                    r = 0
                if r > 0:
                    eobrun[0] += 1
                    if eobrun[0] == 0x7FFF:
                        flush_eobrun()
            flush_eobrun()
            w.flush()
            out += w.buf

        # --- AC refinement scans (per component, Ah=1 -> Al=0) ---
        for cid, tdta, table in ((1, 0x00, ac_l), (2, 0x01, ac_c), (3, 0x01, ac_c)):
            w = _BitWriter()
            out += sos([(cid, tdta)], 1, 63, 1, 0)
            eobrun = [0]
            pending = []  # correction bits owed to the open EOB run

            def flush_eobrun_refine():
                n = eobrun[0]
                if n:
                    nb = n.bit_length() - 1
                    code, length = table[nb << 4]
                    w.write(code, length)
                    if nb:
                        w.write(n - (1 << nb), nb)
                    eobrun[0] = 0
                for b in pending:
                    w.write(b, 1)
                del pending[:]

            for blk in comp_blocks(cid):
                r = 0
                br = []  # correction bits since the last emitted symbol
                for k in range(1, 64):
                    t = abs(blk[k])  # Al = 0
                    if t == 0:
                        r += 1
                        continue
                    # Pending zero runs flush BEFORE any nonzero
                    # position — including correction-only ones — so
                    # the decoder's skip loop sees correction bits in
                    # stream order (the T.81/libjpeg protocol).
                    while r > 15:
                        flush_eobrun_refine()
                        code, length = table[0xF0]
                        w.write(code, length)
                        r -= 16
                        for b in br:
                            w.write(b, 1)
                        br = []
                    if t >> 1:  # significant at the previous precision
                        br.append(t & 1)
                        continue
                    # newly significant (t == 1)
                    flush_eobrun_refine()
                    code, length = table[(r << 4) | 1]
                    w.write(code, length)
                    w.write(1 if blk[k] > 0 else 0, 1)
                    for b in br:
                        w.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun[0] += 1
                    pending.extend(br)
                    if eobrun[0] == 0x7FFF:
                        flush_eobrun_refine()
            flush_eobrun_refine()
            w.flush()
            out += w.buf

        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ---------------- decoder (general baseline SOF0) ----------------

    class _BitReader:
        def __init__(self, data):
            self.data = data
            self.pos = 0
            self.acc = 0
            self.n = 0

        def bit(self):
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("jpeg: entropy stream truncated")
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    if self.pos >= len(self.data):
                        raise ValueError("jpeg: entropy stream truncated")
                    nxt = self.data[self.pos]
                    if nxt == 0x00:
                        self.pos += 1  # stuffed byte
                    elif 0xD0 <= nxt <= 0xD7:
                        # DRI is gated at scan start, so an RSTn here
                        # means a stream this decoder can't interpret
                        raise ValueError("jpeg: unexpected restart marker")
                    else:
                        raise ValueError("jpeg: marker inside entropy data")
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k):
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

        def huff(self, table):
            code, length = 0, 0
            while length <= 16:
                code = (code << 1) | self.bit()
                length += 1
                hit = table.get((code, length))
                if hit is not None:
                    return hit
            raise ValueError("jpeg: invalid Huffman code")

    def _extend(v, cat):
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    def decode_jpeg(data):
        """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG;
        returns {width, height, n_components, mean_luma} with mean_luma
        the average of the full decoded Y plane (cropped to true
        dims). Progressive accumulates coefficients across every scan
        (DC first/refine, AC first with EOB runs, AC successive-
        approximation refinement) and renders once at EOI."""
        import numpy as np

        if data[:2] != b"\xff\xd8":
            raise NotImplementedError("not a JPEG (no SOI)")
        qt = {}
        huff_dc = {}
        huff_ac = {}
        frame = None
        restart_interval = 0
        coefs = None  # progressive coefficient accumulator
        saw_scan = False
        pos = 2
        while pos < len(data):
            if data[pos] != 0xFF:
                raise ValueError("jpeg: expected marker")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                break
            if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "lossless/differential JPEG not supported"
                )
            if marker in (0xC9, 0xCA, 0xCB):
                raise NotImplementedError("arithmetic-coded JPEG not supported")
            if pos + 2 > len(data):
                raise ValueError("jpeg: truncated segment header")
            (seglen,) = struct.unpack_from(">H", data, pos)
            if pos + seglen > len(data):
                raise ValueError("jpeg: truncated segment body")
            body = data[pos + 2 : pos + seglen]
            pos += seglen
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(body):
                    pq, tq = body[p] >> 4, body[p] & 0xF
                    p += 1
                    if pq:
                        raise NotImplementedError("16-bit quant tables not supported")
                    qt[tq] = list(body[p : p + 64])
                    p += 64
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(body):
                    tc, th = body[p] >> 4, body[p] & 0xF
                    bits = list(body[p + 1 : p + 17])
                    nv = sum(bits)
                    values = list(body[p + 17 : p + 17 + nv])
                    (huff_ac if tc else huff_dc)[th] = _huff_decoder(bits, values)
                    p += 17 + nv
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
                prec, h, w_, nc = struct.unpack_from(">BHHB", body, 0)
                if prec != 8:
                    raise NotImplementedError("only 8-bit precision supported")
                comps = []
                for i in range(nc):
                    cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
                frame = {"w": w_, "h": h, "comps": comps, "prog": marker == 0xC2}
                if frame["prog"]:
                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    mcux = -(-w_ // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    coefs = {
                        c["id"]: np.zeros(
                            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                        )
                        for c in comps
                    }
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan = []
                for i in range(ns):
                    cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                    scan.append((cs, tdta >> 4, tdta & 0xF))
                if frame is not None and frame.get("prog"):
                    ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                    pos = _decode_progressive_scan(
                        np, data, pos, frame, scan, ss, se, ahal >> 4, ahal & 0xF,
                        huff_dc, huff_ac, coefs, restart_interval,
                    )
                    saw_scan = True
                    continue
                return _decode_scan(
                    np, data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
                )
            # APPn/COM and others: skipped
        if frame is not None and frame.get("prog") and saw_scan:
            return _render_progressive(np, frame, coefs, qt)
        raise ValueError("jpeg: no SOS marker found")

    def _ni_blocks(frame, c, hmax, vmax):
        """Non-interleaved scan block grid (T.81 A.2.2): blocks covering
        the component's own ceil-scaled sample dims, NOT the MCU-padded
        grid."""
        cw = -(-(frame["w"] * c["h"]) // hmax)
        ch = -(-(frame["h"] * c["v"]) // vmax)
        return -(-cw // 8), -(-ch // 8)

    def _decode_progressive_scan(
        np, data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac, coefs, dri
    ):
        """Decode one progressive scan into the coefficient accumulator
        (zigzag order), returning the offset of the next marker. DC
        scans may be interleaved; AC scans are single-component and
        non-interleaved per the spec. Successive approximation follows
        T.81 G.1.2 (the libjpeg-compatible bit protocol): DC refinement
        ORs the next bit into the raw value; AC works on magnitudes —
        newly-significant coefficients arrive as ±2^Al, older ones take
        a correction bit each."""
        if dri:
            raise NotImplementedError(
                "restart markers (DRI) not supported by this decoder"
            )
        comps = frame["comps"]
        by_id = {c["id"]: c for c in comps}
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        reader = _BitReader(data[pos:])
        p1, m1 = 1 << al, -(1 << al)

        def dc_first(blk, td, pred):
            cat = reader.huff(huff_dc[td])
            diff = _extend(reader.bits(cat), cat) if cat else 0
            pred += diff
            blk[0] = pred << al
            return pred

        def dc_refine(blk):
            if reader.bit():
                blk[0] = int(blk[0]) | p1

        def ac_first(blk, ta, eobrun):
            if eobrun > 0:
                return eobrun - 1
            k = ss
            while k <= se:
                rs = reader.huff(huff_ac[ta])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    return eobrun
                k += r
                if k > se:
                    raise ValueError("jpeg: AC index overflow")
                blk[k] = _extend(reader.bits(s), s) << al
                k += 1
            return 0

        def ac_refine(blk, ta, eobrun):
            # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.huff(huff_ac[ta])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.bits(r)
                            break
                        val = 0  # ZRL: 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("jpeg: bad refinement size")
                        val = p1 if reader.bit() else m1
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if reader.bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if k <= se and val != 0:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if reader.bit() and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1
            return eobrun

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("jpeg: DC scan must have Se = 0")
            pred = {cs: 0 for cs, _, _ in scan}
            if len(scan) == 1:
                cs, td, _ = scan[0]
                c = by_id[cs]
                bw, bh = _ni_blocks(frame, c, hmax, vmax)
                for by in range(bh):
                    for bx in range(bw):
                        blk = coefs[cs][by, bx]
                        if ah == 0:
                            pred[cs] = dc_first(blk, td, pred[cs])
                        else:
                            dc_refine(blk)
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for cs, td, _ in scan:
                            c = by_id[cs]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    blk = coefs[cs][
                                        my * c["v"] + by, mx * c["h"] + bx
                                    ]
                                    if ah == 0:
                                        pred[cs] = dc_first(blk, td, pred[cs])
                                    else:
                                        dc_refine(blk)
        else:  # AC scan: single component, non-interleaved
            if len(scan) != 1:
                raise ValueError("jpeg: AC scan must be single-component")
            cs, _, ta = scan[0]
            c = by_id[cs]
            bw, bh = _ni_blocks(frame, c, hmax, vmax)
            eobrun = 0
            for by in range(bh):
                for bx in range(bw):
                    blk = coefs[cs][by, bx]
                    if ah == 0:
                        eobrun = ac_first(blk, ta, eobrun)
                    else:
                        eobrun = ac_refine(blk, ta, eobrun)

        # advance to the next marker (skip stuffed 0xFF00 bytes)
        i = pos
        while i + 1 < len(data):
            if data[i] == 0xFF and data[i + 1] != 0x00:
                if 0xD0 <= data[i + 1] <= 0xD7:  # RSTn (gated above)
                    i += 2
                    continue
                return i
            i += 1
        raise ValueError("jpeg: scan data ran past end of file")

    def _render_progressive(np, frame, coefs, qt):
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        luma = comps[0]
        q = np.array(qt[luma["tq"]], dtype=float)
        basis = _idct_basis(np)
        arr = coefs[luma["id"]]
        bh, bw = arr.shape[0], arr.shape[1]
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                dq = arr[by, bx].astype(float) * q
                blk = np.zeros((8, 8))
                for i, z in enumerate(ZIGZAG):
                    blk[z // 8, z % 8] = dq[i]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    basis @ blk @ basis.T + 128.0
                )
        scale_x = hmax // luma["h"]
        scale_y = vmax // luma["v"]
        if scale_x > 1 or scale_y > 1:
            plane = np.kron(plane, np.ones((scale_y, scale_x)))
        plane = plane[: frame["h"], : frame["w"]]
        plane = np.clip(np.rint(plane), 0, 255)
        return {
            "width": frame["w"],
            "height": frame["h"],
            "n_components": len(comps),
            "mean_luma": float(plane.mean()),
        }

    # orthonormal 8-point DCT-III basis for the IDCT, built once
    def _idct_basis(np):
        import math

        m = np.zeros((8, 8))
        for x in range(8):
            for u in range(8):
                cu = (1 / math.sqrt(2)) if u == 0 else 1.0
                m[x, u] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        return m

    def _decode_scan(np, data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
        if frame is None:
            raise ValueError("jpeg: SOS before SOF")
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        planes = {
            c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
        }
        tables = {cs: (td, ta) for cs, td, ta in scan}
        if dri:
            # Honest gate: the synthesized corpus never emits DRI, so a
            # restart-resync path here would be untested code claiming
            # support. Fail loudly instead of decoding garbage.
            raise NotImplementedError(
                "restart markers (DRI) not supported by this baseline decoder"
            )
        reader = _BitReader(data[pos:])
        pred = {c["id"]: 0 for c in comps}
        basis = _idct_basis(np)
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    td, ta = tables[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64)
                            cat = reader.huff(huff_dc[td])
                            diff = _extend(reader.bits(cat), cat) if cat else 0
                            pred[c["id"]] += diff
                            coef[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = reader.huff(huff_ac[ta])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("jpeg: AC index overflow")
                                coef[k] = _extend(reader.bits(s), s)
                                k += 1
                            q = np.array(qt[c["tq"]], dtype=float)
                            dq = coef * q
                            blk = np.zeros((8, 8))
                            for i, z in enumerate(ZIGZAG):
                                blk[z // 8, z % 8] = dq[i]
                            px = basis @ blk @ basis.T + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
        # luma = first scan component, cropped to true dims after
        # upsampling bookkeeping (luma is full-resolution already)
        luma_id = scan[0][0]
        luma_comp = next(c for c in comps if c["id"] == luma_id)
        scale_x = hmax // luma_comp["h"]
        scale_y = vmax // luma_comp["v"]
        luma = planes[luma_id]
        if scale_x > 1 or scale_y > 1:
            luma = np.kron(luma, np.ones((scale_y, scale_x)))
        luma = luma[: frame["h"], : frame["w"]]
        luma = np.clip(np.rint(luma), 0, 255)
        return {
            "width": frame["w"],
            "height": frame["h"],
            "n_components": len(comps),
            "mean_luma": float(luma.mean()),
        }

    return encode_jpeg_solid_blocks, decode_jpeg, encode_jpeg_progressive


# Driver-side aliases for unit tests; worker closures must call
# `_jpeg_kit()` themselves (by-value shipping).
encode_jpeg_solid_blocks, decode_jpeg, encode_jpeg_progressive = _jpeg_kit()
