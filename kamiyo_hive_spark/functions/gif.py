"""Dependency-free GIF codec (grayscale palette, multi-frame, real LZW).

Why GIF in the codec kit: it is the one ubiquitous ANIMATED image
format, so it adds a capability the still-image codecs (BMP/JPEG/PNG)
don't cover — frame-indexed sampling inside a single binary object —
with a genuinely different compression family (LZW with variable code
width, GIF89a spec) that zlib can't stand in for.

Selective decode contract (the 100 TB point, same as the MP4 sample
tables): GIF image data is stored as length-prefixed SUB-BLOCKS, so a
reader can SKIP a frame by hopping block lengths without running LZW —
``sample_gif_frames`` decompresses ONLY the stride-sampled frames and
reports decoded_bytes < total_image_bytes to prove it.

Decoder scope (honest gates): global grayscale palette (the identity
ramp the encoder writes), no local color tables, no interlace, no
transparency dispose logic (metadata skipped, pixels composited as
full-frame replaces). The LZW decoder is complete: clear/EOI codes,
dictionary rebuild, variable width growth at 2^width, and the KwKwK
(code == next dict slot) case — all exercised by the real encoder.
"""

from __future__ import annotations

import struct

_HDR = b"GIF89a"


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    """Real GIF-flavor LZW: dictionary of byte strings, clear at dict
    overflow, LSB-first variable-width code packing."""
    clear = 1 << min_code
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code + 1

    def reset():
        nonlocal width
        width = min_code + 1
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, nxt = reset()
    out_bits.append((clear, width))
    w = b""
    for ch in bytes(data):
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= 4096:
            out_bits.append((clear, width))
            table, nxt = reset()
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((eoi, width))
    # pack LSB-first
    acc = n = 0
    raw = bytearray()
    for code, wd in out_bits:
        acc |= code << n
        n += wd
        while n >= 8:
            raw.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        raw.append(acc & 0xFF)
    return bytes(raw)


def _lzw_decode(raw: bytes, min_code: int, n_expected: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = n = pos = 0
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal acc, n, pos
        while n < width:
            if pos >= len(raw):
                raise ValueError("gif: LZW stream truncated")
            acc |= raw[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        return code

    while True:
        code = read_code()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) != n_expected:
        raise ValueError("gif: wrong pixel count")
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list) -> bytes:
    """Multi-frame grayscale GIF89a: global 256-entry identity-ramp
    palette, one full-frame image per element of ``frames`` (each a
    ``pix(x, y) -> 0..255``)."""
    out = bytearray(_HDR)
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256
    for i in range(256):
        out += bytes((i, i, i))
    for pix in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        data = bytes(pix(x, y) for y in range(height) for x in range(width))
        out.append(8)  # LZW minimum code size
        out += _sub_blocks(_lzw_encode(data, 8))
    out += b"\x3b"
    return bytes(out)


def sample_gif_frames(data: bytes, stride: int) -> dict:
    """Parse the stream; LZW-decode every ``stride``-th frame only —
    non-sampled frames are skipped by hopping sub-block lengths (no
    decompression). Returns dims, frame counts, per-sampled-frame mean
    luma, and the decoded/total byte split that proves selectivity."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("gif: bad signature")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("gif: global color table required")
    gct_size = 2 << (flags & 0x07)
    palette = data[pos : pos + 3 * gct_size]
    pos += 3 * gct_size
    for i in range(gct_size):
        if not (palette[3 * i] == palette[3 * i + 1] == palette[3 * i + 2]):
            raise NotImplementedError("gif: non-grayscale palette")
    n_frames = 0
    sampled: list[float] = []
    decoded_bytes = 0
    total_image_bytes = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        if iflags & 0x40:
            raise NotImplementedError("gif: interlace not supported")
        if iflags & 0x80:
            raise NotImplementedError("gif: local color table not supported")
        pos += 10
        min_code = data[pos]
        pos += 1
        blocks = bytearray()
        start = pos
        take = n_frames % stride == 0
        while data[pos] != 0:
            ln = data[pos]
            if take:
                blocks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        total_image_bytes += pos - start
        if take:
            pix = _lzw_decode(bytes(blocks), min_code, fw * fh)
            decoded_bytes += pos - start
            sampled.append(
                sum(palette[3 * p] for p in pix) / (fw * fh)
            )
        n_frames += 1
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "n_sampled": len(sampled),
        "sampled_means": sampled,
        "decoded_bytes": decoded_bytes,
        "total_image_bytes": total_image_bytes,
    }


# Executor shipping: closures built by the registered queries capture
# this module's functions; module-level functions normally pickle BY
# REFERENCE, which breaks on executor workers where kamiyo_hive_spark
# is not importable (the external harness puts the repo on the
# DRIVER's sys.path only — a neutral-cwd drive reproduced the worker
# ModuleNotFoundError). Registering the module for by-value pickling
# makes cloudpickle serialize the whole (pure-function + constant
# table) module into the task, the same effect as the nested-kit
# pattern in jpeg/avi/mp4 without restructuring.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
