"""Dependency-free PNG codec (grayscale-8, all five scanline filters).

Reference parity: the reference renders agent/HUD imagery in the
browser (PNG everywhere); engine-side, PNG is the most common lossless
format in scraped multimodal corpora, so the decode path belongs next
to the BMP/WAV/JPEG/AVI/MP4 kits. Python's stdlib ships zlib, so a
REAL PNG decode needs no third-party dependency: the format is chunks
(length/type/data/CRC32) around a zlib-compressed stream of
filter-prefixed scanlines (PNG spec, RFC 2083 / W3C PNG).

Decoder scope (honest gates, same discipline as the JPEG kit):
grayscale (color type 0), bit depth 8, non-interlaced. All FIVE
scanline filters (None/Sub/Up/Average/Paeth) are implemented — the
in-repo encoder cycles through them row by row, so a roundtrip
exercises every unfilter branch including the Paeth predictor's
three-way tie-break. Palette/RGB/alpha/16-bit/Adam7 raise
NotImplementedError, never silently misdecode; chunk CRCs are
verified, so corruption fails loudly.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 6.6): nearest of left/up/up-left to
    a+b-c, ties broken left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pix) -> bytes:
    """Grayscale-8 PNG of ``pix(x, y) -> 0..255``. The scanline filter
    cycles row % 5 through None/Sub/Up/Average/Paeth so decoders must
    implement ALL of them (real-world encoders pick per-row filters
    adaptively — a decoder that only handles filter 0 fails on most
    genuine files)."""
    rows = [bytes(pix(x, y) & 0xFF for x in range(width)) for y in range(height)]
    out = bytearray()
    prev = bytes(width)
    for y, row in enumerate(rows):
        f = y % 5
        out.append(f)
        if f == 0:
            out += row
        elif f == 1:  # Sub
            out += bytes(
                (row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width)
            )
        elif f == 2:  # Up
            out += bytes((row[x] - prev[x]) & 0xFF for x in range(width))
        elif f == 3:  # Average
            out += bytes(
                (row[x] - (((row[x - 1] if x else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(width)
            )
        else:  # Paeth
            out += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - 1] if x else 0, prev[x], prev[x - 1] if x else 0
                    )
                )
                & 0xFF
                for x in range(width)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Parse chunks (CRC-verified), inflate, unfilter; returns
    {width, height, mean_luma, n_pixels, filters_seen}."""
    if data[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("png: truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype_ != 0:
                raise NotImplementedError(
                    f"png: only grayscale-8 supported (depth={depth}, color={ctype_})"
                )
            if interlace != 0:
                raise NotImplementedError("png: Adam7 interlace not supported")
            if comp != 0 or filt != 0:
                raise ValueError("png: unknown compression/filter method")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("png: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("png: wrong decompressed size")
    prev = bytes(width)
    total = 0
    filters_seen = set()
    for y in range(height):
        f = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        filters_seen.add(f)
        if f == 0:
            pass
        elif f == 1:
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif f == 2:
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:
            for x in range(width):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(width):
                left = line[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter {f}")
        total += sum(line)
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "mean_luma": total / (width * height),
        "filters_seen": sorted(filters_seen),
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
