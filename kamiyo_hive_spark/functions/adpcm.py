"""Dependency-free IMA ADPCM (DVI4) codec — compressed audio decode.

Completes the audio side of the codec kit: `multimodal_real_decode`
covers PCM WAV (container parse + sample stats); real scraped audio is
COMPRESSED, and IMA ADPCM (WAV format tag 0x11) is the classic
4-bit-per-sample case whose decoder is a pure integer state machine
(step/index tables per the IMA spec / Microsoft WAVE documentation) —
no third-party codec needed, and every decoded sample is an exact
integer both engines can replay (the DuckDB oracle walks the same
state machine as a recursive CTE).

Block layout (standard mono IMA-in-WAV): blockAlign bytes = 4-byte
header (int16 initial predictor, uint8 initial step index, reserved)
+ (blockAlign - 4) nibble bytes, low nibble first; the header
predictor IS sample 0, so samplesPerBlock = (blockAlign - 4) * 2 + 1.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]  # indexed by nibble & 7


def _step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: returns (new predictor, new index)."""
    step = STEP_TABLE[idx]
    delta = nib & 7
    diff = step >> 3
    if delta & 4:
        diff += step
    if delta & 2:
        diff += step >> 1
    if delta & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + INDEX_TABLE[delta]))
    return pred, idx


def encode_adpcm_wav(
    blocks: list, block_align: int, sample_rate: int = 8000
) -> bytes:
    """WAV (format tag 0x11) from per-block (predictor0, index0,
    [nibbles]) triples; nibble count must be (block_align - 4) * 2."""
    n_nib = (block_align - 4) * 2
    spb = n_nib + 1
    data = bytearray()
    for p0, i0, nibs in blocks:
        if len(nibs) != n_nib:
            raise ValueError("wrong nibble count for block")
        data += struct.pack("<hBB", p0, i0, 0)
        for j in range(0, n_nib, 2):
            data.append((nibs[j] & 0xF) | ((nibs[j + 1] & 0xF) << 4))
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        sample_rate * block_align // spb,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", spb * len(blocks))
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", 4) + fact
        + struct.pack("<4sI", b"data", len(data)) + bytes(data)
    )


def decode_adpcm_wav(data: bytes) -> dict:
    """Parse the WAV container, run the IMA state machine over every
    block; returns exact-integer stats (the header predictor IS sample
    0 of each block). PCM or any other format tag raises — this
    decoder never silently misreads."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("adpcm: not a RIFF/WAVE stream")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size % 2)
    if fmt is None or frames is None:
        raise ValueError("adpcm: missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 0x11:
        raise NotImplementedError(f"adpcm: format tag 0x{tag:x} is not IMA ADPCM")
    if channels != 1 or bits != 4:
        raise NotImplementedError("adpcm: only mono 4-bit blocks supported")
    if len(frames) % block_align:
        raise ValueError("adpcm: truncated block")
    n_nib = (block_align - 4) * 2
    total = n_samples = 0
    vmin, vmax = 32767, -32768
    n_blocks = len(frames) // block_align
    for b in range(n_blocks):
        blk = frames[b * block_align : (b + 1) * block_align]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = blk[2]
        if idx > 88:
            raise ValueError("adpcm: step index out of range")
        total += pred
        n_samples += 1
        vmin, vmax = min(vmin, pred), max(vmax, pred)
        for j in range(n_nib):
            byte = blk[4 + (j >> 1)]
            nib = (byte >> 4) if j & 1 else (byte & 0xF)
            pred, idx = _step(pred, idx, nib)
            total += pred
            n_samples += 1
            vmin, vmax = min(vmin, pred), max(vmax, pred)
    return {
        "sample_rate": rate,
        "n_blocks": n_blocks,
        "n_samples": n_samples,
        "sum_samples": total,
        "min_sample": vmin,
        "max_sample": vmax,
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
