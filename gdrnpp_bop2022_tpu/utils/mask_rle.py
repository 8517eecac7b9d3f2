"""COCO RLE mask codec: ctypes wrapper over the native library with a
numpy fallback.

Role parity with the reference's pycocotools-based mask utils
(lib/utils/mask_utils.py: cocosegm2mask ::, binary_mask_to_rle) — same
column-major run semantics and compressed-string format, so RLE
annotations in BOP/COCO jsons interoperate. The C library builds on first
use (native/Makefile); without a toolchain the numpy path handles
everything (slower, identical output).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "librle.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.rle_encode_counts.restype = ctypes.c_int64
        lib.rle_counts_to_string.restype = ctypes.c_int64
        lib.rle_string_to_counts.restype = ctypes.c_int64
        lib.rle_area.restype = ctypes.c_int64
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Binary (H, W) mask -> column-major run counts (uint32)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = _load_native()
    if lib is not None:
        buf = np.empty(h * w + 1, np.uint32)
        n = lib.rle_encode_counts(_ptr(mask, ctypes.c_uint8), h, w,
                                  _ptr(buf, ctypes.c_uint32), buf.size)
        assert n > 0
        return buf[:n].copy()
    # numpy fallback: column-major flatten, run-length encode
    flat = mask.flatten(order="F")
    changes = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(bounds).astype(np.uint32)
    if flat[0] == 1:
        counts = np.concatenate([[np.uint32(0)], counts])
    return counts


def counts_to_mask(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load_native()
    if lib is not None:
        out = np.empty((h, w), np.uint8)
        lib.rle_decode_counts(_ptr(counts, ctypes.c_uint32),
                              len(counts), h, w, _ptr(out, ctypes.c_uint8))
        return out
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    flat = np.pad(flat, (0, h * w - flat.size))
    return flat.reshape(w, h).T.copy()


def counts_to_string(counts: np.ndarray) -> bytes:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load_native()
    if lib is not None:
        buf = ctypes.create_string_buffer(len(counts) * 8 + 16)
        n = lib.rle_counts_to_string(_ptr(counts, ctypes.c_uint32),
                                     len(counts), buf, len(buf))
        assert n >= 0
        return buf.raw[:n]
    out = bytearray()
    prev2 = [0, 0]
    for i, c in enumerate(counts.astype(np.int64)):
        x = int(c) - (int(counts[i - 2]) if i > 2 else 0)
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(ch + 48)
    return bytes(out)


def string_to_counts(s: bytes) -> np.ndarray:
    lib = _load_native()
    if lib is not None:
        buf = np.empty(len(s) + 1, np.uint32)
        n = lib.rle_string_to_counts(s, len(s), _ptr(buf, ctypes.c_uint32),
                                     buf.size)
        assert n >= 0
        return buf[:n].copy()
    counts = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more and p < len(s):
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = (c & 0x20) != 0
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


def encode(mask: np.ndarray) -> dict:
    """Binary mask -> COCO RLE dict {"size": [h, w], "counts": bytes}."""
    h, w = mask.shape
    return {"size": [h, w], "counts": counts_to_string(mask_to_counts(mask))}


def decode(rle: dict) -> np.ndarray:
    """COCO RLE dict -> binary (H, W) uint8 mask. Accepts compressed
    (bytes/str counts) or uncompressed (list of ints) RLE, like the
    reference's cocosegm2mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, str):
            counts = counts.encode()
        counts = string_to_counts(counts)
    else:
        counts = np.asarray(counts, np.uint32)
    return counts_to_mask(counts, h, w)


def area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts.encode() if isinstance(counts, str)
                                  else counts)
    return int(counts[1::2].sum())
