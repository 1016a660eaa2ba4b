"""ctypes bindings for the C++ host-runtime (native/svt_native.cpp).

Build-on-first-use with graceful pure-Python fallback: every entry point has
identical numpy semantics without the library, so nothing hard-depends on a
compiler being present. Use ``available()`` to check, ``require()`` to force.

Covered hot paths (all host-side — device compute is JAX/XLA/Pallas):
  * gather_patches: threaded normalize+gather for the offline ETL;
  * decode_gzip_base64: GIFTI <Data> payload decode;
  * f32_to_bf16: dataset staging to bf16 before device upload.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsvt_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libsvt_native.so"],
            cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and os.environ.get("SVT_NO_NATIVE_BUILD") != "1":
            _build()
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.svt_gather_patches.restype = ctypes.c_int
        lib.svt_gather_patches.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.svt_decode_gzip_base64.restype = ctypes.c_int64
        lib.svt_decode_gzip_base64.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.svt_f32_to_bf16.restype = None
        lib.svt_f32_to_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.svt_set_threads.argtypes = [ctypes.c_int]
        if hasattr(lib, "svt_gather_rows"):  # v2+ (rebuilt libraries)
            lib.svt_gather_rows.restype = ctypes.c_int
            lib.svt_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def set_threads(n: int) -> None:
    lib = _load()
    if lib is not None:
        lib.svt_set_threads(int(n))


def gather_patches(
    data: np.ndarray,
    indices: np.ndarray,
    means: np.ndarray | None = None,
    stds: np.ndarray | None = None,
) -> np.ndarray:
    """(N, C, G) float32 + (L, V) int32 -> normalized (N, C, L, V) float32."""
    data = np.ascontiguousarray(data, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    N, C, G = data.shape
    L, V = indices.shape
    m = None if means is None else np.ascontiguousarray(means, np.float32).reshape(-1)
    s = None if stds is None else np.ascontiguousarray(stds, np.float32).reshape(-1)

    lib = _load()
    if lib is None:  # pure-numpy fallback
        out = data[:, :, indices]
        if m is not None:
            out = (out - m.reshape(1, C, 1, 1)) / s.reshape(1, C, 1, 1)
        return np.ascontiguousarray(out)

    out = np.empty((N, C, L, V), np.float32)
    rc = lib.svt_gather_patches(
        data.ctypes.data, indices.ctypes.data,
        None if m is None else m.ctypes.data,
        None if s is None else s.ctypes.data,
        out.ctypes.data, N, C, G, L, V,
    )
    if rc != 0:
        raise RuntimeError(f"svt_gather_patches failed rc={rc}")
    return out


def decode_gzip_base64(payload: str | bytes, out_bytes: int) -> bytes:
    """base64 -> inflate; returns exactly the decompressed bytes."""
    if isinstance(payload, str):
        payload = payload.encode("ascii")
    lib = _load()
    if lib is None:
        import base64
        import zlib

        return zlib.decompress(base64.b64decode(payload), zlib.MAX_WBITS | 32)
    buf = ctypes.create_string_buffer(out_bytes)
    n = lib.svt_decode_gzip_base64(payload, len(payload), buf, out_bytes)
    if n == -2:
        raise ValueError("output buffer too small")
    if n < 0:
        raise ValueError("corrupt base64/zlib payload")
    return buf.raw[:n]


_ROW_DTYPES = {np.dtype(np.float32): 0, np.dtype(np.float64): 1,
               np.dtype(np.float16): 2}


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Batch assembly for the streaming pipeline: float32 out[i] = src[idx[i]]
    with the dtype cast fused in (f32 memcpy / f64 narrowing / f16 widening).
    Threaded over rows — on a memmap the per-thread page faults overlap the
    disk reads, where numpy fancy indexing is serial. Falls back to numpy."""
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _load()
    row_shape = src.shape[1:]
    if (
        lib is None
        or not hasattr(lib, "svt_gather_rows")
        or src.dtype not in _ROW_DTYPES
        or not src.flags["C_CONTIGUOUS"]
    ):
        return np.ascontiguousarray(src[idx]).astype(np.float32, copy=False)
    out = np.empty((idx.shape[0], *row_shape), np.float32)
    rc = lib.svt_gather_rows(
        src.ctypes.data, _ROW_DTYPES[src.dtype], idx.ctypes.data,
        idx.shape[0], int(np.prod(row_shape, dtype=np.int64)),
        out.ctypes.data,
    )
    if rc != 0:
        raise RuntimeError(f"svt_gather_rows failed rc={rc}")
    return out


def f32_to_bf16(x: np.ndarray) -> np.ndarray:
    """fp32 -> bf16 (round-to-nearest-even), returned as uint16 bit pattern
    viewable as ml_dtypes.bfloat16."""
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        bits = x.view(np.uint32)
        lsb = (bits >> 16) & 1
        rounded = bits + 0x7FFF + lsb
        return (rounded >> 16).astype(np.uint16).reshape(x.shape)
    out = np.empty(x.shape, np.uint16)
    lib.svt_f32_to_bf16(x.ctypes.data, out.ctypes.data, x.size)
    return out
