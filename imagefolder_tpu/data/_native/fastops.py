"""ctypes binding for the native data ops (fastops.cc), compiled on demand
with g++ into a per-user cache dir. Falls back to numpy if the toolchain is
unavailable — callers check ``native_available()``."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "fastops.cc"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(tempfile.gettempdir()) / f"imagefolder_tpu_native_{os.getuid()}"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"fastops_{tag}.so"
    if not so.exists():
        # per-pid temp name: grain workers may race to build concurrently
        tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               str(_SRC), "-o", str(tmp)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        except Exception:
            return None
    lib = ctypes.CDLL(str(so))
    lib.crop_flip_normalize.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
    lib.normalize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def crop_flip_normalize(arr_u8: np.ndarray, oy: int, ox: int, size: int,
                        flip: bool) -> np.ndarray:
    """uint8 HWC -> float32 (size, size, 3) in [-1, 1]; fused single pass."""
    lib = _lib()
    if lib is None:  # numpy fallback
        c = arr_u8[oy:oy + size, ox:ox + size]
        if flip:
            c = c[:, ::-1]
        return np.ascontiguousarray(c, np.float32) / 255.0 * 2.0 - 1.0
    arr_u8 = np.ascontiguousarray(arr_u8)
    out = np.empty((size, size, 3), np.float32)
    lib.crop_flip_normalize(
        arr_u8.ctypes.data, arr_u8.shape[0], arr_u8.shape[1],
        oy, ox, size, int(bool(flip)), out.ctypes.data)
    return out
