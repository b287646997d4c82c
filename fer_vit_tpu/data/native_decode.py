"""ctypes bindings for the native batch image decoder (native/decode.cpp).

The reference decodes per-sample with PIL in DataLoader worker processes
(reference: data/generate_latents.py:66-73, data/image_dataset.py:117-130);
here the host-side decode is a C++ thread-pool library (libjpeg/libpng +
PIL-compatible triangle resampling) so feeding the TPU never bottlenecks on
Python. Built on demand with g++ and cached under ``native/build/``;
:func:`available` gates every call site, which falls back to PIL when the
toolchain or image libraries are missing.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "decode.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"libfervit_decode_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", so_path + ".tmp", _SRC, "-ljpeg", "-lpng", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(so_path + ".tmp", so_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.fervit_decode_batch.restype = ctypes.c_int
    lib.fervit_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build_and_load()
            _tried = True
    return _lib


def available() -> bool:
    """True if the native decoder built and loaded (g++ + libjpeg/libpng)."""
    return _get_lib() is not None


def decode_batch(paths: List[str], size: int,
                 n_threads: Optional[int] = None) -> np.ndarray:
    """Decode ``paths`` → (N, size, size, 3) uint8; corrupt files black.

    Raises RuntimeError if the native library is unavailable — call sites
    check :func:`available` and fall back to PIL.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    if n == 0:
        return out
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = n_threads or min(os.cpu_count() or 1, 16)
    lib.fervit_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, size, threads,
    )
    return out
