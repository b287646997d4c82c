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
import sys
import tempfile
import threading
from typing import List, Optional

import numpy as np

# Formats native/decode.cpp actually recognizes (by magic bytes). Anything
# else in a batch — .bmp/.webp are admitted by IMAGE_EXTS — is decoded via
# PIL inside decode_batch, NOT black-filled by the native failure path.
NATIVE_EXTS = (".jpg", ".jpeg", ".png")

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
        # per-process temp name: concurrent first-use builds (pytest
        # workers, parallel trainers) must not clobber each other's
        # partially-written output before the atomic publish
        fd, tmp_path = tempfile.mkstemp(dir=_BUILD_DIR, suffix=".so.tmp")
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", tmp_path, _SRC, "-ljpeg", "-lpng", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            os.replace(tmp_path, so_path)
        except (OSError, subprocess.SubprocessError):
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            return None
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


def _pil_decode_into(out: np.ndarray, paths: List[str],
                     idx: List[int], size: int) -> None:
    """PIL-decode ``paths[i] for i in idx`` into ``out`` rows (the same
    convert→BILINEAR-resize semantics as the pure-PIL call sites; corrupt
    files stay black — reference data/image_dataset.py:125-130)."""
    from PIL import Image

    for i in idx:
        try:
            with Image.open(paths[i]) as im:
                im = im.convert("RGB").resize((size, size), Image.BILINEAR)
                out[i] = np.asarray(im, np.uint8)
        except Exception:
            pass


def decode_batch(paths: List[str], size: int,
                 n_threads: Optional[int] = None) -> np.ndarray:
    """Decode ``paths`` → (N, size, size, 3) uint8; corrupt files black.

    JPEG/PNG go through the native thread pool; other formats the C++
    decoder does not recognize (.bmp/.webp) are routed to PIL within the
    same call, so mixed-format datasets decode correctly. Native decode
    failures (beyond the deliberate corrupt-file black fallback they
    share with the reference) are reported to stderr.

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
    native_idx = [i for i, p in enumerate(paths)
                  if p.lower().endswith(NATIVE_EXTS)]
    threads = n_threads or min(os.cpu_count() or 1, 16)
    if len(native_idx) == n:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.fervit_decode_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, threads,
        )
    elif native_idx:
        sub = [paths[i] for i in native_idx]
        tmp = np.zeros((len(sub), size, size, 3), np.uint8)
        arr = (ctypes.c_char_p * len(sub))(*[p.encode() for p in sub])
        failures = lib.fervit_decode_batch(
            arr, len(sub), tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, threads,
        )
        out[native_idx] = tmp
    else:
        failures = 0
    other_idx = sorted(set(range(n)) - set(native_idx))
    if other_idx:
        _pil_decode_into(out, paths, other_idx, size)
    if failures:
        print(f"native decode: {failures}/{len(native_idx)} files failed "
              "(black-image fallback)", file=sys.stderr)
    return out
