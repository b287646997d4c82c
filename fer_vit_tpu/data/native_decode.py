"""ctypes bindings for the native batch image decoder
(fer_vit_tpu/native_src/decode.cpp).

The reference decodes per-sample with PIL in DataLoader worker processes
(reference: data/generate_latents.py:66-73, data/image_dataset.py:117-130);
here the host-side decode is a C++ thread-pool library (libjpeg/libpng +
PIL-compatible triangle resampling) so feeding the TPU never bottlenecks on
Python. The source ships as package data (so installed checkouts keep it),
is built on demand with g++, and cached under ``~/.cache/fer_vit_tpu``;
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

# Formats fer_vit_tpu/native_src/decode.cpp actually recognizes (by magic bytes). Anything
# else in a batch — .bmp/.webp are admitted by IMAGE_EXTS — is decoded via
# PIL inside decode_batch, NOT black-filled by the native failure path.
NATIVE_EXTS = (".jpg", ".jpeg", ".png")

_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_PKG, "native_src", "decode.cpp")


def _default_build_dir() -> str:
    # Site-packages may be read-only for installed checkouts; cache the
    # built .so per-user instead (hash-tagged, so versions never collide).
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "fer_vit_tpu", "native_build")


_BUILD_DIR = os.environ.get("FERVIT_NATIVE_BUILD_DIR", _default_build_dir())

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
                     idx: List[int], size: int) -> int:
    """PIL-decode ``paths[i] for i in idx`` into ``out`` rows (the same
    convert→BILINEAR-resize semantics as the pure-PIL call sites; corrupt
    files stay black — reference data/image_dataset.py:125-130). Returns
    the number of failed decodes so both routes report consistently."""
    from PIL import Image

    failures = 0
    for i in idx:
        try:
            with Image.open(paths[i]) as im:
                im = im.convert("RGB").resize((size, size), Image.BILINEAR)
                out[i] = np.asarray(im, np.uint8)
        except Exception:
            failures += 1
    return failures


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
    if failures:
        # the native ABI reports a failure COUNT, not which files — and
        # some failures are content PIL handles fine (CMYK JPEGs, WebP
        # bytes behind a .jpg extension). Re-decode the whole native
        # subset with PIL (rare path, ≤1 batch of files) so only files
        # BOTH decoders reject stay black, like the pure-PIL route.
        failures = _pil_decode_into(out, paths, native_idx, size)
    other_idx = sorted(set(range(n)) - set(native_idx))
    pil_failures = 0
    if other_idx:
        pil_failures = _pil_decode_into(out, paths, other_idx, size)
    if failures or pil_failures:
        print(f"decode: {failures}/{len(native_idx)} native(+PIL-retry) + "
              f"{pil_failures}/{len(other_idx)} PIL files failed "
              "(black-image fallback)", file=sys.stderr)
    return out
