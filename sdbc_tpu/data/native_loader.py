"""ctypes bindings for the native C++ decode/resize core (native/loader.cc).

Auto-builds the shared library on first use (make -C native) and falls back
to the PIL path (utils.image.decode_and_prepare) when unavailable, so the
framework never hard-depends on the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(os.path.dirname(_PKG_DIR), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsdbc_loader.so")

_lib = None
_lib_lock = threading.Lock()


def _find_lib() -> Optional[str]:
    """Search order: SDBC_NATIVE_LIB env → installed package copy
    (sdbc_tpu/_native/, placed there by setup.py) → repo-layout native/
    (auto-built via make on first use)."""
    env = os.environ.get("SDBC_NATIVE_LIB")
    if env:
        if not os.path.exists(env):
            import warnings

            warnings.warn(f"SDBC_NATIVE_LIB={env} does not exist — native "
                          "decode disabled, falling back to PIL (~10x "
                          "slower)", stacklevel=3)
            return None
        return env
    installed = os.path.join(_PKG_DIR, "_native", "libsdbc_loader.so")
    if os.path.exists(installed):
        return installed
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _find_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.sdbc_decode_batch.restype = ctypes.c_int
        lib.sdbc_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.sdbc_decode_probe.restype = ctypes.c_int
        lib.sdbc_decode_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], size: int,
                 threads: int = 4) -> np.ndarray:
    """Decode+resize+normalize a batch of JPEGs → (N, size, size, 3) float32.

    Failed decodes come back as zero images, and a nonzero failure count is
    warned (training on silent mid-gray samples otherwise goes unnoticed);
    use probe() for hard integrity checks.

    ``threads`` is clamped to the host's core count — on a single-core
    host extra decode threads measurably HURT (experiments/
    r5_loader_bench.py: t1 253 img/s vs t2 197 on this image's builder),
    and callers default to the reference's 4 workers (utils.py:174).
    """
    import warnings

    threads = max(1, min(threads, os.cpu_count() or 1))

    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    if lib is None:
        from sdbc_tpu.utils.image import decode_and_prepare

        failures = 0
        for i, p in enumerate(paths):
            try:
                out[i] = decode_and_prepare(p, size)
            except Exception:
                out[i] = 0.0
                failures += 1
    else:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.sdbc_decode_batch(
            arr, n, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            threads)
    if failures:
        warnings.warn(f"{failures}/{n} images failed to decode and were "
                      "zero-filled (run the preprocess integrity check)",
                      stacklevel=2)
    return out


def probe_size(path: str):
    """(W, H) if the image decodes cleanly (FULL decode, not a header
    read — a truncated body must fail), else None."""
    lib = _load()
    if lib is None:
        from PIL import Image

        try:
            with Image.open(path) as im:
                im.convert("RGB")  # forces the full decode
                return im.size
        except Exception:
            return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.sdbc_decode_probe(path.encode(), ctypes.byref(w),
                             ctypes.byref(h)) == 0:
        return (w.value, h.value)
    return None


def probe(path: str) -> bool:
    """True if the JPEG decodes cleanly (preprocess integrity check)."""
    return probe_size(path) is not None
