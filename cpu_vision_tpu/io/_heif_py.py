"""ctypes binding for the HEIC/AVIF shim (``_heif.cpp`` over the system
libheif — counterpart of the reference's ``decode_heic.cpp`` /
``decode_avif.cpp``, both build-flag gated there, ``setup.py:16-33``).
Auto-builds against the versioned ``libheif.so.1`` (no dev package on this
host); ``available()`` gates callers."""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False
_U8P = ctypes.POINTER(ctypes.c_uint8)

HEVC, AV1 = 0, 1  # cvt_encode_heif format codes


def _so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_heif.so")


def _find_libheif() -> Optional[str]:
    for pattern in ("/usr/lib/*/libheif.so*", "/usr/lib/libheif.so*",
                    "/usr/local/lib/libheif.so*"):
        hits = sorted(glob.glob(pattern))
        if hits:
            return hits[0]
    return None


def _build_shim() -> bool:
    src = os.path.join(os.path.dirname(__file__), "_heif.cpp")
    libheif = _find_libheif()
    if libheif is None:
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _so_path(), src, libheif],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    import os
    if os.environ.get("CVT_USE_NATIVE_HEIF", "1") == "0":  # feature flag (see image.py)
        return None
    if not os.path.exists(_so_path()) and not _build_shim():
        return None
    try:
        lib = ctypes.CDLL(_so_path())
    except OSError:
        return None
    lib.cvt_decode_heif.restype = ctypes.c_int
    lib.cvt_decode_heif.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_U8P),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cvt_encode_heif.restype = ctypes.c_int
    lib.cvt_encode_heif.argtypes = [
        ctypes.c_char_p, _U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.cvt_heif_free.restype = None
    lib.cvt_heif_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load_lib() is not None


def decode(data: bytes) -> np.ndarray:
    """HEIC or AVIF bytes -> HWC uint8 RGB(A)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "HEIC/AVIF decode needs the libheif shim, which could not be "
            "built on this host (no libheif.so found)")
    out = _U8P()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.cvt_decode_heif(data, len(data), ctypes.byref(out),
                             ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"HEIC/AVIF decode failed (code {rc})")
    try:
        return np.ctypeslib.as_array(out, shape=(h.value, w.value, c.value)).copy()
    finally:
        lib.cvt_heif_free(out)


def encode(path: str, rgb: np.ndarray, fmt: int = AV1, quality: int = 90) -> None:
    """Encode HWC uint8 RGB to ``path`` (fmt: HEVC -> .heic, AV1 -> .avif)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("HEIC/AVIF encode needs the libheif shim")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[-1] != 3:
        raise ValueError(f"expected HWC RGB uint8, got {rgb.shape}")
    rc = lib.cvt_encode_heif(os.fsencode(path), rgb.ctypes.data_as(_U8P),
                             rgb.shape[0], rgb.shape[1], fmt, quality)
    if rc != 0:
        raise ValueError(f"HEIC/AVIF encode failed (code {rc})")
