"""ctypes binding for the native compressed-video shim (``_video_codecs.cpp``).

Counterpart of the reference's ``torchvision.io.video_reader`` extension
loader (``io/__init__.py:15-27``, ``csrc/io/video_reader/video_reader.cpp``):
auto-builds the shared object against the system libavformat/libavcodec/
libswscale on first use and exposes flat decode/encode/probe calls over
NumPy buffers.  Every public function raises ``RuntimeError`` when the
toolchain or ffmpeg dev libraries are absent — callers gate on
``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_U8P = ctypes.POINTER(ctypes.c_uint8)
_DP = ctypes.POINTER(ctypes.c_double)
_FP = ctypes.POINTER(ctypes.c_float)

_FFMPEG_LIBS = ["-lavformat", "-lavcodec", "-lswscale", "-lswresample", "-lavutil"]


def _so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_video_codecs.so")


def _build_shim() -> bool:
    src = os.path.join(os.path.dirname(__file__), "_video_codecs.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _so_path(), src, *_FFMPEG_LIBS],
            check=True,
            capture_output=True,
            timeout=180,
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
    if os.environ.get("CVT_USE_NATIVE_VIDEO", "1") == "0":  # feature flag (see image.py)
        return None
    path = _so_path()
    if not os.path.exists(path) and not _build_shim():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.cvt_video_decode.restype = ctypes.c_int
    lib.cvt_video_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(_U8P), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(_DP),
    ]
    lib.cvt_video_timestamps.restype = ctypes.c_int
    lib.cvt_video_timestamps.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(_DP), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.cvt_video_encode.restype = ctypes.c_int
    lib.cvt_video_encode.argtypes = [
        ctypes.c_char_p, _U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.cvt_video_encode_av.restype = ctypes.c_int
    lib.cvt_video_encode_av.argtypes = [
        ctypes.c_char_p, _U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_char_p, ctypes.c_int,
        _FP, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
    ]
    lib.cvt_audio_decode.restype = ctypes.c_int
    lib.cvt_audio_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(_FP), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cvt_video_free.restype = None
    lib.cvt_video_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    """True iff the ffmpeg shim is built (or buildable) and loadable."""
    return _load_lib() is not None


def _require():
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "the native ffmpeg shim (_video_codecs.so) is unavailable: "
            "libavformat/libavcodec dev libraries or a C++ toolchain are "
            "missing from this host")
    return lib


def decode_video(
    path: str, start_sec: float = 0.0, end_sec: Optional[float] = None
) -> Tuple[np.ndarray, float, List[float]]:
    """Decode frames with pts in [start_sec, end_sec] → (THWC uint8 RGB,
    fps, per-frame pts seconds)."""
    lib = _require()
    out = _U8P()
    t = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    fps = ctypes.c_double()
    pts = _DP()
    rc = lib.cvt_video_decode(
        os.fsencode(path), ctypes.c_double(start_sec),
        ctypes.c_double(-1.0 if end_sec is None else end_sec),
        ctypes.byref(out), ctypes.byref(t), ctypes.byref(h), ctypes.byref(w),
        ctypes.byref(fps), ctypes.byref(pts),
    )
    if rc != 0:
        raise RuntimeError(f"ffmpeg decode of {path!r} failed (code {rc})")
    try:
        video = np.ctypeslib.as_array(out, shape=(t.value, h.value, w.value, 3)).copy()
        pts_list = [pts[i] for i in range(t.value)]
    finally:
        lib.cvt_video_free(out)
        lib.cvt_video_free(pts)
    return video, float(fps.value), pts_list


def video_timestamps(path: str) -> Tuple[List[float], float]:
    """Demux-only pts scan → (sorted pts seconds, fps)."""
    lib = _require()
    pts = _DP()
    n = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.cvt_video_timestamps(os.fsencode(path), ctypes.byref(pts),
                                  ctypes.byref(n), ctypes.byref(fps))
    if rc != 0:
        raise RuntimeError(f"ffmpeg probe of {path!r} failed (code {rc})")
    try:
        out = [pts[i] for i in range(n.value)]
    finally:
        lib.cvt_video_free(pts)
    return out, float(fps.value)


def encode_video(
    path: str, frames: np.ndarray, fps: float, codec: str = "libx264",
    crf: int = 23,
) -> None:
    """Encode (T, H, W, 3) uint8 RGB into ``path`` (container chosen from
    the extension).  codec: 'libx264' | 'mpeg4' | 'mjpeg'."""
    lib = _require()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"frames must be (T, H, W, 3) uint8, got {frames.shape}")
    t, h, w = frames.shape[:3]
    if codec != "mjpeg" and (h % 2 or w % 2):
        raise ValueError(
            f"codec {codec!r} encodes yuv420p, which needs even frame "
            f"dimensions; got {h}x{w}")
    rc = lib.cvt_video_encode(
        os.fsencode(path), frames.ctypes.data_as(_U8P), t, h, w,
        ctypes.c_double(fps), codec.encode("ascii"), crf,
    )
    if rc != 0:
        raise RuntimeError(
            f"ffmpeg encode to {path!r} with codec {codec!r} failed (code {rc})")


def encode_video_av(
    path: str, frames: np.ndarray, fps: float, audio: np.ndarray,
    audio_rate: int, codec: str = "libx264", crf: int = 23,
) -> None:
    """Encode video + one AAC audio stream.  ``audio`` is (channels,
    samples) float32 (the shape ``read_video``/``decode_audio`` return)."""
    lib = _require()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w = frames.shape[:3]
    if codec != "mjpeg" and (h % 2 or w % 2):
        raise ValueError(f"codec {codec!r} needs even frame dims; got {h}x{w}")
    audio = np.asarray(audio, np.float32)
    if audio.ndim != 2:
        raise ValueError(f"audio must be (channels, samples), got {audio.shape}")
    interleaved = np.ascontiguousarray(audio.T)  # (samples, channels)
    rc = lib.cvt_video_encode_av(
        os.fsencode(path), frames.ctypes.data_as(_U8P), t, h, w,
        ctypes.c_double(fps), codec.encode("ascii"), crf,
        interleaved.ctypes.data_as(_FP), interleaved.shape[0],
        interleaved.shape[1], int(audio_rate),
    )
    if rc != 0:
        raise RuntimeError(
            f"ffmpeg audio+video encode to {path!r} failed (code {rc})")


def decode_audio(path: str) -> Tuple[np.ndarray, int]:
    """Best audio stream → ((channels, samples) float32, sample_rate).
    Raises RuntimeError when the container has no audio stream."""
    lib = _require()
    out = _FP()
    ch = ctypes.c_int()
    ns = ctypes.c_longlong()
    rate = ctypes.c_int()
    rc = lib.cvt_audio_decode(os.fsencode(path), ctypes.byref(out),
                              ctypes.byref(ch), ctypes.byref(ns), ctypes.byref(rate))
    if rc != 0:
        raise RuntimeError(f"ffmpeg audio decode of {path!r} failed (code {rc})")
    try:
        flat = np.ctypeslib.as_array(out, shape=(ns.value * ch.value,)).copy()
    finally:
        lib.cvt_video_free(out)
    return flat.reshape(ns.value, ch.value).T.copy(), int(rate.value)
