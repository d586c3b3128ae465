"""Video IO (reference ``torchvision/io/video.py`` + ``video_reader.py``).

The container layer has two native tiers:

* **Compressed codecs** (h264/hevc/mpeg4/vp9 mp4/mkv/mov, non-MJPEG AVI):
  the C++ ffmpeg shim ``_video_codecs.cpp`` (counterpart of the reference's
  ``csrc/io/decoder/decoder.cpp`` + ``csrc/io/video_reader``) decodes on
  the host through the system libavformat/libavcodec/libswscale into
  contiguous THWC RGB uint8, with demux-only pts probing, h264/mpeg4/mjpeg
  *encode*, and best-audio-stream decode to float32.
* **Self-contained layouts**, decoded without ffmpeg at all:
  MJPEG-AVI (pure-Python RIFF parser/writer around the package's native
  JPEG codec), ``.npy`` / ``.npz`` raw THWC uint8 arrays, and frame
  directories of numbered images.

``read_video`` / ``write_video`` / ``read_video_timestamps`` follow the
reference's contracts (``video.py:236-334``, ``video.py:48-129``);
``VideoReader`` the streaming API (``video_reader.py:57-285``).  PyAV is a
final optional fallback when the shim cannot be built.
"""

from __future__ import annotations

import io as _io
import os
import struct
from fractions import Fraction
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from .image import decode_image, decode_jpeg, encode_jpeg

__all__ = [
    "read_video",
    "write_video",
    "read_video_timestamps",
    "VideoReader",
    "VideoMetaData",
    "Timebase",
]


class Timebase:
    """(reference ``io/_video_opt.py:Timebase``)."""

    def __init__(self, numerator: int = 0, denominator: int = 1):
        self.numerator = numerator
        self.denominator = denominator


class VideoMetaData:
    """(reference ``io/_video_opt.py:VideoMetaData``)."""

    def __init__(self):
        self.has_video = False
        self.video_timebase = Timebase(0, 1)
        self.video_duration = 0.0
        self.video_fps = 0.0
        self.has_audio = False
        self.audio_timebase = Timebase(0, 1)
        self.audio_duration = 0.0
        self.audio_sample_rate = 0.0


# ------------------------------------------------------------------ AVI read


def _iter_riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF body."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse_avi(data: bytes) -> Tuple[List[bytes], float]:
    """Return (list of per-frame JPEG bytes, fps) from an MJPEG AVI."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise RuntimeError("not an AVI (RIFF/'AVI ') file")
    frames: List[bytes] = []
    fps = 0.0
    micro_per_frame = 0
    handler = b""

    def walk(start: int, end: int):
        nonlocal fps, micro_per_frame, handler
        for fourcc, p, size in _iter_riff_chunks(data, start, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)  # skip the list-type fourcc
            elif fourcc == b"avih" and size >= 4:
                (micro_per_frame,) = struct.unpack("<I", data[p : p + 4])
            elif fourcc == b"strh" and size >= 32:
                fcc_type = data[p : p + 4]
                if fcc_type == b"vids":
                    handler = data[p + 4 : p + 8]
                    scale, rate = struct.unpack("<II", data[p + 20 : p + 28])
                    if scale:
                        fps = rate / scale
            elif fourcc[2:] in (b"dc", b"db") and size > 0:
                frames.append(data[p : p + size])

    walk(12, len(data))
    if handler.upper() not in (b"MJPG", b"JPEG", b"\x00\x00\x00\x00", b""):
        # a compressed-codec AVI (XVID, DIVX, ...): route to the ffmpeg shim
        raise RuntimeError(
            f"AVI vids handler {handler!r} is not MJPEG; needs the ffmpeg shim")
    if not fps and micro_per_frame:
        fps = 1e6 / micro_per_frame
    return frames, fps or 30.0


def _decode_avi(path: str) -> Tuple[np.ndarray, float]:
    with open(path, "rb") as f:
        data = f.read()
    chunks, fps = _parse_avi(data)
    if not chunks:
        raise RuntimeError(f"no video frames found in {path}")
    frames = [decode_jpeg(c) for c in chunks]
    return np.stack(frames), fps


# ----------------------------------------------------------------- AVI write


def _fourcc(s: str) -> bytes:
    return s.encode("ascii")


def _chunk(fourcc: str, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return _fourcc(fourcc) + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: str, payload: bytes) -> bytes:
    body = _fourcc(list_type) + payload
    return _chunk("LIST", body)


def _encode_avi(path: str, video: np.ndarray, fps: float, quality: int = 90) -> None:
    t, h, w = video.shape[:3]
    jpegs = [encode_jpeg(video[i], quality=quality) for i in range(t)]
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(round(1e6 / fps)),  # dwMicroSecPerFrame
        int(max_size * fps),    # dwMaxBytesPerSec
        0,                      # dwPaddingGranularity
        0x10,                   # dwFlags: AVIF_HASINDEX
        t, 0, 1,                # totalframes, initialframes, streams
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        _fourcc("vids") + _fourcc("MJPG")
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                      # rational time base preserves NTSC-style rates
                      1000, int(round(fps * 1000)),  # dwScale, dwRate
                      0, t, max_size, 0, -1)
        + struct.pack("<4H", 0, 0, w, h)         # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list("hdrl", _chunk("avih", avih)
                 + _list("strl", _chunk("strh", strh) + _chunk("strf", strf)))

    movi_payload = b""
    index = b""
    for j in jpegs:
        offset = 4 + len(movi_payload)  # relative to the 'movi' fourcc
        movi_payload += _chunk("00dc", j)
        index += _fourcc("00dc") + struct.pack("<III", 0x10, offset, len(j))
    movi = _list("movi", movi_payload)
    idx1 = _chunk("idx1", index)

    body = _fourcc("AVI ") + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(_fourcc("RIFF") + struct.pack("<I", len(body)) + body)


# -------------------------------------------------------------- other layouts


def _decode_array_file(path: str) -> Tuple[np.ndarray, float]:
    if path.endswith(".npz"):
        z = np.load(path)
        key = next((k for k in z.files if k != "fps"), None)
        if key is None:
            raise RuntimeError(f"no video array in {path}")
        fps = float(z["fps"]) if "fps" in z.files else 30.0
        return np.asarray(z[key]), fps
    return np.asarray(np.load(path)), 30.0


def _decode_frame_dir(path: str) -> Tuple[np.ndarray, float]:
    names = sorted(
        n for n in os.listdir(path)
        if n.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
    if not names:
        raise RuntimeError(f"no frame images in {path}")
    frames = [decode_image(os.path.join(path, n)) for n in names]
    return np.stack(frames), 30.0


def _decode_pyav(filename: str) -> Tuple[np.ndarray, float]:
    """Host-side compressed-video decode through PyAV when importable —
    covers h264/hevc mp4 (Kinetics/UCF as published), the counterpart of the
    reference's pyav backend (``io/video.py:236``).  Raises ImportError when
    the library is absent (clean gate, like a reference build without
    ffmpeg)."""
    import av  # gated optional dependency

    with av.open(filename) as container:
        stream = container.streams.video[0]
        fps = float(stream.average_rate) if stream.average_rate else 30.0
        frames = [f.to_ndarray(format="rgb24") for f in container.decode(stream)]
    if not frames:
        raise RuntimeError(f"no video frames found in {filename}")
    return np.stack(frames), fps


def _decode_ffmpeg(filename: str) -> Tuple[np.ndarray, float]:
    """Compressed-codec decode through the native C++ ffmpeg shim
    (``_video_codecs.cpp``, counterpart of ``csrc/io/decoder``)."""
    from . import _ffmpeg

    video, fps, _pts = _ffmpeg.decode_video(filename)
    return video, fps or 30.0


def _decode_any(filename: str) -> Tuple[np.ndarray, float]:
    if os.path.isdir(filename):
        return _decode_frame_dir(filename)
    if filename.endswith((".npy", ".npz")):
        return _decode_array_file(filename)
    try:
        return _decode_avi(filename)
    except RuntimeError as avi_err:
        # not our native MJPEG-AVI container: compressed codecs go through
        # the C++ ffmpeg shim, then PyAV as a last optional fallback
        from . import _ffmpeg

        if _ffmpeg.available():
            return _decode_ffmpeg(filename)
        try:
            return _decode_pyav(filename)
        except ImportError:
            raise RuntimeError(
                f"{avi_err}; compressed codecs (h264 et al.) need the native "
                f"ffmpeg shim (unbuildable on this host) or the optional "
                f"PyAV backend, neither of which is available") from avi_err


# ------------------------------------------------------------------- public


def read_video(
    filename: str,
    start_pts: Union[float, Fraction] = 0,
    end_pts: Optional[Union[float, Fraction]] = None,
    pts_unit: str = "pts",
    output_format: str = "THWC",
) -> Tuple[np.ndarray, np.ndarray, Dict[str, Any]]:
    """Read video frames + (empty) audio + info (reference
    ``io/video.py:read_video``).  ``pts`` for these intra-only backends is
    the frame index; ``sec`` converts through the container fps."""
    output_format = output_format.upper()
    if output_format not in ("THWC", "TCHW"):
        raise ValueError(
            f"output_format should be either 'THWC' or 'TCHW', got {output_format}.")
    if not os.path.exists(filename):
        raise RuntimeError(f"File not found: {filename}")

    video, fps = _decode_any(filename)
    t = video.shape[0]
    if pts_unit == "sec":
        # keep only frames whose pts lies WITHIN [start_pts, end_pts]
        # (reference semantics): ceil the start, floor the end (eps for fp)
        start = int(np.ceil(float(start_pts) * fps - 1e-9))
        end = t - 1 if end_pts is None else int(np.floor(float(end_pts) * fps + 1e-9))
    else:
        start = int(start_pts)
        end = t - 1 if end_pts is None else int(end_pts)
    if end < start:
        raise ValueError(
            f"end_pts should be larger than start_pts, got start_pts={start_pts} "
            f"and end_pts={end_pts}")
    video = video[start : end + 1]
    if output_format == "TCHW":
        video = np.transpose(video, (0, 3, 1, 2))

    # audio rides the ffmpeg shim (self-contained layouts carry none),
    # sliced to the same [start, end] window (reference io/video.py:305-320)
    aframes = np.empty((1, 0), np.float32)
    info: Dict[str, Any] = {"video_fps": fps}
    if not os.path.isdir(filename) and not filename.endswith((".npy", ".npz")):
        from . import _ffmpeg

        if _ffmpeg.available():
            try:
                aframes, rate = _ffmpeg.decode_audio(filename)
                info["audio_fps"] = rate
                s0 = int(round(start / fps * rate))
                s1 = aframes.shape[1] if end >= t - 1 else int(round((end + 1) / fps * rate))
                aframes = aframes[:, s0:s1]
            except RuntimeError:
                pass  # no audio stream (or no shim decode for this container)
    return video, aframes, info


def _probe_any(filename: str) -> Tuple[int, float]:
    """(frame count, fps) without decoding pixel data (container scan)."""
    if os.path.isdir(filename):
        n = sum(1 for f in os.listdir(filename)
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
        return n, 30.0
    if filename.endswith(".npy"):
        return np.load(filename, mmap_mode="r").shape[0], 30.0
    if filename.endswith(".npz"):
        return _decode_array_file(filename)[0].shape[0], 30.0
    try:
        with open(filename, "rb") as f:
            chunks, fps = _parse_avi(f.read())
        return len(chunks), fps
    except RuntimeError:
        from . import _ffmpeg

        if not _ffmpeg.available():
            raise
        pts, fps = _ffmpeg.video_timestamps(filename)  # demux-only, no decode
        return len(pts), fps or 30.0


def read_video_timestamps(
    filename: str, pts_unit: str = "pts"
) -> Tuple[List[Union[int, float]], Optional[float]]:
    """Frame presentation timestamps + fps (reference
    ``io/video.py:read_video_timestamps``).  Metadata-only: scans the
    container chunk list without decoding frames."""
    t, fps = _probe_any(filename)
    pts: List[Union[int, float]] = list(range(t))
    if pts_unit == "sec":
        pts = [p / fps for p in pts]
    return pts, fps


def write_video(
    filename: str,
    video_array,
    fps: float,
    video_codec: str = "mjpeg",
    options: Optional[Dict[str, Any]] = None,
    audio_array=None,
    audio_fps: Optional[float] = None,
    audio_codec: Optional[str] = None,
    audio_options: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a (T, H, W, C) uint8 video (reference ``io/video.py:write_video``).

    Codecs: ``mjpeg`` (MJPEG-AVI via the native JPEG encoder;
    ``options={'quality': 1-100}``), ``npy`` (raw array), and — through the
    C++ ffmpeg shim — ``libx264``/``h264`` and ``mpeg4``
    (``options={'crf': 0-51}``).  Audio muxing is not implemented.
    """
    video = np.asarray(video_array)
    if video.dtype != np.uint8:
        raise TypeError(f"video_array must be uint8, got {video.dtype}")
    if video.ndim != 4 or video.shape[-1] != 3:
        raise ValueError(f"video_array must be (T, H, W, 3), got {video.shape}")
    if video_codec == "npy" or filename.endswith(".npy"):
        if audio_array is not None:
            raise RuntimeError("the raw .npy layout cannot carry audio")
        np.save(filename, video)
        return
    if audio_array is not None:
        # audio muxing (reference write_video audio path, io/video.py:48-129):
        # AAC through the ffmpeg shim, any shim video codec
        from . import _ffmpeg

        if audio_fps is None:
            raise ValueError("audio_fps (sample rate) is required with audio_array")
        name = {"h264": "libx264", "hevc": "libx265"}.get(video_codec, video_codec)
        crf = int((options or {}).get("crf", 23))
        _ffmpeg.encode_video_av(filename, video, fps, np.asarray(audio_array),
                                int(audio_fps), codec=name, crf=crf)
        return
    if video_codec in ("libx264", "h264", "mpeg4", "hevc", "libx265"):
        from . import _ffmpeg

        name = {"h264": "libx264", "hevc": "libx265"}.get(video_codec, video_codec)
        crf = int((options or {}).get("crf", 23))
        _ffmpeg.encode_video(filename, video, fps, codec=name, crf=crf)
        return
    if video_codec != "mjpeg":
        raise RuntimeError(
            f"video_codec={video_codec!r} is not supported; this build encodes "
            "'mjpeg' (MJPEG-AVI) and 'npy' natively, plus 'libx264'/'h264'/"
            "'mpeg4' through the ffmpeg shim")
    quality = int((options or {}).get("quality", 90))
    _encode_avi(filename, video, fps, quality)


class VideoReader:
    """Streaming frame iterator (reference ``io/video_reader.py:VideoReader``):
    ``next(reader)`` -> ``{"data": frame, "pts": seconds}``; ``seek`` jumps;
    ``get_metadata`` reports duration/fps."""

    def __init__(self, src: str, stream: str = "video"):
        if stream.split(":")[0] != "video":
            raise ValueError(f"only video streams are available, got {stream!r}")
        self._video, self._fps = _decode_any(src)
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, Any]:
        if self._pos >= self._video.shape[0]:
            raise StopIteration
        frame = {"data": self._video[self._pos], "pts": self._pos / self._fps}
        self._pos += 1
        return frame

    def seek(self, time_s: float, keyframes_only: bool = False) -> "VideoReader":
        # every MJPEG/array frame is a keyframe, so exact seeking is free
        self._pos = max(0, int(np.ceil(time_s * self._fps - 1e-9)))
        return self

    def get_metadata(self) -> Dict[str, Any]:
        t = self._video.shape[0]
        return {"video": {"duration": [t / self._fps], "fps": [self._fps]}}
