"""Image + video I/O: native libjpeg/libpng/libwebp codecs (C++ shim) with
PIL fallback, and a native MJPEG-AVI / array / frame-dir video layer
(reference ``torchvision/io/__init__.py`` surface)."""

from .image import (  # noqa: F401
    ImageReadMode,
    decode_avif,
    decode_gif,
    decode_heic,
    decode_image,
    decode_jpeg,
    decode_png,
    decode_webp,
    encode_jpeg,
    encode_png,
    read_file,
    read_image,
    write_file,
    write_jpeg,
    write_png,
)
from .video import (  # noqa: F401
    Timebase,
    VideoMetaData,
    VideoReader,
    read_video,
    read_video_timestamps,
    write_video,
)

# capability flags (reference ``io/__init__.py:15-27``): MJPEG-AVI/npy/
# frame-dir decode is always native; compressed codecs (h264 et al.) ride
# the C++ ffmpeg shim when the system libavcodec stack is present; no
# GPU/NVDEC path on TPU
from . import _ffmpeg  # noqa: E402

_HAS_CPU_VIDEO_DECODER = True
_HAS_VIDEO_OPT = _ffmpeg.available()
_HAS_GPU_VIDEO_DECODER = False

Video = VideoReader  # reference alias (``io/__init__.py``)


def _unsupported_video_opt(name):
    def fn(*args, **kwargs):
        raise RuntimeError(
            f"{name} is part of the ffmpeg-based video_opt backend "
            "(_HAS_VIDEO_OPT=False on this build); use read_video / "
            "VideoReader, which decode MJPEG-AVI, .npy/.npz and frame "
            "directories natively")

    fn.__name__ = name
    return fn


# private video_opt entry points (reference ``io/_video_opt.py``): the two
# file-based ones map onto the native layer, the memory/probe ones are gated
def _read_video_from_file(filename, **kwargs):
    video, aframes, info = read_video(filename)
    return video, aframes, info


def _read_video_timestamps_from_file(filename, **kwargs):
    pts, fps = read_video_timestamps(filename)
    return pts, [], fps


def _probe_video_from_file(filename):
    pts, fps = read_video_timestamps(filename)
    meta = VideoMetaData()
    meta.has_video = True
    meta.video_fps = float(fps or 0.0)
    meta.video_duration = len(pts) / fps if fps else 0.0
    return meta


_read_video_from_memory = _unsupported_video_opt("_read_video_from_memory")
_read_video_timestamps_from_memory = _unsupported_video_opt(
    "_read_video_timestamps_from_memory")
_probe_video_from_memory = _unsupported_video_opt("_probe_video_from_memory")
_read_video_clip_from_memory = _unsupported_video_opt("_read_video_clip_from_memory")
_read_video_meta_data = _probe_video_from_file
