"""HEIC/AVIF codec path (``io/_heif.cpp`` over system libheif —
counterpart of the reference's ``decode_heic.cpp``/``decode_avif.cpp``,
both build-flag gated there).  Round trips for both formats, format
sniffing through ``decode_image``, and cross-implementation AVIF decode
via the independent libavcodec/dav1d path in the ffmpeg shim."""

import numpy as np
import pytest

from cpu_vision_tpu import io as cvio
from cpu_vision_tpu.io import _heif_py

pytestmark = pytest.mark.skipif(
    not _heif_py.available(), reason="libheif shim unavailable on this host")


@pytest.fixture()
def img():
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256],
                    -1).astype(np.uint8)


@pytest.mark.parametrize("fmt,ext,decoder", [
    (_heif_py.AV1, "avif", "decode_avif"),
    (_heif_py.HEVC, "heic", "decode_heic"),
])
def test_roundtrip(tmp_path, img, fmt, ext, decoder):
    p = str(tmp_path / f"t.{ext}")
    _heif_py.encode(p, img, fmt=fmt, quality=90)
    data = cvio.read_file(p)
    out = getattr(cvio, decoder)(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 3.0, f"{ext} round-trip err {err}"


@pytest.mark.parametrize("fmt,ext", [(_heif_py.AV1, "avif"), (_heif_py.HEVC, "heic")])
def test_decode_image_sniffs_brand(tmp_path, img, fmt, ext):
    p = str(tmp_path / f"t.{ext}")
    _heif_py.encode(p, img, fmt=fmt)
    out = cvio.decode_image(p)  # path form; routes by ftyp major brand
    assert out.shape == img.shape

    out_rgb = cvio.decode_image(cvio.read_file(p), mode=cvio.ImageReadMode.GRAY)
    assert out_rgb.shape == (img.shape[0], img.shape[1], 1)


def test_avif_cross_implementation_vs_ffmpeg(tmp_path, img):
    """Our libheif/dav1d decode vs libavformat's independent avif demux +
    libavcodec decode of the SAME file."""
    from cpu_vision_tpu.io import _ffmpeg

    if not _ffmpeg.available():
        pytest.skip("ffmpeg shim unavailable")
    p = str(tmp_path / "x.avif")
    _heif_py.encode(p, img, fmt=_heif_py.AV1, quality=95)
    ours = cvio.decode_avif(cvio.read_file(p))
    try:
        frames, _fps, _pts = _ffmpeg.decode_video(p)  # avif = single-frame av1
    except RuntimeError:
        pytest.skip("this libavformat build lacks the avif demuxer")
    assert frames.shape[0] == 1
    err = np.abs(frames[0].astype(int) - ours.astype(int)).mean()
    assert err < 2.0, f"libheif vs libavcodec decode differ by {err}"


def test_garbage_rejected():
    with pytest.raises(ValueError):
        _heif_py.decode(b"not an isobmff file at all")
