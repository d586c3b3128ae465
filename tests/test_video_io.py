"""Video IO layer (reference ``torchvision/io/{video,video_reader}.py``):
MJPEG-AVI container round-trip, array/frame-dir backends, streaming reader,
and io-namespace parity with the reference export list."""

import os

import numpy as np
import pytest

from cpu_vision_tpu import io as cvio


@pytest.fixture()
def video():
    rng = np.random.default_rng(0)
    base = np.zeros((32, 48, 3), np.uint8)
    base[8:24, 12:36] = (200, 60, 60)  # block → JPEG-friendly content
    base += (rng.random((32, 48, 3)) * 8).astype(np.uint8)
    return np.stack([np.roll(base, 4 * i, axis=1) for i in range(6)])


class TestAvi:
    def test_roundtrip(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=12.0, options={"quality": 95})
        out, audio, info = cvio.read_video(p)
        assert out.shape == video.shape and out.dtype == np.uint8
        assert info["video_fps"] == pytest.approx(12.0)
        assert audio.size == 0
        # high-quality MJPEG of blocky content stays close
        err = np.abs(out.astype(int) - video.astype(int)).mean()
        assert err < 6.0

    def test_pts_slicing(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=10.0)
        v, _, _ = cvio.read_video(p, start_pts=1, end_pts=3)
        assert v.shape[0] == 3
        v, _, _ = cvio.read_video(p, start_pts=0.1, end_pts=0.35, pts_unit="sec")
        assert v.shape[0] == 3  # frames with pts in [0.1, 0.35] at 10 fps: 1..3
        with pytest.raises(ValueError):
            cvio.read_video(p, start_pts=3, end_pts=1)

    def test_output_format(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=10.0)
        v, _, _ = cvio.read_video(p, output_format="TCHW")
        assert v.shape == (6, 3, 32, 48)
        with pytest.raises(ValueError):
            cvio.read_video(p, output_format="THCW")

    def test_timestamps(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=25.0)
        pts, fps = cvio.read_video_timestamps(p)
        assert pts == list(range(6)) and fps == pytest.approx(25.0)
        pts_s, _ = cvio.read_video_timestamps(p, "sec")
        assert pts_s[1] == pytest.approx(0.04)

    def test_unknown_codec_raises(self, tmp_path, video):
        with pytest.raises(RuntimeError, match="not supported"):
            cvio.write_video(str(tmp_path / "v.mp4"), video, 10, video_codec="prores")


class TestOtherBackends:
    def test_npy_exact(self, tmp_path, video):
        p = str(tmp_path / "v.npy")
        cvio.write_video(p, video, fps=10, video_codec="npy")
        out, _, _ = cvio.read_video(p)
        np.testing.assert_array_equal(out, video)

    def test_frame_dir(self, tmp_path, video):
        d = tmp_path / "frames"
        d.mkdir()
        for i in range(video.shape[0]):
            cvio.write_png(video[i], str(d / f"{i:04d}.png"))
        out, _, _ = cvio.read_video(str(d))
        np.testing.assert_array_equal(out, video)  # png is lossless


class TestVideoReader:
    def test_stream_and_seek(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=10.0)
        r = cvio.VideoReader(p)
        frames = list(r)
        assert len(frames) == 6
        assert frames[2]["pts"] == pytest.approx(0.2)
        assert frames[0]["data"].shape == (32, 48, 3)
        r.seek(0.3)
        assert next(r)["pts"] == pytest.approx(0.3)
        md = r.get_metadata()
        assert md["video"]["fps"] == [pytest.approx(10.0)]
        assert md["video"]["duration"] == [pytest.approx(0.6)]
        with pytest.raises(ValueError):
            cvio.VideoReader(p, stream="audio")


class TestNamespaceParity:
    def test_reference_io_exports_present(self):
        import re

        src = open("/root/reference/torchvision/io/__init__.py").read()
        m = re.search(r"__all__\s*=\s*\[(.*?)\]", src, re.S)
        ref = re.findall(r'"([\w.]+)"', m.group(1))
        assert [r for r in ref if not hasattr(cvio, r)] == []

    def test_video_opt_gating(self):
        from cpu_vision_tpu.io import _ffmpeg

        # _HAS_VIDEO_OPT tracks the native ffmpeg shim (the counterpart of
        # the reference's video_reader extension)
        assert cvio._HAS_VIDEO_OPT is _ffmpeg.available()
        with pytest.raises(RuntimeError, match="video_opt"):
            cvio._read_video_from_memory(b"")
        with pytest.raises((RuntimeError, ValueError)):
            cvio.decode_heic(b"not heif bytes")


class TestReviewFixes:
    def test_loader_fetch_error_propagates_not_deadlocks(self):
        from cpu_vision_tpu.datasets import DataLoader

        class Bad:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 3:
                    raise RuntimeError("corrupt sample")
                return np.zeros((2, 2)), i

        dl = DataLoader(Bad(), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match="corrupt"):
            list(dl)
        # loader remains usable afterwards (pool drained cleanly)
        dl2 = DataLoader(Bad(), batch_size=2, num_workers=2)
        it = iter(dl2)
        next(it)  # first batch (indices 0,1) is fine

    def test_npz_fps_first_key(self, tmp_path, video):
        p = str(tmp_path / "v.npz")
        np.savez(p, fps=25.0, video=video)
        out, _, info = cvio.read_video(p)
        np.testing.assert_array_equal(out, video)
        assert info["video_fps"] == pytest.approx(25.0)

    def test_fractional_fps_roundtrip(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=23.976)
        _, fps = cvio.read_video_timestamps(p)
        assert fps == pytest.approx(23.976, abs=1e-3)

    def test_sec_bounds_within_interval(self, tmp_path, video):
        p = str(tmp_path / "v.avi")
        cvio.write_video(p, video, fps=10.0)
        # 0.55 lies between frames 5 (pts 0.5) and 6 (pts 0.6): empty range
        with pytest.raises(ValueError):
            cvio.read_video(p, start_pts=0.55, end_pts=0.55, pts_unit="sec")
        v, _, _ = cvio.read_video(p, start_pts=0.2, end_pts=0.4, pts_unit="sec")
        assert v.shape[0] == 3  # pts 0.2, 0.3, 0.4
