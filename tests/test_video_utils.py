"""VideoClips indexing + clip samplers + the video training reference."""

import os
import sys

import numpy as np
import pytest

from cpu_vision_tpu.datasets.video_utils import RandomClipSampler, UniformClipSampler, VideoClips


class TestVideoClips:
    def test_clip_counts(self):
        clips = VideoClips([10, 3, 20], clip_length_in_frames=5, frames_between_clips=5)
        # video0: starts 0,5 -> 2; video1: too short -> 0; video2: 0,5,10,15 -> 4
        assert [len(c) for c in clips.clips] == [2, 0, 4]
        assert clips.num_clips() == 6

    def test_clip_location_and_frames(self):
        clips = VideoClips([10, 3, 20], 5, 5)
        v, c = clips.get_clip_location(0)
        assert (v, c) == (0, 0)
        v, c = clips.get_clip_location(2)
        assert (v, c) == (2, 0)
        v, frames = clips.get_clip_frames(5)
        assert v == 2
        np.testing.assert_array_equal(frames, np.arange(15, 20))

    def test_out_of_range(self):
        clips = VideoClips([10], 5, 5)
        with pytest.raises(IndexError):
            clips.get_clip_location(99)


class TestSamplers:
    def test_uniform(self):
        clips = VideoClips([20, 20], 5, 1)  # 16 clips per video
        s = UniformClipSampler(clips, 4)
        ids = list(s)
        assert len(ids) == 8
        assert all(0 <= i < clips.num_clips() for i in ids)
        # first four from video 0, last four from video 1
        assert max(ids[:4]) < 16 <= min(ids[4:])

    def test_random_respects_max(self):
        clips = VideoClips([20, 6, 20], 5, 1)
        s = RandomClipSampler(clips, 3, seed=1)
        ids = list(s)
        assert len(ids) == 3 + 2 + 3  # video1 has only 2 clips
        assert len(set(ids)) == len(ids)

    def test_random_epoch_changes_order(self):
        clips = VideoClips([30], 5, 1)
        s = RandomClipSampler(clips, 10, seed=0)
        s.set_epoch(0)
        a = list(s)
        s.set_epoch(1)
        b = list(s)
        assert a != b


class TestVideoScript:
    def test_smoke(self, capsys):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from references.video_classification.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--clip-len", "4", "--image-size", "16", "--batch-size", "2"])
        out = capsys.readouterr().out
        assert "loss" in out
