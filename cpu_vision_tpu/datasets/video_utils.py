"""Video clip indexing + distributed-aware clip samplers.

Counterparts of the reference's ``VideoClips`` (``datasets/video_utils.py:73``)
and ``UniformClipSampler``/``RandomClipSampler``
(``datasets/samplers/clip_sampler.py:105,141``).

Video *decode* is out of scope for the TPU kernel library (SURVEY §2a) —
clips index frame sequences provided as arrays, frame directories, or a
``frame_counts`` list.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["VideoClips", "UniformClipSampler", "RandomClipSampler"]


class VideoClips:
    """Index fixed-length clips over a corpus of videos.

    ``frame_counts[i]`` is the number of frames of video i; clips are
    ``clip_length_in_frames`` long with ``frames_between_clips`` stride
    (reference ``VideoClips.compute_clips``).
    """

    def __init__(
        self,
        frame_counts: Sequence[int],
        clip_length_in_frames: int = 16,
        frames_between_clips: int = 1,
        frame_rate: Optional[int] = None,
    ):
        self.frame_counts = list(frame_counts)
        self.clip_len = clip_length_in_frames
        self.stride = frames_between_clips
        self.clips: List[np.ndarray] = []
        for count in self.frame_counts:
            if count < self.clip_len:
                starts = np.zeros((0,), np.int64)
            else:
                starts = np.arange(0, count - self.clip_len + 1, self.stride, dtype=np.int64)
            self.clips.append(starts)
        self.cumulative_sizes = np.cumsum([len(c) for c in self.clips]).tolist()

    def num_clips(self) -> int:
        return self.cumulative_sizes[-1] if self.cumulative_sizes else 0

    def num_videos(self) -> int:
        return len(self.frame_counts)

    def get_clip_location(self, idx: int) -> Tuple[int, int]:
        """clip index -> (video index, clip index within the video)."""
        if idx >= self.num_clips():
            raise IndexError(f"clip {idx} out of range ({self.num_clips()})")
        video_idx = int(np.searchsorted(self.cumulative_sizes, idx, side="right"))
        prev = self.cumulative_sizes[video_idx - 1] if video_idx > 0 else 0
        return video_idx, idx - prev

    def get_clip_frames(self, idx: int) -> Tuple[int, np.ndarray]:
        """clip index -> (video index, frame indices (clip_len,))."""
        v, c = self.get_clip_location(idx)
        start = self.clips[v][c]
        return v, np.arange(start, start + self.clip_len)


class UniformClipSampler:
    """Yield up to ``num_clips_per_video`` evenly spaced clips per video
    (reference ``UniformClipSampler``, ``samplers/clip_sampler.py:105``)."""

    def __init__(self, video_clips: VideoClips, num_clips_per_video: int):
        self.video_clips = video_clips
        self.num_clips_per_video = num_clips_per_video

    def __iter__(self):
        offset = 0
        for starts in self.video_clips.clips:
            n = len(starts)
            if n > 0:
                idxs = np.linspace(0, n - 1, self.num_clips_per_video)
                for i in np.round(idxs).astype(np.int64):
                    yield offset + int(i)
            offset += n

    def __len__(self):
        return sum(
            self.num_clips_per_video if len(c) > 0 else 0 for c in self.video_clips.clips
        )


class RandomClipSampler:
    """Yield up to ``max_clips_per_video`` random clips per video, shuffled
    across videos (reference ``RandomClipSampler``, ``clip_sampler.py:141``)."""

    def __init__(self, video_clips: VideoClips, max_clips_per_video: int, seed: int = 0):
        self.video_clips = video_clips
        self.max_clips_per_video = max_clips_per_video
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        out = []
        offset = 0
        for starts in self.video_clips.clips:
            n = len(starts)
            k = min(self.max_clips_per_video, n)
            if k > 0:
                out.extend((offset + rng.choice(n, k, replace=False)).tolist())
            offset += n
        rng.shuffle(out)
        return iter(out)

    def __len__(self):
        return sum(min(self.max_clips_per_video, len(c)) for c in self.video_clips.clips)
