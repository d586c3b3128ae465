"""Video-classification datasets (reference ``torchvision/datasets/
{kinetics,hmdb51,ucf101}.py``) with the reference's split/annotation parsing.

Video decode is host-side: real containers (.mp4/.avi/.mkv/.mov/.webm —
h264/hevc/mpeg4 through the native ffmpeg shim, ``io/_video_codecs.cpp``),
directories of frame images (sorted order), and ``.npy`` (T, H, W, C) uint8
stacks (the pre-extracted production layouts).  Clip indexing matches the
reference's ``VideoClips``; container frame counts come from the shim's
demux-only timestamp probe (no pixel decode at index time).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np

from .folder import IMG_EXTENSIONS, default_loader, find_classes
from .video_utils import VideoClips
from .vision import VisionDataset

__all__ = ["Kinetics", "HMDB51", "UCF101", "FrameVideoClips"]

CONTAINER_EXTENSIONS = (".avi", ".mp4", ".mkv", ".mov", ".webm")
VIDEO_EXTENSIONS = (".npy",) + CONTAINER_EXTENSIONS  # + directories of frames


def _is_video(path: str) -> bool:
    return path.lower().endswith(VIDEO_EXTENSIONS) or os.path.isdir(path)


def _make_video_dataset(directory, class_to_idx) -> List[Tuple[str, int]]:
    """(video_path, class_index) pairs; a video is a frames dir or .npy."""
    instances = []
    for cls in sorted(class_to_idx):
        cls_dir = os.path.join(directory, cls)
        if not os.path.isdir(cls_dir):
            continue
        for name in sorted(os.listdir(cls_dir)):
            path = os.path.join(cls_dir, name)
            if _is_video(path):
                instances.append((path, class_to_idx[cls]))
    return instances


def _video_len(path: str) -> int:
    if path.endswith(".npy"):
        return np.load(path, mmap_mode="r").shape[0]
    if path.lower().endswith(CONTAINER_EXTENSIONS):
        from ..io.video import read_video_timestamps

        return len(read_video_timestamps(path)[0])  # demux-only probe
    return sum(1 for f in os.listdir(path) if f.lower().endswith(IMG_EXTENSIONS))


def _read_frames(path: str, frame_idx: np.ndarray) -> np.ndarray:
    """(T, H, W, C) uint8 clip at the given frame indices."""
    if path.endswith(".npy"):
        return np.asarray(np.load(path, mmap_mode="r")[frame_idx])
    if path.lower().endswith(CONTAINER_EXTENSIONS):
        from ..io.video import read_video

        video, _, _ = read_video(path)
        return np.asarray(video[frame_idx])
    frames = sorted(f for f in os.listdir(path) if f.lower().endswith(IMG_EXTENSIONS))
    return np.stack([default_loader(os.path.join(path, frames[i])) for i in frame_idx])


class FrameVideoClips:
    """``VideoClips`` over on-disk frame videos: owns the per-video frame
    counts, yields decoded (T, H, W, C) clips (counterpart of the reference's
    ``VideoClips.get_clip``, ``datasets/video_utils.py:281``)."""

    def __init__(self, video_paths: List[str], clip_length_in_frames: int = 16,
                 frames_between_clips: int = 1, frame_rate: Optional[int] = None):
        self.video_paths = list(video_paths)
        self.clips = VideoClips(
            [_video_len(p) for p in self.video_paths],
            clip_length_in_frames, frames_between_clips, frame_rate,
        )

    def num_clips(self) -> int:
        return self.clips.num_clips()

    def num_videos(self) -> int:
        return self.clips.num_videos()

    def subset(self, indices: List[int]) -> "FrameVideoClips":
        out = FrameVideoClips.__new__(FrameVideoClips)
        out.video_paths = [self.video_paths[i] for i in indices]
        out.clips = VideoClips(
            [self.clips.frame_counts[i] for i in indices],
            self.clips.clip_len, self.clips.stride,
        )
        return out

    def get_clip(self, idx: int) -> Tuple[np.ndarray, None, dict, int]:
        """(video (T,H,W,C) uint8, audio=None, info, video_idx) — the
        reference's get_clip tuple with audio always empty."""
        video_idx, frame_idx = self.clips.get_clip_frames(idx)
        video = _read_frames(self.video_paths[video_idx], frame_idx)
        return video, None, {}, video_idx


class Kinetics(VisionDataset):
    """Layout: ``root/<split>/<class>/<video>`` (reference
    ``kinetics.py:131-156``)."""

    def __init__(self, root, frames_per_clip, num_classes="400", split="train",
                 frame_rate=None, step_between_clips=1, transform=None):
        self.num_classes = num_classes
        split_folder = os.path.join(root, split)
        super().__init__(root)
        self.split = split
        self.classes, class_to_idx = find_classes(split_folder)
        self.samples = _make_video_dataset(split_folder, class_to_idx)
        self.video_clips = FrameVideoClips(
            [p for p, _ in self.samples], frames_per_clip, step_between_clips,
            frame_rate)
        self.transform = transform

    def __len__(self):
        return self.video_clips.num_clips()

    def __getitem__(self, idx):
        video, audio, info, video_idx = self.video_clips.get_clip(idx)
        label = self.samples[video_idx][1]
        if self.transform is not None:
            video = self.transform(video)
        return video, audio, label


class HMDB51(VisionDataset):
    """Layout: ``root/<class>/<video>`` + fold lists
    ``<annotation_path>/*test_split<fold>.txt`` with tags 1=train / 2=test
    (reference ``hmdb51.py:104-140``)."""

    TRAIN_TAG = 1
    TEST_TAG = 2

    def __init__(self, root, annotation_path, frames_per_clip,
                 step_between_clips=1, frame_rate=None, fold=1, train=True,
                 transform=None):
        super().__init__(root)
        if fold not in (1, 2, 3):
            raise ValueError(f"fold should be between 1 and 3, got {fold}")
        self.classes, class_to_idx = find_classes(self.root)
        self.samples = _make_video_dataset(self.root, class_to_idx)
        video_paths = [p for p, _ in self.samples]
        full = FrameVideoClips(video_paths, frames_per_clip, step_between_clips,
                               frame_rate)
        self.full_video_clips = full
        self.fold = fold
        self.train = train
        self.indices = self._select_fold(video_paths, annotation_path, fold, train)
        self.video_clips = full.subset(self.indices)
        self.transform = transform

    def _select_fold(self, video_list, annotations_dir, fold, train):
        target_tag = self.TRAIN_TAG if train else self.TEST_TAG
        selected = set()
        for filepath in glob.glob(os.path.join(annotations_dir, f"*test_split{fold}.txt")):
            with open(filepath) as f:
                for line in f:
                    video_filename, tag = line.split()
                    if int(tag) == target_tag:
                        selected.add(video_filename)
        return [i for i, p in enumerate(video_list)
                if os.path.basename(p) in selected]

    def __len__(self):
        return self.video_clips.num_clips()

    def __getitem__(self, idx):
        video, audio, info, video_idx = self.video_clips.get_clip(idx)
        label = self.samples[self.indices[video_idx]][1]
        if self.transform is not None:
            video = self.transform(video)
        return video, audio, label


class UCF101(VisionDataset):
    """Layout: ``root/<class>/<video>`` + ``<annotation_path>/
    {train,test}list0<fold>.txt`` (reference ``ucf101.py:71-121``)."""

    def __init__(self, root, annotation_path, frames_per_clip,
                 step_between_clips=1, frame_rate=None, fold=1, train=True,
                 transform=None):
        super().__init__(root)
        if not 1 <= fold <= 3:
            raise ValueError(f"fold should be between 1 and 3, got {fold}")
        self.fold = fold
        self.train = train
        self.classes, class_to_idx = find_classes(self.root)
        self.samples = _make_video_dataset(self.root, class_to_idx)
        video_paths = [p for p, _ in self.samples]
        full = FrameVideoClips(video_paths, frames_per_clip, step_between_clips,
                               frame_rate)
        self.full_video_clips = full
        self.indices = self._select_fold(video_paths, annotation_path, fold, train)
        self.video_clips = full.subset(self.indices)
        self.transform = transform

    def _select_fold(self, video_list, annotation_path, fold, train):
        name = f"{'train' if train else 'test'}list{fold:02d}.txt"
        selected = set()
        with open(os.path.join(annotation_path, name)) as f:
            for line in f:
                rel = line.strip().split(" ")[0]
                selected.add(os.path.join(self.root, *rel.split("/")))
        return [i for i, p in enumerate(video_list) if p in selected]

    __len__ = HMDB51.__len__
    __getitem__ = HMDB51.__getitem__
