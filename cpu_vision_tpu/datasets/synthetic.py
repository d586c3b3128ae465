"""Procedurally-labelled synthetic dataset for end-to-end learning proofs.

Unlike :class:`FakeData` (reference ``torchvision/datasets/fakedata.py``,
random pixels with random labels — only memorisable), here the label is a
deterministic function of the image content: each class is a geometric
glyph (shape kind x fill pattern) rendered at a random position, scale,
rotation, and color, over a textured noise background.  A model can only
reach high *held-out* accuracy by learning the shape concept, so training
on this set is a real generalisation proof for the optimizer / preset /
EMA plumbing — the role CIFAR-10 plays for the reference's recipes
(``references/classification/README.md``) in an environment with no
dataset downloads.

Index -> sample is pure (seeded per index), so the train/val split is just
two disjoint index ranges (``random_offset``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from .vision import VisionDataset

# (shape kind, filled?) pairs; 10 classes by default mirroring CIFAR-10 size
_KINDS = [
    ("disk", True), ("disk", False),
    ("square", True), ("square", False),
    ("triangle", True), ("triangle", False),
    ("cross", True), ("stripes", True),
    ("ring2", True), ("diamond", True),
]


def _render(rng: np.random.Generator, cls: int, hw: int, want_mask: bool = False):
    """Render one HxWx3 uint8 glyph image for class ``cls``.

    With ``want_mask`` also returns the boolean glyph mask (ground truth for
    the detection/segmentation variants)."""
    kind, filled = _KINDS[cls % len(_KINDS)]
    # textured background: low-frequency noise + per-image brightness
    bg = rng.normal(0, 1, (hw // 8 + 1, hw // 8 + 1, 3))
    bg = np.kron(bg, np.ones((8, 8, 1)))[:hw, :hw]
    img = (rng.uniform(40, 160) + 25 * bg).astype(np.float32)

    # glyph placement: random center, scale, rotation
    r = rng.uniform(0.18, 0.38) * hw
    cy = rng.uniform(r + 2, hw - r - 2)
    cx = rng.uniform(r + 2, hw - r - 2)
    theta = rng.uniform(0, 2 * np.pi)
    fg = rng.uniform(0, 255, size=3)
    # keep glyph/background contrast learnable
    fg = np.where(np.abs(fg - img[..., :].mean((0, 1))) < 60, (fg + 128) % 256, fg)

    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32)
    y, x = yy - cy, xx - cx
    c, s = np.cos(theta), np.sin(theta)
    u, v = c * x + s * y, -s * x + c * y  # rotated frame

    if kind == "disk":
        d = np.sqrt(u * u + v * v)
        mask = d <= r if filled else (np.abs(d - r) <= 0.15 * r)
    elif kind == "square":
        d = np.maximum(np.abs(u), np.abs(v))
        mask = d <= r * 0.8 if filled else (np.abs(d - r * 0.8) <= 0.12 * r)
    elif kind == "triangle":
        # equilateral: inside 3 half-planes
        h1 = v + r * 0.5
        h2 = -0.866 * u - 0.5 * v + r * 0.5
        h3 = 0.866 * u - 0.5 * v + r * 0.5
        inner = np.minimum(np.minimum(h1, h2), h3)
        mask = inner >= 0 if filled else (np.abs(inner) <= 0.12 * r) & (inner >= -0.12 * r)
    elif kind == "cross":
        mask = ((np.abs(u) <= 0.22 * r) | (np.abs(v) <= 0.22 * r)) & (
            np.maximum(np.abs(u), np.abs(v)) <= r)
    elif kind == "stripes":
        d = np.maximum(np.abs(u), np.abs(v))
        mask = (d <= r * 0.8) & (np.mod(np.floor(v / (0.3 * r)), 2) == 0)
    elif kind == "ring2":
        d = np.sqrt(u * u + v * v)
        mask = (np.abs(d - r) <= 0.13 * r) | (np.abs(d - 0.5 * r) <= 0.13 * r)
    else:  # diamond
        d = np.abs(u) + np.abs(v)
        mask = d <= r
    img = np.where(mask[..., None], fg[None, None, :], img)
    # pixel noise so trivial color statistics do not solve the task
    img = img + rng.normal(0, 12, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return (img, mask) if want_mask else img


class SyntheticShapes(VisionDataset):
    """Labelled glyph dataset: ``label = shape concept in the image``."""

    def __init__(
        self,
        size: int = 10_000,
        image_size: Tuple[int, int, int] = (64, 64, 3),
        num_classes: int = 10,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        random_offset: int = 0,
    ):
        if num_classes > len(_KINDS):
            raise ValueError(f"at most {len(_KINDS)} classes supported")
        super().__init__(None, transform=transform, target_transform=target_transform)
        self.size = size
        self.image_size = image_size
        self.num_classes = num_classes
        self.random_offset = random_offset

    def __getitem__(self, index: int):
        if index >= self.size:
            raise IndexError(f"index {index} out of range for size {self.size}")
        rng = np.random.default_rng(index + self.random_offset)
        target = int(rng.integers(0, self.num_classes))
        img = _render(rng, target, self.image_size[0])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.size


class SyntheticShapesSegmentation(VisionDataset):
    """Glyph dataset with per-pixel targets: 0 = background, 1 + class =
    glyph pixels (VOC-style label map; plays the role CamVid/VOC play for
    the reference's segmentation recipes)."""

    def __init__(self, size: int = 2_000, image_size: Tuple[int, int, int] = (64, 64, 3),
                 num_classes: int = 10, transform=None, target_transform=None,
                 random_offset: int = 0):
        if num_classes > len(_KINDS):
            raise ValueError(f"at most {len(_KINDS)} classes supported")
        super().__init__(None, transform=transform, target_transform=target_transform)
        self.size = size
        self.image_size = image_size
        self.num_classes = num_classes
        self.random_offset = random_offset

    def __getitem__(self, index: int):
        if index >= self.size:
            raise IndexError(f"index {index} out of range for size {self.size}")
        rng = np.random.default_rng(index + self.random_offset)
        cls = int(rng.integers(0, self.num_classes))
        img, mask = _render(rng, cls, self.image_size[0], want_mask=True)
        target = np.where(mask, cls + 1, 0).astype(np.int32)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.size


class SyntheticShapesVideo(VisionDataset):
    """Video glyph dataset with a *temporal* label: a random glyph drifts at
    2 px/frame and the class is its motion direction (0=+x, 1=-x, 2=+y,
    3=-y).  A single frame carries zero label information, so held-out
    accuracy above chance proves the video model (3D convs / temporal
    attention) actually integrates across time — the role Kinetics plays
    for the reference's video recipe (``references/video_classification``)."""

    num_classes = 4
    _DIRS = [(0, 1), (0, -1), (1, 0), (-1, 0)]  # (dy, dx) per class

    def __init__(self, size: int = 2_000, frames: int = 8, image_size: int = 64,
                 transform=None, target_transform=None, random_offset: int = 0):
        super().__init__(None, transform=transform, target_transform=target_transform)
        self.size = size
        self.frames = frames
        self.image_size = image_size
        self.random_offset = random_offset

    def __getitem__(self, index: int):
        if index >= self.size:
            raise IndexError(f"index {index} out of range for size {self.size}")
        rng = np.random.default_rng(index + self.random_offset)
        cls = int(rng.integers(0, self.num_classes))
        shape = int(rng.integers(0, len(_KINDS)))
        base = _render(rng, shape, self.image_size)
        dy, dx = self._DIRS[cls]
        video = np.stack([np.roll(base, (2 * t * dy, 2 * t * dx), axis=(0, 1))
                          for t in range(self.frames)])  # (T, H, W, 3)
        if self.transform is not None:
            video = self.transform(video)
        target = cls
        if self.target_transform is not None:
            target = self.target_transform(target)
        return video, target

    def __len__(self):
        return self.size


class SyntheticShapesDetection(VisionDataset):
    """Glyph dataset with box targets: one labelled glyph per image,
    ``target = {"boxes": (1, 4) xyxy float32, "labels": (1,) int32}`` —
    the COCO-detection sample contract of
    :class:`~cpu_vision_tpu.datasets.CocoDetection`."""

    def __init__(self, size: int = 2_000, image_size: Tuple[int, int, int] = (64, 64, 3),
                 num_classes: int = 10, transform=None, target_transform=None,
                 random_offset: int = 0):
        if num_classes > len(_KINDS):
            raise ValueError(f"at most {len(_KINDS)} classes supported")
        super().__init__(None, transform=transform, target_transform=target_transform)
        self.size = size
        self.image_size = image_size
        self.num_classes = num_classes
        self.random_offset = random_offset

    def __getitem__(self, index: int):
        if index >= self.size:
            raise IndexError(f"index {index} out of range for size {self.size}")
        rng = np.random.default_rng(index + self.random_offset)
        cls = int(rng.integers(0, self.num_classes))
        img, mask = _render(rng, cls, self.image_size[0], want_mask=True)
        ys, xs = np.nonzero(mask)
        box = np.asarray([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]], np.float32)
        target = {"boxes": box, "labels": np.asarray([cls], np.int32)}
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.size
