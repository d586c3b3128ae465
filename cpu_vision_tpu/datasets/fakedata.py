"""FakeData — synthetic labelled images (reference
``torchvision/datasets/fakedata.py``): deterministic per-index randomness."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from .vision import VisionDataset

__all__ = ["FakeData"]


class FakeData(VisionDataset):
    def __init__(
        self,
        size: int = 1000,
        image_size: Tuple[int, int, int] = (224, 224, 3),
        num_classes: int = 10,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        random_offset: int = 0,
    ):
        super().__init__(None, transform=transform, target_transform=target_transform)
        self.size = size
        self.image_size = image_size
        self.num_classes = num_classes
        self.random_offset = random_offset

    def __getitem__(self, index: int):
        if index >= self.size:
            raise IndexError(f"index {index} out of range for size {self.size}")
        rng = np.random.default_rng(index + self.random_offset)
        img = rng.integers(0, 256, self.image_size, dtype=np.uint8)
        target = int(rng.integers(0, self.num_classes))
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.size
