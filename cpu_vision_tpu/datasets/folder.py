"""Directory-tree datasets (reference ``torchvision/datasets/folder.py``):
``DatasetFolder`` (:109), ``ImageFolder`` (:287), class discovery
(``find_classes``, :36-60) and file scanning (``make_dataset``, :63-107).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from .vision import VisionDataset

__all__ = ["DatasetFolder", "ImageFolder", "find_classes", "make_dataset", "default_loader", "IMG_EXTENSIONS"]

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def find_classes(directory: str) -> Tuple[List[str], Dict[str, int]]:
    """Sorted subdirectory names -> class indices (reference ``find_classes``,
    ``folder.py:36-60``)."""
    classes = sorted(e.name for e in os.scandir(directory) if e.is_dir())
    if not classes:
        raise FileNotFoundError(f"no class folders found in {directory}")
    return classes, {c: i for i, c in enumerate(classes)}


def make_dataset(
    directory: str,
    class_to_idx: Optional[Dict[str, int]] = None,
    extensions: Optional[Tuple[str, ...]] = None,
    is_valid_file: Optional[Callable[[str], bool]] = None,
) -> List[Tuple[str, int]]:
    """(path, class_index) pairs (reference ``make_dataset``, ``folder.py:63``)."""
    directory = os.path.expanduser(directory)
    if class_to_idx is None:
        _, class_to_idx = find_classes(directory)
    both = extensions is not None and is_valid_file is not None
    neither = extensions is None and is_valid_file is None
    if both or neither:
        raise ValueError("pass exactly one of extensions / is_valid_file")
    if extensions is not None:
        def is_valid_file(path: str) -> bool:  # noqa: F811
            return path.lower().endswith(extensions)

    instances = []
    available = set()
    for cls in sorted(class_to_idx):
        idx = class_to_idx[cls]
        cls_dir = os.path.join(directory, cls)
        if not os.path.isdir(cls_dir):
            continue
        for root, _, fnames in sorted(os.walk(cls_dir, followlinks=True)):
            for fname in sorted(fnames):
                path = os.path.join(root, fname)
                if is_valid_file(path):
                    instances.append((path, idx))
                    available.add(cls)
    missing = set(class_to_idx) - available
    if missing:
        raise FileNotFoundError(f"found no valid files for classes {sorted(missing)}")
    return instances


def default_loader(path: str) -> np.ndarray:
    """Decode an image file to HWC uint8 via the native codecs."""
    from ..io import decode_image

    return decode_image(path)


class DatasetFolder(VisionDataset):
    """Generic loader for ``root/class_x/xxx.ext`` trees (reference
    ``DatasetFolder``, ``folder.py:109``)."""

    def __init__(
        self,
        root: str,
        loader: Callable[[str], Any] = default_loader,
        extensions: Optional[Tuple[str, ...]] = IMG_EXTENSIONS,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        is_valid_file: Optional[Callable[[str], bool]] = None,
    ):
        super().__init__(root, transform=transform, target_transform=target_transform)
        classes, class_to_idx = find_classes(self.root)
        if is_valid_file is not None:
            extensions = None
        self.loader = loader
        self.extensions = extensions
        self.classes = classes
        self.class_to_idx = class_to_idx
        self.samples = make_dataset(self.root, class_to_idx, extensions, is_valid_file)
        self.targets = [t for _, t in self.samples]

    def __getitem__(self, index: int):
        path, target = self.samples[index]
        sample = self.loader(path)
        if self.transform is not None:
            sample = self.transform(sample)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return sample, target

    def __len__(self) -> int:
        return len(self.samples)


class ImageFolder(DatasetFolder):
    """``root/class_x/*.png`` image tree (reference ``ImageFolder``,
    ``folder.py:287``)."""
