"""Dataset base classes (reference ``torchvision/datasets/vision.py``):
``VisionDataset`` (:10) and ``StandardTransform`` (:88).

Framework-free: a dataset is an indexable of (sample, target) pairs; batching
and device transfer live in the data-loading layer.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

__all__ = ["VisionDataset", "StandardTransform"]


class StandardTransform:
    """Pairs an input transform and a target transform (reference
    ``StandardTransform``, ``datasets/vision.py:88``)."""

    def __init__(self, transform: Optional[Callable] = None, target_transform: Optional[Callable] = None):
        self.transform = transform
        self.target_transform = target_transform

    def __call__(self, inpt, target):
        if self.transform is not None:
            inpt = self.transform(inpt)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return inpt, target

    def __repr__(self):
        return f"StandardTransform(transform={self.transform}, target_transform={self.target_transform})"


class VisionDataset:
    """Base dataset (reference ``VisionDataset``, ``datasets/vision.py:10``).

    Subclasses implement ``__getitem__``/``__len__``.  Exactly one of
    ``transforms`` or (``transform``, ``target_transform``) may be given.
    """

    _repr_indent = 4

    def __init__(
        self,
        root: Optional[str] = None,
        transforms: Optional[Callable] = None,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
    ):
        self.root = os.path.expanduser(root) if root is not None else None
        has_separate = transform is not None or target_transform is not None
        if transforms is not None and has_separate:
            raise ValueError("pass either transforms or transform/target_transform, not both")
        self.transform = transform
        self.target_transform = target_transform
        if transforms is None and has_separate:
            transforms = StandardTransform(transform, target_transform)
        self.transforms = transforms

    def __getitem__(self, index: int):
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def extra_repr(self) -> str:
        return ""

    def __repr__(self) -> str:
        head = f"Dataset {type(self).__name__}"
        body = [f"Number of datapoints: {len(self)}"]
        if self.root is not None:
            body.append(f"Root location: {self.root}")
        extra = self.extra_repr()
        if extra:
            body += extra.splitlines()
        if self.transforms is not None:
            body.append(repr(self.transforms))
        lines = [head] + [" " * self._repr_indent + line for line in body]
        return "\n".join(lines)
