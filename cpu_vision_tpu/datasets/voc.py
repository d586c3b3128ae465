"""Pascal VOC datasets (reference ``torchvision/datasets/voc.py``):
``VOCDetection`` (XML annotations via the stdlib) and ``VOCSegmentation``.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Any, Callable, Dict, List, Optional

from .vision import VisionDataset

__all__ = ["VOCDetection", "VOCSegmentation", "VOC_CLASSES"]

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


class _VOCBase(VisionDataset):
    _SPLITS_DIR: str
    _TARGET_DIR: str
    _TARGET_FILE_EXT: str

    def __init__(
        self,
        root: str,
        year: str = "2012",
        image_set: str = "train",
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        transforms: Optional[Callable] = None,
    ):
        super().__init__(root, transforms, transform, target_transform)
        self.year = year
        self.image_set = image_set
        base = os.path.join(self.root, f"VOCdevkit/VOC{year}")
        splits_file = os.path.join(base, "ImageSets", self._SPLITS_DIR, f"{image_set}.txt")
        if not os.path.exists(splits_file):
            raise RuntimeError(f"VOC split file not found: {splits_file}")
        with open(splits_file) as f:
            names = [line.strip() for line in f if line.strip()]
        self.images = [os.path.join(base, "JPEGImages", f"{n}.jpg") for n in names]
        self.targets = [
            os.path.join(base, self._TARGET_DIR, f"{n}{self._TARGET_FILE_EXT}") for n in names
        ]

    def __len__(self) -> int:
        return len(self.images)


def _parse_voc_xml(node: ET.Element) -> Dict[str, Any]:
    """Reference ``VOCDetection.parse_voc_xml`` (``datasets/voc.py:195``)."""
    voc_dict: Dict[str, Any] = {}
    children = list(node)
    if children:
        agg: Dict[str, List[Any]] = {}
        for child in children:
            sub = _parse_voc_xml(child)
            for k, v in sub.items():
                agg.setdefault(k, []).append(v)
        voc_dict[node.tag] = {
            k: v[0] if len(v) == 1 and k != "object" else v for k, v in agg.items()
        }
    elif node.text:
        voc_dict[node.tag] = node.text.strip()
    return voc_dict


class VOCDetection(_VOCBase):
    """(reference ``VOCDetection``): targets are the parsed XML dicts."""

    _SPLITS_DIR = "Main"
    _TARGET_DIR = "Annotations"
    _TARGET_FILE_EXT = ".xml"

    def __getitem__(self, index: int):
        from ..io import read_image

        img = read_image(self.images[index])
        target = _parse_voc_xml(ET.parse(self.targets[index]).getroot())
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        else:
            if self.transform is not None:
                img = self.transform(img)
            if self.target_transform is not None:
                target = self.target_transform(target)
        return img, target


class VOCSegmentation(_VOCBase):
    """(reference ``VOCSegmentation``): targets are class-index PNG masks."""

    _SPLITS_DIR = "Segmentation"
    _TARGET_DIR = "SegmentationClass"
    _TARGET_FILE_EXT = ".png"

    def __getitem__(self, index: int):
        from ..io import read_image

        img = read_image(self.images[index])
        target = read_image(self.targets[index])
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        else:
            if self.transform is not None:
                img = self.transform(img)
            if self.target_transform is not None:
                target = self.target_transform(target)
        return img, target
