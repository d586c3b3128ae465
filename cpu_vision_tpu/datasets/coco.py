"""COCO datasets (reference ``torchvision/datasets/coco.py``):
``CocoDetection`` / ``CocoCaptions``.  The annotation index is parsed from
the JSON with the stdlib (no pycocotools dependency); targets follow the
COCO annotation-dict format like the reference.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Callable, Dict, List, Optional

from .vision import VisionDataset

__all__ = ["CocoDetection", "CocoCaptions"]


class _CocoIndex:
    """Minimal pycocotools.COCO replacement (image/annotation lookups)."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.imgs = {img["id"]: img for img in data.get("images", [])}
        self.anns = {ann["id"]: ann for ann in data.get("annotations", [])}
        self.img_to_anns: Dict[int, List[dict]] = defaultdict(list)
        for ann in data.get("annotations", []):
            self.img_to_anns[ann["image_id"]].append(ann)
        self.cats = {c["id"]: c for c in data.get("categories", [])}

    def get_ann_ids(self, img_id: int) -> List[int]:
        return [a["id"] for a in self.img_to_anns[img_id]]

    def load_anns(self, ids: List[int]) -> List[dict]:
        return [self.anns[i] for i in ids]


class CocoDetection(VisionDataset):
    """(reference ``CocoDetection``, ``datasets/coco.py:13``).

    ``__getitem__`` -> (HWC uint8 image, list of annotation dicts).
    """

    def __init__(
        self,
        root: str,
        annFile: str,
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        transforms: Optional[Callable] = None,
    ):
        super().__init__(root, transforms, transform, target_transform)
        self.coco = _CocoIndex(annFile)
        self.ids = sorted(self.coco.imgs.keys())

    def _load_image(self, img_id: int):
        from ..io import read_image

        path = self.coco.imgs[img_id]["file_name"]
        return read_image(os.path.join(self.root, path))

    def _load_target(self, img_id: int) -> List[dict]:
        return self.coco.load_anns(self.coco.get_ann_ids(img_id))

    def __getitem__(self, index: int):
        img_id = self.ids[index]
        image = self._load_image(img_id)
        target = self._load_target(img_id)
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        else:
            if self.transform is not None:
                image = self.transform(image)
            if self.target_transform is not None:
                target = self.target_transform(target)
        return image, target

    def __len__(self) -> int:
        return len(self.ids)


class CocoCaptions(CocoDetection):
    """(reference ``CocoCaptions``): targets are the caption strings."""

    def _load_target(self, img_id: int) -> List[str]:
        return [a["caption"] for a in super()._load_target(img_id)]
