"""``wrap_dataset_for_transforms_v2`` (reference
``torchvision/tv_tensors/_dataset_wrapper.py:19-127``): wrap a dataset so its
samples come back as typed TV arrays (Image/Mask/BoundingBoxes/Video) ready
for the typed-dispatch transforms."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..tv_arrays import BoundingBoxes, Image, Mask, Video

__all__ = ["wrap_dataset_for_transforms_v2"]


def _select_keys(target, keys):
    if keys == "all":
        return target
    return {k: v for k, v in target.items() if k in keys}


def _list_of_dicts_to_dict_of_lists(lod):
    out = defaultdict(list)
    for d in lod:
        for k, v in d.items():
            out[k].append(v)
    return dict(out)


def _canvas_size(image) -> tuple:
    arr = image.data if isinstance(image, Image) else image
    return tuple(np.asarray(arr).shape[:2])


def _wrap_coco(sample, target_keys):
    image, target = sample
    canvas = _canvas_size(image)
    if not target:
        return Image(image), dict(boxes=BoundingBoxes(
            np.zeros((0, 4), np.float32), "xyxy", canvas),
            labels=np.zeros((0,), np.int64), image_id=None)
    batched = _list_of_dicts_to_dict_of_lists(target)
    xywh = np.asarray(batched["bbox"], np.float32).reshape(-1, 4)
    xyxy = np.concatenate([xywh[:, :2], xywh[:, :2] + xywh[:, 2:]], axis=1)
    batched["image_id"] = batched["image_id"][0] if "image_id" in batched else None
    batched["boxes"] = BoundingBoxes(xyxy, "xyxy", canvas)
    batched["labels"] = np.asarray(batched.get("category_id", []), np.int64)
    keys = target_keys or ("image_id", "boxes", "labels")
    return Image(image), _select_keys(batched, keys)


def _wrap_voc_detection(sample, target_keys):
    image, target = sample
    objects = target["annotation"]["object"]
    if not isinstance(objects, list):
        objects = [objects]
    boxes = np.asarray(
        [[float(o["bndbox"][k]) for k in ("xmin", "ymin", "xmax", "ymax")]
         for o in objects], np.float32).reshape(-1, 4)
    target = dict(target)
    target["boxes"] = BoundingBoxes(boxes, "xyxy", _canvas_size(image))
    target["labels"] = [o["name"] for o in objects]
    keys = target_keys or ("boxes", "labels")
    return Image(image), _select_keys(target, keys)


def _wrap_kitti(sample, target_keys):
    image, target = sample
    if target is None:
        return Image(image), None
    batched = _list_of_dicts_to_dict_of_lists(target)
    boxes = np.asarray(batched.get("bbox", []), np.float32).reshape(-1, 4)
    batched["boxes"] = BoundingBoxes(boxes, "xyxy", _canvas_size(image))
    batched["labels"] = batched.get("type", [])
    keys = target_keys or ("boxes", "labels")
    return Image(image), _select_keys(batched, keys)


def _wrap_widerface(sample, target_keys):
    image, target = sample
    if target is None:
        return Image(image), None
    target = dict(target)
    xywh = np.asarray(target["bbox"], np.float32).reshape(-1, 4)
    xyxy = np.concatenate([xywh[:, :2], xywh[:, :2] + xywh[:, 2:]], axis=1)
    target["bbox"] = BoundingBoxes(xyxy, "xyxy", _canvas_size(image))
    if target_keys:
        target = _select_keys(target, target_keys)
    return Image(image), target


def _wrap_segmentation(sample, target_keys):
    image, mask = sample
    return Image(image), Mask(np.asarray(mask))


def _wrap_video(sample, target_keys):
    video, audio, label = sample
    return Video(video), audio, label


class _WrappedDataset:
    """Delegating wrapper; keeps the original dataset accessible as
    ``._dataset`` (reference ``VisionDatasetTVTensorWrapper``)."""

    def __init__(self, dataset, wrapper, target_keys):
        self._dataset = dataset
        self._wrapper = wrapper
        self._target_keys = target_keys

    def __getitem__(self, index):
        sample = self._dataset[index]
        return self._wrapper(sample, self._target_keys)

    def __len__(self):
        return len(self._dataset)

    def __getattr__(self, name):
        return getattr(self._dataset, name)


def wrap_dataset_for_transforms_v2(dataset, target_keys=None):
    """Wrap a dataset's samples into typed TV arrays (reference
    ``wrap_dataset_for_transforms_v2``, ``_dataset_wrapper.py:19``).

    Special-cased like the reference: CocoDetection / VOCDetection / Kitti /
    WIDERFace gain ``boxes``/``labels`` keys as :class:`BoundingBoxes`;
    segmentation pairs wrap the mask in :class:`Mask`; video triplets wrap
    the clip in :class:`Video`; classification datasets wrap the image only.
    """
    from . import (
        CocoDetection,
        Kitti,
        SBDataset,
        VOCDetection,
        VOCSegmentation,
        WIDERFace,
    )
    from .video import HMDB51, UCF101, Kinetics

    if not (target_keys is None or target_keys == "all"
            or (hasattr(target_keys, "__contains__")
                and all(isinstance(k, str) for k in target_keys))):
        raise ValueError(
            "`target_keys` can be None, 'all', or a collection of strings, "
            f"but got {target_keys}")

    if isinstance(dataset, CocoDetection):
        wrapper = _wrap_coco
    elif isinstance(dataset, VOCDetection):
        wrapper = _wrap_voc_detection
    elif isinstance(dataset, Kitti):
        wrapper = _wrap_kitti
    elif isinstance(dataset, WIDERFace):
        wrapper = _wrap_widerface
    elif isinstance(dataset, (VOCSegmentation, SBDataset)):
        wrapper = _wrap_segmentation
    elif isinstance(dataset, (Kinetics, HMDB51, UCF101)):
        wrapper = _wrap_video
    else:
        def wrapper(sample, target_keys):  # classification: image-only wrap
            image, *rest = sample
            return (Image(image), *rest)

    return _WrappedDataset(dataset, wrapper, target_keys)
