"""Stereo-matching datasets (reference ``torchvision/datasets/
_stereo_matching.py``): CarlaStereo, Kitti2012/2015Stereo,
Middlebury2014Stereo, CREStereo, FallingThingsStereo, SceneFlowStereo,
SintelStereo, InStereo2k, ETH3DStereo — same layouts, same
(img_left, img_right, disparity[, valid_mask]) tuples. Disparities are
(1, H, W) float32 like the reference; 16-bit PNG reads go through PIL
(the native shim is 8-bit by design)."""

from __future__ import annotations

import functools
import json
import os
from abc import ABC, abstractmethod
from glob import glob
from pathlib import Path
from typing import Callable, List, Optional, Tuple

import numpy as np

from .flow import _read_pfm
from .folder import default_loader
from .vision import VisionDataset

__all__ = [
    "CarlaStereo",
    "Kitti2012Stereo",
    "Kitti2015Stereo",
    "Middlebury2014Stereo",
    "CREStereo",
    "FallingThingsStereo",
    "SceneFlowStereo",
    "SintelStereo",
    "InStereo2k",
    "ETH3DStereo",
]

_read_pfm_file = functools.partial(_read_pfm, slice_channels=1)


def _read_png_16(file_path) -> np.ndarray:
    """16-bit-preserving PNG read (HW or HWC)."""
    from ..io._png16 import read_png_16

    return read_png_16(str(file_path))


class StereoMatchingDataset(ABC, VisionDataset):
    """(reference ``_stereo_matching.py:25-135``). Images are HWC uint8."""

    _has_built_in_disparity_mask = False

    def __init__(self, root, transforms: Optional[Callable] = None):
        super().__init__(root=root)
        self.transforms = transforms
        self._images: List[Tuple[str, str]] = []
        self._disparities: List[Tuple[Optional[str], Optional[str]]] = []

    def _read_img(self, file_path) -> np.ndarray:
        img = default_loader(str(file_path))
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        return img

    def _scan_pairs(self, paths_left_pattern, paths_right_pattern=None):
        left_paths = sorted(glob(paths_left_pattern))
        if paths_right_pattern:
            right_paths = sorted(glob(paths_right_pattern))
        else:
            right_paths = [None] * len(left_paths)
        if not left_paths:
            raise FileNotFoundError(
                f"Could not find any files matching the patterns: {paths_left_pattern}")
        if len(left_paths) != len(right_paths):
            raise ValueError(
                f"Found {len(left_paths)} left files but {len(right_paths)} right files")
        return list(zip(left_paths, right_paths))

    @abstractmethod
    def _read_disparity(self, file_path):
        ...

    def __getitem__(self, index):
        img_left = self._read_img(self._images[index][0])
        img_right = self._read_img(self._images[index][1])
        dsp_left, valid_left = self._read_disparity(self._disparities[index][0])
        dsp_right, valid_right = self._read_disparity(self._disparities[index][1])
        imgs = (img_left, img_right)
        dsp_maps = (dsp_left, dsp_right)
        valid_masks = (valid_left, valid_right)
        if self.transforms is not None:
            imgs, dsp_maps, valid_masks = self.transforms(imgs, dsp_maps, valid_masks)
        if self._has_built_in_disparity_mask or valid_masks[0] is not None:
            return imgs[0], imgs[1], dsp_maps[0], valid_masks[0]
        return imgs[0], imgs[1], dsp_maps[0]

    def __len__(self):
        return len(self._images)


class CarlaStereo(StereoMatchingDataset):
    """Layout: ``root/carla-highres/trainingF/<scene>/{im0,im1}.png +
    disp{0,1}GT.pfm`` (reference ``_stereo_matching.py:138-199``)."""

    def __init__(self, root, transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "carla-highres"
        self._images = self._scan_pairs(
            str(root / "trainingF" / "*" / "im0.png"),
            str(root / "trainingF" / "*" / "im1.png"))
        self._disparities = self._scan_pairs(
            str(root / "trainingF" / "*" / "disp0GT.pfm"),
            str(root / "trainingF" / "*" / "disp1GT.pfm"))

    def _read_disparity(self, file_path):
        return np.abs(_read_pfm_file(file_path)), None


class Kitti2012Stereo(StereoMatchingDataset):
    """Layout: ``root/Kitti2012/{training,testing}/colored_{0,1}/*_10.png`` +
    ``training/disp_noc`` (reference ``_stereo_matching.py:202-284``)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "Kitti2012" / (split + "ing")
        self._images = self._scan_pairs(
            str(root / "colored_0" / "*_10.png"),
            str(root / "colored_1" / "*_10.png"))
        if split == "train":
            self._disparities = self._scan_pairs(str(root / "disp_noc" / "*.png"), None)
        else:
            self._disparities = [(None, None) for _ in self._images]

    def _read_disparity(self, file_path):
        if file_path is None:
            return None, None
        disparity_map = _read_png_16(file_path).astype(np.float32) / 256.0
        return disparity_map[None, :, :], None


class Kitti2015Stereo(StereoMatchingDataset):
    """Layout: ``root/Kitti2015/{training,testing}/image_{2,3}`` +
    ``training/disp_occ_{0,1}`` (reference ``_stereo_matching.py:287-372``)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "Kitti2015" / (split + "ing")
        self._images = self._scan_pairs(
            str(root / "image_2" / "*.png"), str(root / "image_3" / "*.png"))
        if split == "train":
            self._disparities = self._scan_pairs(
                str(root / "disp_occ_0" / "*.png"), str(root / "disp_occ_1" / "*.png"))
        else:
            self._disparities = [(None, None) for _ in self._images]

    _read_disparity = Kitti2012Stereo._read_disparity


class Middlebury2014Stereo(StereoMatchingDataset):
    """Layout: ``root/Middlebury2014/<split>/<scene>[-{perfect,imperfect}]/
    {im0,im1}.png + disp{0,1}.pfm`` (reference ``_stereo_matching.py:375-630``)."""

    splits = {
        "train": ["Adirondack", "Jadeplant", "Motorcycle", "Piano", "Pipes",
                  "Playroom", "Playtable", "Recycle", "Shelves", "Vintage"],
        "additional": ["Backpack", "Bicycle1", "Cable", "Classroom1", "Couch",
                       "Flowers", "Mask", "Shopvac", "Sticks", "Storage",
                       "Sword1", "Sword2", "Umbrella"],
        "test": ["Plants", "Classroom2E", "Classroom2", "Australia", "DjembeL",
                 "CrusadeP", "Crusade", "Hoops", "Bicycle2", "Staircase",
                 "Newkuba", "AustraliaP", "Djembe", "Livingroom", "Computer"],
    }
    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", calibration="perfect",
                 use_ambient_views=False, transforms=None, rng=None):
        super().__init__(root, transforms)
        if split == "test" and calibration is not None:
            raise ValueError(
                "the Middlebury test split ships without calibration variants; "
                "pass calibration=None when split='test'")
        if split != "test" and calibration is None:
            raise ValueError(
                f"split={split!r} requires a calibration variant "
                "('perfect' or 'imperfect'); got calibration=None")
        self.split = split
        root = Path(root) / "Middlebury2014"
        if not os.path.exists(root / split):
            raise FileNotFoundError(
                f"missing scene directory {root / split} — download/extract the "
                f"Middlebury2014 {split} archives there first")
        suffixes = {None: [""], "perfect": ["-perfect"],
                    "imperfect": ["-imperfect"],
                    "both": ["-perfect", "-imperfect"]}[calibration]
        for suffix in suffixes:
            pattern = "*" + suffix
            self._images += self._scan_pairs(
                str(root / split / pattern / "im0.png"),
                str(root / split / pattern / "im1.png"))
            if split == "test":
                self._disparities = [(None, None) for _ in self._images]
            else:
                self._disparities += self._scan_pairs(
                    str(root / split / pattern / "disp0.pfm"),
                    str(root / split / pattern / "disp1.pfm"))
        self.use_ambient_views = use_ambient_views
        self._rng = rng or np.random.default_rng(0)

    def _read_img(self, file_path):
        file_path = Path(file_path)
        if file_path.name == "im1.png" and self.use_ambient_views:
            candidates = [file_path.parent / v for v in ("im1E.png", "im1L.png")]
            candidates = [p for p in candidates if p.exists()] + [file_path]
            file_path = candidates[int(self._rng.integers(len(candidates)))]
        return super()._read_img(file_path)

    def _read_disparity(self, file_path):
        if file_path is None:
            return None, None
        disparity_map = np.abs(_read_pfm_file(file_path))
        disparity_map[disparity_map == np.inf] = 0
        valid_mask = (disparity_map > 0).squeeze(0)
        return disparity_map, valid_mask


class CREStereo(StereoMatchingDataset):
    """Layout: ``root/CREStereo/{shapenet,reflective,tree,hole}/
    *_{left,right}.jpg + *_{left,right}.disp.png`` (reference
    ``_stereo_matching.py:632-717``)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "CREStereo"
        for s in ("shapenet", "reflective", "tree", "hole"):
            self._images += self._scan_pairs(
                str(root / s / "*_left.jpg"), str(root / s / "*_right.jpg"))
            self._disparities += self._scan_pairs(
                str(root / s / "*_left.disp.png"), str(root / s / "*_right.disp.png"))

    def _read_disparity(self, file_path):
        disparity_map = _read_png_16(file_path).astype(np.float32)
        return disparity_map[None, :, :] / 32.0, None


class FallingThingsStereo(StereoMatchingDataset):
    """Layout: ``root/FallingThings/{single,mixed}/.../*.{left,right}.jpg +
    *.depth.png + _camera_settings.json`` (reference
    ``_stereo_matching.py:720-821``)."""

    def __init__(self, root, variant="single", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "FallingThings"
        variants = {"single": ["single"], "mixed": ["mixed"],
                    "both": ["single", "mixed"]}[variant]
        prefix = {"single": Path("*") / "*", "mixed": Path("*")}
        for s in variants:
            self._images += self._scan_pairs(
                str(root / s / prefix[s] / "*.left.jpg"),
                str(root / s / prefix[s] / "*.right.jpg"))
            self._disparities += self._scan_pairs(
                str(root / s / prefix[s] / "*.left.depth.png"),
                str(root / s / prefix[s] / "*.right.depth.png"))

    def _read_disparity(self, file_path):
        depth = _read_png_16(file_path)
        with open(Path(file_path).parent / "_camera_settings.json") as f:
            intrinsics = json.load(f)
        focal = intrinsics["camera_settings"][0]["intrinsic_settings"]["fx"]
        baseline, pixel_constant = 6, 100
        disparity_map = (baseline * focal * pixel_constant) / depth.astype(np.float32)
        return disparity_map[None, :, :], None


class SceneFlowStereo(StereoMatchingDataset):
    """Layout: ``root/SceneFlow/<variant>/frames_<pass>pass/.../{left,right}/
    *.png`` + ``disparity/.../*.pfm`` (reference ``_stereo_matching.py:824-933``)."""

    def __init__(self, root, variant="FlyingThings3D", pass_name="clean",
                 transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "SceneFlow"
        passes = {"clean": ["frames_cleanpass"], "final": ["frames_finalpass"],
                  "both": ["frames_cleanpass", "frames_finalpass"]}[pass_name]
        root = root / variant
        prefix = {"Monkaa": Path("*"), "FlyingThings3D": Path("*") / "*" / "*",
                  "Driving": Path("*") / "*" / "*"}
        for p in passes:
            self._images += self._scan_pairs(
                str(root / p / prefix[variant] / "left" / "*.png"),
                str(root / p / prefix[variant] / "right" / "*.png"))
            self._disparities += self._scan_pairs(
                str(root / "disparity" / prefix[variant] / "left" / "*.pfm"),
                str(root / "disparity" / prefix[variant] / "right" / "*.pfm"))

    def _read_disparity(self, file_path):
        return np.abs(_read_pfm_file(file_path)), None


class SintelStereo(StereoMatchingDataset):
    """Layout: ``root/Sintel/training/{<pass>_left,<pass>_right,disparities,
    occlusions,outofframe}/<scene>/*.png`` (reference
    ``_stereo_matching.py:936-1055``)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, pass_name="final", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "Sintel"
        pass_names = {"final": ["final"], "clean": ["clean"],
                      "both": ["final", "clean"]}[pass_name]
        for p in pass_names:
            self._images += self._scan_pairs(
                str(root / "training" / f"{p}_left" / "*" / "*.png"),
                str(root / "training" / f"{p}_right" / "*" / "*.png"))
            self._disparities += self._scan_pairs(
                str(root / "training" / "disparities" / "*" / "*.png"), None)

    def _get_occlusion_mask_paths(self, file_path):
        fpath = Path(file_path)
        sampledir = fpath.parent.parent.parent
        occlusion = sampledir / "occlusions" / fpath.parent.name / fpath.name
        outofframe = sampledir / "outofframe" / fpath.parent.name / fpath.name
        if not occlusion.exists():
            raise FileNotFoundError(f"Occlusion mask {occlusion} does not exist")
        if not outofframe.exists():
            raise FileNotFoundError(f"Out of frame mask {outofframe} does not exist")
        return str(occlusion), str(outofframe)

    def _read_disparity(self, file_path):
        if file_path is None:
            return None, None
        arr = _read_png_16(file_path).astype(np.float32)
        r, g, b = np.split(arr, 3, axis=-1)
        disparity_map = r * 4 + g / (2**6) + b / (2**14)
        disparity_map = np.transpose(disparity_map, (2, 0, 1))
        occ_path, off_path = self._get_occlusion_mask_paths(file_path)
        valid_mask = _read_png_16(occ_path) == 0
        off_mask = _read_png_16(off_path) == 0
        return disparity_map, np.logical_and(off_mask, valid_mask)


class InStereo2k(StereoMatchingDataset):
    """Layout: ``root/InStereo2k/<split>/<scene>/{left,right}.png +
    {left,right}_disp.png`` (reference ``_stereo_matching.py:1058-1124``)."""

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "InStereo2k" / split
        self._images = self._scan_pairs(
            str(root / "*" / "left.png"), str(root / "*" / "right.png"))
        self._disparities = self._scan_pairs(
            str(root / "*" / "left_disp.png"), str(root / "*" / "right_disp.png"))

    def _read_disparity(self, file_path):
        disparity_map = _read_png_16(file_path).astype(np.float32)
        return disparity_map[None, :, :] / 1024.0, None


class ETH3DStereo(StereoMatchingDataset):
    """Layout: ``root/ETH3D/two_view_training[_gt]/<scene>/...`` (reference
    ``_stereo_matching.py:1127-1224``)."""

    _has_built_in_disparity_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root, transforms)
        root = Path(root) / "ETH3D"
        img_dir = "two_view_training" if split == "train" else "two_view_test"
        self._images = self._scan_pairs(
            str(root / img_dir / "*" / "im0.png"),
            str(root / img_dir / "*" / "im1.png"))
        if split == "test":
            self._disparities = [(None, None) for _ in self._images]
        else:
            self._disparities = self._scan_pairs(
                str(root / "two_view_training_gt" / "*" / "disp0GT.pfm"), None)

    def _read_disparity(self, file_path):
        if file_path is None:
            return None, None
        disparity_map = np.abs(_read_pfm_file(file_path))
        valid_mask = _read_png_16(Path(file_path).parent / "mask0nocc.png").astype(bool)
        return disparity_map, valid_mask
