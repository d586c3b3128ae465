"""Optical-flow datasets (reference ``torchvision/datasets/_optical_flow.py``):
KittiFlow, Sintel, FlyingChairs, FlyingThings3D, HD1K — same on-disk layouts,
same (img1, img2, flow[, valid_mask]) tuples. Flow arrays are (2, H, W)
float32, matching the reference."""

from __future__ import annotations

import itertools
import os
import re
from abc import ABC, abstractmethod
from glob import glob
from pathlib import Path
from typing import Callable, List, Optional, Tuple

import numpy as np

from .folder import default_loader
from .vision import VisionDataset

__all__ = ["KittiFlow", "Sintel", "FlyingThings3D", "FlyingChairs", "HD1K"]


def _read_flo(file_name: str) -> np.ndarray:
    """Middlebury .flo reader (reference ``_optical_flow.py:466-480``)."""
    with open(file_name, "rb") as f:
        magic = f.read(4)
        if magic != b"PIEH":
            raise ValueError("Magic number incorrect. Invalid .flo file")
        w = int(np.frombuffer(f.read(4), "<i4")[0])
        h = int(np.frombuffer(f.read(4), "<i4")[0])
        data = np.frombuffer(f.read(8 * w * h), "<f4")
    return data.reshape(h, w, 2).transpose(2, 0, 1).astype(np.float32)


def _read_pfm(file_name: str, slice_channels: int = 2) -> np.ndarray:
    """PFM reader (reference ``datasets/utils.py:437-470``)."""
    with open(file_name, "rb") as f:
        header = f.readline().rstrip()
        if header not in (b"PF", b"Pf"):
            raise ValueError("Invalid PFM file")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        w, h = (int(d) for d in dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, dtype=endian + "f")
    channels = 3 if header == b"PF" else 1
    data = data.reshape(h, w, channels).transpose(2, 0, 1)
    data = np.flip(data, axis=1)  # PFM rows are bottom-up
    return data[:slice_channels].astype(np.float32)


def _read_16bits_png_with_flow_and_valid_mask(file_name: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI/HD1K 16-bit flow PNG: ((u, v) float32, valid bool) (reference
    ``_optical_flow.py:483-491``). True-16-bit decode (the native shim
    downscales 16-bit PNG to 8-bit by design)."""
    from ..io._png16 import read_png_16

    arr = read_png_16(file_name).astype(np.float32)  # (H, W, 3) uint16
    flow_and_valid = arr.transpose(2, 0, 1)
    flow, valid = flow_and_valid[:2], flow_and_valid[2]
    flow = (flow - 2.0**15) / 64.0
    return flow.astype(np.float32), valid.astype(bool)


class FlowDataset(ABC, VisionDataset):
    """(reference ``_optical_flow.py:29-83``). Images are HWC uint8 arrays."""

    _has_builtin_flow_mask = False

    def __init__(self, root, transforms: Optional[Callable] = None):
        super().__init__(root=root)
        self.transforms = transforms
        self._flow_list: List[str] = []
        self._image_list: List[List[str]] = []

    def _read_img(self, file_name: str) -> np.ndarray:
        img = default_loader(file_name)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        return img

    @abstractmethod
    def _read_flow(self, file_name: str):
        ...

    def __getitem__(self, index):
        img1 = self._read_img(self._image_list[index][0])
        img2 = self._read_img(self._image_list[index][1])
        if self._flow_list:  # empty for test splits
            flow = self._read_flow(self._flow_list[index])
            if self._has_builtin_flow_mask:
                flow, valid_flow_mask = flow
            else:
                valid_flow_mask = None
        else:
            flow = valid_flow_mask = None
        if self.transforms is not None:
            img1, img2, flow, valid_flow_mask = self.transforms(
                img1, img2, flow, valid_flow_mask)
        if self._has_builtin_flow_mask or valid_flow_mask is not None:
            return img1, img2, flow, valid_flow_mask
        return img1, img2, flow

    def __len__(self):
        return len(self._image_list)


class Sintel(FlowDataset):
    """Layout: ``root/Sintel/{training,test}/{clean,final}/<scene>/*.png`` +
    ``training/flow/<scene>/*.flo`` (reference ``_optical_flow.py:86-170``)."""

    def __init__(self, root, split="train", pass_name="clean", transforms=None):
        super().__init__(root=root, transforms=transforms)
        passes = ["clean", "final"] if pass_name == "both" else [pass_name]
        root = Path(root) / "Sintel"
        flow_root = root / "training" / "flow"
        for p in passes:
            split_dir = "training" if split == "train" else split
            image_root = root / split_dir / p
            for scene in os.listdir(image_root):
                image_list = sorted(glob(str(image_root / scene / "*.png")))
                for i in range(len(image_list) - 1):
                    self._image_list.append([image_list[i], image_list[i + 1]])
                if split == "train":
                    self._flow_list += sorted(glob(str(flow_root / scene / "*.flo")))

    def _read_flow(self, file_name):
        return _read_flo(file_name)


class KittiFlow(FlowDataset):
    """Layout: ``root/KittiFlow/{training,testing}/image_2/*_1{0,1}.png`` +
    ``training/flow_occ`` (reference ``_optical_flow.py:173-232``)."""

    _has_builtin_flow_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root=root, transforms=transforms)
        root = Path(root) / "KittiFlow" / (split + "ing")
        images1 = sorted(glob(str(root / "image_2" / "*_10.png")))
        images2 = sorted(glob(str(root / "image_2" / "*_11.png")))
        if not images1 or not images2:
            raise FileNotFoundError(
                "Could not find the Kitti flow images. Please make sure the "
                "directory structure is correct.")
        for img1, img2 in zip(images1, images2):
            self._image_list.append([img1, img2])
        if split == "train":
            self._flow_list = sorted(glob(str(root / "flow_occ" / "*_10.png")))

    def _read_flow(self, file_name):
        return _read_16bits_png_with_flow_and_valid_mask(file_name)


class FlyingChairs(FlowDataset):
    """Layout: ``root/FlyingChairs/data/NNNNN_{img1,img2}.ppm + *_flow.flo`` +
    ``FlyingChairs_train_val.txt`` (reference ``_optical_flow.py:235-305``)."""

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root=root, transforms=transforms)
        root = Path(root) / "FlyingChairs"
        images = sorted(glob(str(root / "data" / "*.ppm")))
        flows = sorted(glob(str(root / "data" / "*.flo")))
        split_file = root / "FlyingChairs_train_val.txt"
        if not os.path.exists(split_file):
            raise FileNotFoundError(
                "The FlyingChairs_train_val.txt file was not found.")
        split_list = np.loadtxt(str(split_file), dtype=np.int32)
        for i in range(len(flows)):
            split_id = split_list[i]
            if (split == "train" and split_id == 1) or (split == "val" and split_id == 2):
                self._flow_list.append(flows[i])
                self._image_list.append([images[2 * i], images[2 * i + 1]])

    def _read_flow(self, file_name):
        return _read_flo(file_name)


class FlyingThings3D(FlowDataset):
    """Layout: ``root/FlyingThings3D/frames_{clean,final}pass/{TRAIN,TEST}`` +
    ``optical_flow/...`` pfm (reference ``_optical_flow.py:308-396``)."""

    def __init__(self, root, split="train", pass_name="clean", camera="left",
                 transforms=None):
        super().__init__(root=root, transforms=transforms)
        split = split.upper()
        passes = {"clean": ["frames_cleanpass"], "final": ["frames_finalpass"],
                  "both": ["frames_cleanpass", "frames_finalpass"]}[pass_name]
        cameras = ["left", "right"] if camera == "both" else [camera]
        root = Path(root) / "FlyingThings3D"
        directions = ("into_future", "into_past")
        for p, cam, direction in itertools.product(passes, cameras, directions):
            image_dirs = sorted(glob(str(root / p / split / "*/*")))
            image_dirs = sorted(Path(d) / cam for d in image_dirs)
            flow_dirs = sorted(glob(str(root / "optical_flow" / split / "*/*")))
            flow_dirs = sorted(Path(d) / direction / cam for d in flow_dirs)
            if not image_dirs or not flow_dirs:
                raise FileNotFoundError(
                    "Could not find the FlyingThings3D flow images.")
            for image_dir, flow_dir in zip(image_dirs, flow_dirs):
                images = sorted(glob(str(image_dir / "*.png")))
                flows = sorted(glob(str(flow_dir / "*.pfm")))
                for i in range(len(flows) - 1):
                    if direction == "into_future":
                        self._image_list.append([images[i], images[i + 1]])
                        self._flow_list.append(flows[i])
                    else:
                        self._image_list.append([images[i + 1], images[i]])
                        self._flow_list.append(flows[i + 1])

    def _read_flow(self, file_name):
        return _read_pfm(file_name)


class HD1K(FlowDataset):
    """Layout: ``root/hd1k/{hd1k_input,hd1k_flow_gt,hd1k_challenge}``
    (reference ``_optical_flow.py:399-463``)."""

    _has_builtin_flow_mask = True

    def __init__(self, root, split="train", transforms=None):
        super().__init__(root=root, transforms=transforms)
        root = Path(root) / "hd1k"
        if split == "train":
            for seq_idx in range(36):
                flows = sorted(glob(str(root / "hd1k_flow_gt" / "flow_occ"
                                        / f"{seq_idx:06d}_*.png")))
                images = sorted(glob(str(root / "hd1k_input" / "image_2"
                                         / f"{seq_idx:06d}_*.png")))
                for i in range(len(flows) - 1):
                    self._flow_list.append(flows[i])
                    self._image_list.append([images[i], images[i + 1]])
        else:
            images1 = sorted(glob(str(root / "hd1k_challenge" / "image_2" / "*10.png")))
            images2 = sorted(glob(str(root / "hd1k_challenge" / "image_2" / "*11.png")))
            for image1, image2 in zip(images1, images2):
                self._image_list.append([image1, image2])
        if not self._image_list:
            raise FileNotFoundError("Could not find the HD1K images.")

    def _read_flow(self, file_name):
        return _read_16bits_png_with_flow_and_valid_mask(file_name)
