"""Additional named datasets: ImageNet (folder layout), STL10, SVHN,
Caltech101-style folder sets (reference ``torchvision/datasets/{imagenet,
stl10,svhn}.py``)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from .folder import ImageFolder
from .utils import check_integrity, download_and_extract_archive, download_url
from .vision import VisionDataset

__all__ = ["ImageNet", "STL10", "SVHN"]


class ImageNet(ImageFolder):
    """ImageNet as the standard train/val folder tree (reference
    ``datasets/imagenet.py``: after extraction it *is* an ImageFolder; the
    devkit metadata loading is skipped — provide ``root/<split>`` trees)."""

    def __init__(self, root: str, split: str = "train", **kwargs):
        self.split = split
        super().__init__(os.path.join(root, split), **kwargs)
        self.wnids = self.classes
        self.wnid_to_idx = self.class_to_idx


class STL10(VisionDataset):
    """(reference ``datasets/stl10.py``): binary uint8 records, NHWC out."""

    base_folder = "stl10_binary"
    url = "http://ai.stanford.edu/~acoates/stl10/stl10_binary.tar.gz"
    filename = "stl10_binary.tar.gz"
    tgz_md5 = "91f7769df0f17e558f3565bffb0c7dfb"
    classes = ["airplane", "bird", "car", "cat", "deer", "dog", "horse",
               "monkey", "ship", "truck"]

    def __init__(
        self,
        root: str,
        split: str = "train",
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        download: bool = False,
    ):
        super().__init__(root, transform=transform, target_transform=target_transform)
        if split not in ("train", "test", "unlabeled"):
            raise ValueError(f"invalid split {split!r}")
        self.split = split
        if download:
            download_and_extract_archive(self.url, self.root, filename=self.filename, md5=self.tgz_md5)
        folder = os.path.join(self.root, self.base_folder)
        img_file = os.path.join(folder, f"{split}_X.bin")
        if not os.path.exists(img_file):
            raise RuntimeError(f"STL10 not found at {folder}; use download=True")
        with open(img_file, "rb") as f:
            raw = np.frombuffer(f.read(), np.uint8)
        # stored as (N, 3, 96, 96) column-major pixels -> NHWC
        imgs = raw.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)
        self.data = np.ascontiguousarray(imgs)
        lbl_file = os.path.join(folder, f"{split}_y.bin")
        if os.path.exists(lbl_file):
            with open(lbl_file, "rb") as f:
                self.labels = np.frombuffer(f.read(), np.uint8).astype(np.int64) - 1
        else:
            self.labels = np.full((len(self.data),), -1, np.int64)

    def __getitem__(self, index: int):
        img, target = self.data[index], int(self.labels[index])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.data)


class SVHN(VisionDataset):
    """(reference ``datasets/svhn.py``): .mat archives parsed with scipy if
    available, else a clear error."""

    split_files = {
        "train": ("train_32x32.mat", "http://ufldl.stanford.edu/housenumbers/train_32x32.mat", "e26dedcc434d2e4c54c9b2d4a06d8373"),
        "test": ("test_32x32.mat", "http://ufldl.stanford.edu/housenumbers/test_32x32.mat", "eb5a983be6a315427106f1b164d9cef3"),
        "extra": ("extra_32x32.mat", "http://ufldl.stanford.edu/housenumbers/extra_32x32.mat", "a93ce644f1a588dc4d68dda5feec44a7"),
    }

    def __init__(
        self,
        root: str,
        split: str = "train",
        transform: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        download: bool = False,
    ):
        super().__init__(root, transform=transform, target_transform=target_transform)
        if split not in self.split_files:
            raise ValueError(f"invalid split {split!r}")
        filename, url, md5 = self.split_files[split]
        path = os.path.join(self.root, filename)
        if download and not check_integrity(path, md5):
            download_url(url, self.root, filename, md5)
        if not os.path.exists(path):
            raise RuntimeError(f"SVHN not found at {path}; use download=True")
        try:
            from scipy.io import loadmat
        except ImportError as e:
            raise RuntimeError("SVHN requires scipy to parse .mat files") from e
        mat = loadmat(path)
        self.data = np.ascontiguousarray(mat["X"].transpose(3, 0, 1, 2))  # NHWC
        self.labels = mat["y"].astype(np.int64).squeeze() % 10  # label 10 -> 0

    def __getitem__(self, index: int):
        img, target = self.data[index], int(self.labels[index])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.data)
