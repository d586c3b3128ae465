"""More named datasets: CelebA, LFWPeople, FER2013, Omniglot, SBDataset-style
folder sets (reference ``torchvision/datasets/{celeba,lfw,fer2013,omniglot}.py``)."""

from __future__ import annotations

import csv
import os

import numpy as np

from .folder import default_loader
from .vision import VisionDataset

__all__ = ["CelebA", "LFWPeople", "FER2013", "Omniglot"]


class CelebA(VisionDataset):
    """Layout: ``root/celeba/img_align_celeba/*.jpg`` + ``list_attr_celeba.txt``
    + ``list_eval_partition.txt`` (reference ``datasets/celeba.py``).

    ``target_type='attr'`` yields the 40-dim binary attribute vector.
    """

    def __init__(self, root, split="train", target_type="attr",
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "celeba")
        part_file = os.path.join(base, "list_eval_partition.txt")
        attr_file = os.path.join(base, "list_attr_celeba.txt")
        if not os.path.exists(part_file):
            raise RuntimeError(f"CelebA partition file not found: {part_file}")
        split_code = {"train": 0, "valid": 1, "test": 2, "all": None}[split]
        partitions = {}
        with open(part_file) as f:
            for line in f:
                if line.strip():
                    name, code = line.split()
                    partitions[name] = int(code)
        attrs = {}
        self.attr_names = []
        if os.path.exists(attr_file):
            with open(attr_file) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
            self.attr_names = lines[1].split()
            for line in lines[2:]:
                parts = line.split()
                attrs[parts[0]] = np.asarray(
                    [(int(v) + 1) // 2 for v in parts[1:]], np.int64
                )
        self.loader = loader
        self.target_type = target_type
        self.samples = [
            (os.path.join(base, "img_align_celeba", name), attrs.get(name))
            for name, code in sorted(partitions.items())
            if split_code is None or code == split_code
        ]

    def __getitem__(self, index):
        path, attr = self.samples[index]
        img = self.loader(path)
        target = attr if self.target_type == "attr" else None
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None and target is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.samples)


class LFWPeople(VisionDataset):
    """Layout: ``root/lfw-py/lfw/<Person_Name>/<Person>_NNNN.jpg`` + split
    lists ``peopleDevTrain.txt``/``peopleDevTest.txt`` (reference
    ``datasets/lfw.py``)."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "lfw-py")
        images = os.path.join(base, "lfw")
        lst = os.path.join(base, "peopleDevTrain.txt" if split == "train" else "peopleDevTest.txt")
        if not os.path.exists(lst):
            raise RuntimeError(f"LFW split list not found: {lst}")
        people = []
        with open(lst) as f:
            lines = [l.strip() for l in f if l.strip()]
        for line in lines[1:]:  # first line is the count
            name, n = line.split("\t") if "\t" in line else line.split()
            people.append((name, int(n)))
        self.class_to_idx = {name: i for i, (name, _) in enumerate(sorted(people))}
        self.loader = loader
        self.samples = []
        for name, n in people:
            for i in range(1, n + 1):
                self.samples.append(
                    (os.path.join(images, name, f"{name}_{i:04d}.jpg"), self.class_to_idx[name])
                )

    def __getitem__(self, index):
        path, target = self.samples[index]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.samples)


class FER2013(VisionDataset):
    """``root/fer2013/{train,test}.csv`` with 48x48 space-separated pixel
    strings (reference ``datasets/fer2013.py``)."""

    def __init__(self, root, split="train", transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        path = os.path.join(self.root, "fer2013", f"{split}.csv")
        if not os.path.exists(path):
            raise RuntimeError(f"FER2013 csv not found: {path}")
        self.data = []
        self.targets = []
        with open(path) as f:
            for row in csv.DictReader(f):
                pixels = np.fromstring(row["pixels"], np.uint8, sep=" ")
                self.data.append(pixels.reshape(48, 48, 1))
                self.targets.append(int(row.get("emotion", -1)))

    def __getitem__(self, index):
        img, target = self.data[index], self.targets[index]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.data)


class Omniglot(VisionDataset):
    """Layout: ``root/omniglot-py/images_{background,evaluation}/<alphabet>/
    <character>/*.png`` (reference ``datasets/omniglot.py``)."""

    def __init__(self, root, background=True, transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        target_dir = os.path.join(
            self.root, "omniglot-py",
            "images_background" if background else "images_evaluation",
        )
        if not os.path.isdir(target_dir):
            raise RuntimeError(f"Omniglot not found at {target_dir}")
        self.loader = loader
        self._characters = []
        self.samples = []
        for alphabet in sorted(os.listdir(target_dir)):
            adir = os.path.join(target_dir, alphabet)
            if not os.path.isdir(adir):
                continue
            for char in sorted(os.listdir(adir)):
                cdir = os.path.join(adir, char)
                idx = len(self._characters)
                self._characters.append(f"{alphabet}/{char}")
                for fname in sorted(os.listdir(cdir)):
                    if fname.endswith(".png"):
                        self.samples.append((os.path.join(cdir, fname), idx))

    def __getitem__(self, index):
        path, target = self.samples[index]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.samples)
