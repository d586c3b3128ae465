"""More named datasets (reference ``torchvision/datasets/{caltech,flowers102,
oxford_iiit_pet,dtd,eurosat,gtsrb,food101,country211}.py``) — each parses the
same on-disk layout as the reference."""

from __future__ import annotations

import csv
import json
import os
from typing import List, Tuple

from .folder import ImageFolder, default_loader
from .vision import VisionDataset

__all__ = [
    "Caltech101",
    "Caltech256",
    "Flowers102",
    "OxfordIIITPet",
    "DTD",
    "EuroSAT",
    "GTSRB",
    "Food101",
    "Country211",
]


class Caltech101(VisionDataset):
    """Layout: ``root/caltech101/101_ObjectCategories/<class>/image_*.jpg``."""

    def __init__(self, root, transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "caltech101", "101_ObjectCategories")
        if not os.path.isdir(base):
            raise RuntimeError(f"Caltech101 not found at {base}")
        self.categories = sorted(e for e in os.listdir(base) if not e.startswith("."))
        if "BACKGROUND_Google" in self.categories:
            self.categories.remove("BACKGROUND_Google")
        self.loader = loader
        self.samples: List[Tuple[str, int]] = []
        for idx, cat in enumerate(self.categories):
            d = os.path.join(base, cat)
            for fname in sorted(os.listdir(d)):
                self.samples.append((os.path.join(d, fname), idx))

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


class Caltech256(Caltech101):
    """Layout: ``root/caltech256/256_ObjectCategories/<nnn.class>/*.jpg``."""

    def __init__(self, root, transform=None, target_transform=None, loader=default_loader):
        VisionDataset.__init__(self, root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "caltech256", "256_ObjectCategories")
        if not os.path.isdir(base):
            raise RuntimeError(f"Caltech256 not found at {base}")
        self.categories = sorted(os.listdir(base))
        self.loader = loader
        self.samples = []
        for idx, cat in enumerate(self.categories):
            d = os.path.join(base, cat)
            for fname in sorted(os.listdir(d)):
                if fname.lower().endswith((".jpg", ".jpeg", ".png")):
                    self.samples.append((os.path.join(d, fname), idx))


class Flowers102(VisionDataset):
    """Layout: ``root/flowers-102/jpg/image_XXXXX.jpg`` + ``imagelabels.mat``
    + ``setid.mat`` (scipy) — or the pre-split JSON fallback
    ``splits.json`` {split: [[filename, label], ...]}."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "flowers-102")
        self.loader = loader
        json_split = os.path.join(base, "splits.json")
        if os.path.exists(json_split):
            with open(json_split) as f:
                entries = json.load(f)[split]
            self.samples = [(os.path.join(base, "jpg", n), int(l)) for n, l in entries]
            return
        from scipy.io import loadmat

        labels = loadmat(os.path.join(base, "imagelabels.mat"))["labels"][0] - 1
        setid = loadmat(os.path.join(base, "setid.mat"))
        key = {"train": "trnid", "val": "valid", "test": "tstid"}[split]
        ids = setid[key][0]
        self.samples = [
            (os.path.join(base, "jpg", f"image_{i:05d}.jpg"), int(labels[i - 1])) for i in ids
        ]

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


class OxfordIIITPet(VisionDataset):
    """Layout: ``root/oxford-iiit-pet/images/*.jpg`` +
    ``annotations/{trainval,test}.txt`` (name class_id species breed)."""

    def __init__(self, root, split="trainval", target_types="category",
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "oxford-iiit-pet")
        ann = os.path.join(base, "annotations", f"{split}.txt")
        if not os.path.exists(ann):
            raise RuntimeError(f"OxfordIIITPet split file not found: {ann}")
        self.loader = loader
        self.samples = []
        with open(ann) as f:
            for line in f:
                if not line.strip() or line.startswith("#"):
                    continue
                name, class_id, *_ = line.split()
                self.samples.append((os.path.join(base, "images", f"{name}.jpg"), int(class_id) - 1))

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


class DTD(VisionDataset):
    """Describable Textures: ``root/dtd/images/<class>/*.jpg`` +
    ``labels/{split}{fold}.txt`` lists of ``class/file.jpg``."""

    def __init__(self, root, split="train", partition=1, transform=None,
                 target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "dtd")
        lst = os.path.join(base, "labels", f"{split}{partition}.txt")
        if not os.path.exists(lst):
            raise RuntimeError(f"DTD split list not found: {lst}")
        with open(lst) as f:
            rels = [line.strip() for line in f if line.strip()]
        classes = sorted({r.split("/")[0] for r in rels})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.classes = classes
        self.loader = loader
        self.samples = [
            (os.path.join(base, "images", r), self.class_to_idx[r.split("/")[0]]) for r in rels
        ]

    __getitem__ = OxfordIIITPet.__getitem__
    __len__ = OxfordIIITPet.__len__


class EuroSAT(ImageFolder):
    """Layout: ``root/eurosat/2750/<class>/*.jpg`` — a plain ImageFolder."""

    def __init__(self, root, **kwargs):
        super().__init__(os.path.join(root, "eurosat", "2750"), **kwargs)


class Country211(ImageFolder):
    """Layout: ``root/country211/{train,valid,test}/<class>/*.jpg``."""

    def __init__(self, root, split="train", **kwargs):
        super().__init__(os.path.join(root, "country211", split), **kwargs)


class GTSRB(VisionDataset):
    """German traffic signs: train = class folders of .ppm/.png; test =
    ``GT-final_test.csv`` (Filename;...;ClassId)."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "gtsrb")
        self.loader = loader
        self.samples = []
        if split == "train":
            d = os.path.join(base, "GTSRB", "Training")
            if not os.path.isdir(d):
                raise RuntimeError(f"GTSRB training dir not found: {d}")
            for cls in sorted(os.listdir(d)):
                cd = os.path.join(d, cls)
                if not os.path.isdir(cd):
                    continue
                for fname in sorted(os.listdir(cd)):
                    if fname.lower().endswith((".ppm", ".png", ".jpg")):
                        self.samples.append((os.path.join(cd, fname), int(cls)))
        else:
            d = os.path.join(base, "GTSRB", "Final_Test", "Images")
            csv_path = os.path.join(base, "GT-final_test.csv")
            with open(csv_path) as f:
                for row in csv.DictReader(f, delimiter=";"):
                    self.samples.append((os.path.join(d, row["Filename"]), int(row["ClassId"])))

    __getitem__ = OxfordIIITPet.__getitem__
    __len__ = OxfordIIITPet.__len__


class Food101(VisionDataset):
    """Layout: ``root/food-101/images/<class>/*.jpg`` +
    ``meta/{train,test}.json`` {class: [relpaths]}."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "food-101")
        with open(os.path.join(base, "meta", f"{split}.json")) as f:
            meta = json.load(f)
        self.classes = sorted(meta.keys())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.loader = loader
        self.samples = []
        for cls, rels in meta.items():
            for rel in rels:
                self.samples.append(
                    (os.path.join(base, "images", f"{rel}.jpg"), self.class_to_idx[cls])
                )

    __getitem__ = OxfordIIITPet.__getitem__
    __len__ = OxfordIIITPet.__len__
