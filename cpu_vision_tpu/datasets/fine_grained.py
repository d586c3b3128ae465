"""Classification long-tail datasets (reference ``torchvision/datasets/
{usps,semeion,stanford_cars,sun397,clevr,fgvc_aircraft,rendered_sst2,pcam,
places365,inaturalist,imagenette}.py``) — each parses the same on-disk
layout as the reference."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .folder import default_loader, find_classes, make_dataset
from .vision import VisionDataset

__all__ = [
    "USPS",
    "SEMEION",
    "StanfordCars",
    "SUN397",
    "CLEVRClassification",
    "FGVCAircraft",
    "RenderedSST2",
    "PCAM",
    "Places365",
    "INaturalist",
    "Imagenette",
]


class USPS(VisionDataset):
    """libsvm-format digit records in ``root/usps.bz2`` / ``usps.t.bz2``
    (reference ``datasets/usps.py:55-72``): lines of ``label idx:val*256``
    with values in [-1, 1], rescaled to uint8."""

    split_files = {"train": "usps.bz2", "test": "usps.t.bz2"}

    def __init__(self, root, train=True, transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        import bz2

        fname = self.split_files["train" if train else "test"]
        path = os.path.join(self.root, fname)
        with bz2.open(path) as fp:
            raw = [line.decode().split() for line in fp.readlines()]
        vals = [[x.split(":")[-1] for x in row[1:]] for row in raw]
        imgs = np.asarray(vals, dtype=np.float32).reshape(-1, 16, 16)
        self.data = ((imgs + 1) / 2 * 255).astype(np.uint8)
        self.targets = [int(row[0]) - 1 for row in raw]

    def __getitem__(self, index):
        img = self.data[index][:, :, None]  # HWC uint8
        target = int(self.targets[index])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.data)


class SEMEION(VisionDataset):
    """``root/semeion.data``: 256 float pixels + 10-dim one-hot label per
    line (reference ``datasets/semeion.py:44-51``)."""

    filename = "semeion.data"

    def __init__(self, root, transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        data = np.loadtxt(os.path.join(self.root, self.filename))
        self.data = (data[:, :256] * 255).astype(np.uint8).reshape(-1, 16, 16)
        self.labels = np.nonzero(data[:, 256:])[1]

    def __getitem__(self, index):
        img = self.data[index][:, :, None]
        target = int(self.labels[index])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.data)


class StanfordCars(VisionDataset):
    """Layout: ``root/stanford_cars/{devkit/cars_train_annos.mat, cars_train/,
    cars_test_annos_withlabels.mat, cars_test/}`` (reference
    ``datasets/stanford_cars.py:46-82``)."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        from scipy.io import loadmat

        base = Path(self.root) / "stanford_cars"
        devkit = base / "devkit"
        if split == "train":
            annos, img_dir = devkit / "cars_train_annos.mat", base / "cars_train"
        else:
            annos, img_dir = base / "cars_test_annos_withlabels.mat", base / "cars_test"
        if not annos.exists():
            raise RuntimeError(f"StanfordCars annotations not found: {annos}")
        self.loader = loader
        self._samples = [
            (str(img_dir / a["fname"]), int(a["class"]) - 1)
            for a in np.atleast_1d(loadmat(annos, squeeze_me=True)["annotations"])
        ]
        meta = devkit / "cars_meta.mat"
        if meta.exists():
            self.classes = list(loadmat(str(meta), squeeze_me=True)["class_names"])
            self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

    def __getitem__(self, index):
        path, target = self._samples[index]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self._samples)


class SUN397(VisionDataset):
    """Layout: ``root/SUN397/ClassName.txt`` + ``<letter>/<class>/sun_*.jpg``
    trees (reference ``datasets/sun397.py:38-55``)."""

    def __init__(self, root, transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = Path(self.root) / "SUN397"
        if not base.is_dir():
            raise RuntimeError(f"SUN397 not found at {base}")
        with open(base / "ClassName.txt") as f:
            self.classes = [c[3:].strip() for c in f]
        self.class_to_idx = dict(zip(self.classes, range(len(self.classes))))
        self.loader = loader
        self._image_files = sorted(base.rglob("sun_*.jpg"))
        self._labels = [
            self.class_to_idx["/".join(p.relative_to(base).parts[1:-1])]
            for p in self._image_files
        ]

    def __getitem__(self, index):
        img = self.loader(str(self._image_files[index]))
        target = self._labels[index]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self._image_files)


class CLEVRClassification(VisionDataset):
    """Layout: ``root/clevr/CLEVR_v1.0/images/<split>/*`` + per-split scene
    JSON; label = object count (reference ``datasets/clevr.py:51-60``)."""

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = Path(self.root) / "clevr" / "CLEVR_v1.0"
        if not base.is_dir():
            raise RuntimeError(f"CLEVR not found at {base}")
        self.loader = loader
        self._image_files = sorted((base / "images" / split).glob("*"))
        self._labels: List[Optional[int]]
        if split != "test":
            with open(base / "scenes" / f"CLEVR_{split}_scenes.json") as f:
                content = json.load(f)
            counts = {s["image_filename"]: len(s["objects"]) for s in content["scenes"]}
            self._labels = [counts[p.name] for p in self._image_files]
        else:
            self._labels = [None] * len(self._image_files)

    def __getitem__(self, index):
        img = self.loader(str(self._image_files[index]))
        target = self._labels[index]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self._image_files)


class FGVCAircraft(VisionDataset):
    """Layout: ``root/fgvc-aircraft-2013b/data/{images/, variants.txt,
    images_variant_<split>.txt}`` (reference ``datasets/fgvc_aircraft.py:66-91``)."""

    _levels = {"variant": "variants.txt", "family": "families.txt",
               "manufacturer": "manufacturers.txt"}

    def __init__(self, root, split="trainval", annotation_level="variant",
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        data = os.path.join(self.root, "fgvc-aircraft-2013b", "data")
        if not os.path.isdir(data):
            raise RuntimeError(f"FGVCAircraft not found at {data}")
        with open(os.path.join(data, self._levels[annotation_level])) as f:
            self.classes = [line.strip() for line in f]
        self.class_to_idx = dict(zip(self.classes, range(len(self.classes))))
        self.loader = loader
        self._image_files, self._labels = [], []
        with open(os.path.join(data, f"images_{annotation_level}_{split}.txt")) as f:
            for line in f:
                name, label = line.strip().split(" ", 1)
                self._image_files.append(os.path.join(data, "images", f"{name}.jpg"))
                self._labels.append(self.class_to_idx[label])

    __getitem__ = SUN397.__getitem__
    __len__ = SUN397.__len__


class RenderedSST2(VisionDataset):
    """Layout: ``root/rendered-sst2/{train,valid,test}/{negative,positive}/*.png``
    (reference ``datasets/rendered_sst2.py:57-58``)."""

    _folders = {"train": "train", "val": "valid", "test": "test"}

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = Path(self.root) / "rendered-sst2" / self._folders[split]
        self.classes = ["negative", "positive"]
        self.class_to_idx = {"negative": 0, "positive": 1}
        self.loader = loader
        self._samples = make_dataset(str(base), self.class_to_idx, extensions=(".png",))

    def __getitem__(self, index):
        path, target = self._samples[index]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self._samples)


class PCAM(VisionDataset):
    """PatchCamelyon h5 pairs ``root/pcam/camelyonpatch_level_2_split_<split>_
    {x,y}.h5`` (reference ``datasets/pcam.py:21-39,102-119``); requires h5py."""

    _split_names = {"train": "train", "test": "test", "val": "valid"}

    def __init__(self, root, split="train", transform=None, target_transform=None):
        import h5py

        self.h5py = h5py
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = Path(self.root) / "pcam"
        name = self._split_names[split]
        self._images_file = base / f"camelyonpatch_level_2_split_{name}_x.h5"
        self._targets_file = base / f"camelyonpatch_level_2_split_{name}_y.h5"
        if not (self._images_file.exists() and self._targets_file.exists()):
            raise RuntimeError(f"PCAM h5 files not found under {base}")

    def __len__(self):
        with self.h5py.File(self._images_file) as f:
            return f["x"].shape[0]

    def __getitem__(self, index):
        with self.h5py.File(self._images_file) as f:
            img = np.asarray(f["x"][index], dtype=np.uint8)  # HWC
        with self.h5py.File(self._targets_file) as f:
            target = int(f["y"][index, 0, 0, 0])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class Places365(VisionDataset):
    """Devkit file-lists + image trees (reference ``datasets/places365.py:
    100-141``): ``categories_places365.txt`` maps class->idx; per-split list
    ``places365_<split>.txt`` holds ``<relpath> <idx>`` lines resolved against
    ``data_<size>_<variant>/`` (train) or ``<split>_<size>/``."""

    _splits = ("train-standard", "train-challenge", "val")

    def __init__(self, root, split="train-standard", small=False,
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        if split not in self._splits:
            raise ValueError(f"split must be one of {self._splits}, got {split!r}")
        self.split = split
        self.small = small
        self.loader = loader
        variant = "challenge" if "challenge" in split else "standard"
        size = "256" if small else "large"
        if split.startswith("train"):
            images_dir = os.path.join(self.root, f"data_{size}_{variant}")
        else:
            images_dir = os.path.join(self.root, f"{split}_{size}")
        self.images_dir = images_dir

        with open(os.path.join(self.root, "categories_places365.txt")) as f:
            pairs = [line.split() for line in f]
        self.class_to_idx = {cls: int(idx) for cls, idx in pairs}
        self.classes = sorted(self.class_to_idx)

        list_name = {"train-standard": "places365_train_standard.txt",
                     "train-challenge": "places365_train_challenge.txt",
                     "val": "places365_val.txt"}[split]
        with open(os.path.join(self.root, list_name)) as f:
            self.imgs = []
            for line in f:
                image, idx = line.split()
                self.imgs.append(
                    (os.path.join(images_dir, image.lstrip("/").replace("/", os.sep)),
                     int(idx))
                )
        self.targets = [t for _, t in self.imgs]

    def __getitem__(self, index):
        path, target = self.imgs[index]
        img = self.loader(path)
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target

    def __len__(self):
        return len(self.imgs)


class INaturalist(VisionDataset):
    """2021 layout: ``root/<version>/<XXXXX>_<kingdom>_..._<species>/*.jpg``
    (reference ``datasets/inaturalist.py:114-135``). ``target_type`` picks the
    taxonomy level ('full' = directory index)."""

    CATEGORIES_2021 = ["kingdom", "phylum", "class", "order", "family", "genus"]

    def __init__(self, root, version="2021_train", target_type="full",
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(os.path.join(root, version), transform=transform,
                         target_transform=target_transform)
        if not os.path.isdir(self.root):
            raise RuntimeError(f"INaturalist not found at {self.root}")
        self.version = version
        self.loader = loader
        self.target_type = target_type if isinstance(target_type, list) else [target_type]

        self.all_categories = sorted(os.listdir(self.root))
        self.categories_index = {k: {} for k in self.CATEGORIES_2021}
        self.categories_map: List[dict] = []
        for dir_index, dir_name in enumerate(self.all_categories):
            pieces = dir_name.split("_")
            if len(pieces) != 8:
                raise RuntimeError(f"Unexpected category name {dir_name}")
            cat_map = {}
            for cat, name in zip(self.CATEGORIES_2021, pieces[1:7]):
                cat_id = self.categories_index[cat].setdefault(
                    name, len(self.categories_index[cat]))
                cat_map[cat] = cat_id
            self.categories_map.append(cat_map)

        self.index: List[Tuple[int, str]] = []
        for dir_index, dir_name in enumerate(self.all_categories):
            for fname in sorted(os.listdir(os.path.join(self.root, dir_name))):
                self.index.append((dir_index, fname))

    def __getitem__(self, index):
        cat_id, fname = self.index[index]
        img = self.loader(os.path.join(self.root, self.all_categories[cat_id], fname))
        targets = []
        for t in self.target_type:
            targets.append(cat_id if t == "full" else self.categories_map[cat_id][t])
        target = tuple(targets) if len(targets) > 1 else targets[0]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.index)

    def category_name(self, category_type: str, category_id: int) -> str:
        """Inverse lookup (reference ``inaturalist.py:205-230``)."""
        if category_type == "full":
            return self.all_categories[category_id]
        for name, idx in self.categories_index[category_type].items():
            if idx == category_id:
                return name
        raise ValueError(f"Invalid category id {category_id} for {category_type}")


class Imagenette(VisionDataset):
    """fast.ai 10-class ImageNet subset: ``root/imagenette2[-320|-160]/
    {train,val}/<wnid>/*.JPEG`` (reference ``datasets/imagenette.py:32-82``)."""

    _WNID_TO_CLASS = {
        "n01440764": ("tench", "Tinca tinca"),
        "n02102040": ("English springer", "English springer spaniel"),
        "n02979186": ("cassette player",),
        "n03000684": ("chain saw", "chainsaw"),
        "n03028079": ("church", "church building"),
        "n03394916": ("French horn", "horn"),
        "n03417042": ("garbage truck", "dustcart"),
        "n03425413": ("gas pump", "gasoline pump", "petrol pump", "island dispenser"),
        "n03445777": ("golf ball",),
        "n03888257": ("parachute", "chute"),
    }
    _size_dirs = {"full": "imagenette2", "320px": "imagenette2-320",
                  "160px": "imagenette2-160"}

    def __init__(self, root, split="train", size="full", transform=None,
                 target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        image_root = os.path.join(self.root, self._size_dirs[size], split)
        if not os.path.isdir(image_root):
            raise RuntimeError(f"Imagenette not found at {image_root}")
        self.loader = loader
        self.wnids, self.wnid_to_idx = find_classes(image_root)
        self.classes = [self._WNID_TO_CLASS[w] for w in self.wnids]
        self.class_to_idx = {
            name: idx for wnid, idx in self.wnid_to_idx.items()
            for name in self._WNID_TO_CLASS[wnid]
        }
        self._samples = make_dataset(image_root, self.wnid_to_idx,
                                     extensions=(".jpeg",))

    __getitem__ = RenderedSST2.__getitem__
    __len__ = RenderedSST2.__len__
