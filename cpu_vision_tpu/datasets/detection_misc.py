"""Detection/misc long-tail datasets (reference ``torchvision/datasets/
{mnist,lfw,widerface,sbd,cityscapes,kitti,phototour,sbu,flickr,lsun}.py``) —
each parses the same on-disk layout as the reference."""

from __future__ import annotations

import csv
import glob
import json
import os
import string
import struct
from collections import defaultdict, namedtuple
from html.parser import HTMLParser
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .folder import default_loader
from .mnist import MNIST
from .vision import VisionDataset

__all__ = [
    "EMNIST",
    "QMNIST",
    "LFWPairs",
    "WIDERFace",
    "SBDataset",
    "Cityscapes",
    "Kitti",
    "PhotoTour",
    "SBU",
    "Flickr8k",
    "Flickr30k",
    "LSUN",
    "LSUNClass",
]


def _read_idx_any(path: str) -> np.ndarray:
    """General IDX reader incl. idx2-int (reference
    ``mnist.py:read_sn3_pascalvincent_tensor``, :505-541)."""
    with open(path, "rb") as f:
        data = f.read()
    magic = struct.unpack(">i", data[:4])[0]
    ndim = magic % 256
    ty = magic // 256
    dtype = {8: np.uint8, 9: np.int8, 11: np.dtype(">i2"), 12: np.dtype(">i4"),
             13: np.dtype(">f4"), 14: np.dtype(">f8")}[ty]
    dims = struct.unpack(f">{ndim}i", data[4 : 4 + 4 * ndim])
    arr = np.frombuffer(data, dtype, offset=4 + 4 * ndim).reshape(dims)
    return arr.astype(arr.dtype.newbyteorder("="))


class EMNIST(MNIST):
    """EMNIST raw IDX files ``EMNIST/raw/emnist-<split>-{train,test}-
    {images-idx3,labels-idx1}-ubyte`` (reference ``mnist.py:259-341``)."""

    splits = ("byclass", "bymerge", "balanced", "letters", "digits", "mnist")
    _merged = set("cijklmopsuvwxyz")
    _all = set(string.digits + string.ascii_letters)
    classes_split_dict = {
        "byclass": sorted(_all),
        "bymerge": sorted(_all - _merged),
        "balanced": sorted(_all - _merged),
        "letters": ["N/A"] + list(string.ascii_lowercase),
        "digits": list(string.digits),
        "mnist": list(string.digits),
    }

    def __init__(self, root, split, train=True, transform=None,
                 target_transform=None, download=False):
        if split not in self.splits:
            raise ValueError(f"split must be one of {self.splits}, got {split!r}")
        self.split = split
        VisionDataset.__init__(self, root, transform=transform,
                               target_transform=target_transform)
        self.train = train
        prefix = f"emnist-{split}-{'train' if train else 'test'}"
        img_path = os.path.join(self.raw_folder, f"{prefix}-images-idx3-ubyte")
        lbl_path = os.path.join(self.raw_folder, f"{prefix}-labels-idx1-ubyte")
        if not (os.path.exists(img_path) and os.path.exists(lbl_path)):
            raise RuntimeError(f"EMNIST raw files not found under {self.raw_folder}")
        self.data = _read_idx_any(img_path)
        self.targets = _read_idx_any(lbl_path).astype(np.int64)
        self.classes = self.classes_split_dict[split]

    @property
    def raw_folder(self) -> str:
        return os.path.join(self.root, "EMNIST", "raw")


class QMNIST(MNIST):
    """QMNIST raw pairs ``qmnist-{train,test}-images-idx3-ubyte`` +
    ``...-labels-idx2-int`` (reference ``mnist.py:343-483``). ``compat=True``
    yields the class index; otherwise the full 8-int label vector."""

    subsets = {"train": "train", "test": "test", "test10k": "test",
               "test50k": "test", "nist": "nist"}

    def __init__(self, root, what=None, compat=True, train=True,
                 transform=None, target_transform=None, download=False):
        if what is None:
            what = "train" if train else "test"
        if what not in self.subsets:
            raise ValueError(f"what must be one of {tuple(self.subsets)}, got {what!r}")
        self.what = what
        self.compat = compat
        VisionDataset.__init__(self, root, transform=transform,
                               target_transform=target_transform)
        self.train = what == "train"
        prefix = "xnist" if what == "nist" else f"qmnist-{self.subsets[what]}"
        img_path = os.path.join(self.raw_folder, f"{prefix}-images-idx3-ubyte")
        lbl_path = os.path.join(self.raw_folder, f"{prefix}-labels-idx2-int")
        if not (os.path.exists(img_path) and os.path.exists(lbl_path)):
            raise RuntimeError(f"QMNIST raw files not found under {self.raw_folder}")
        data = _read_idx_any(img_path)
        targets = _read_idx_any(lbl_path).astype(np.int64)
        if what == "test10k":
            data, targets = data[:10000], targets[:10000]
        elif what == "test50k":
            data, targets = data[10000:], targets[10000:]
        self.data, self.targets = data, targets

    @property
    def raw_folder(self) -> str:
        return os.path.join(self.root, "QMNIST", "raw")

    def __getitem__(self, index):
        img = self.data[index][:, :, None]
        target = self.targets[index]
        if self.compat:
            target = int(target[0])
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class LFWPairs(VisionDataset):
    """LFW verification pairs: ``root/lfw-py/lfw/<Name>/<Name>_NNNN.jpg`` +
    ``pairs.txt``/``pairsDevTrain.txt``/``pairsDevTest.txt`` fold lists
    (reference ``lfw.py:177-236``)."""

    _label_files = {"train": "pairsDevTrain.txt", "test": "pairsDevTest.txt",
                    "10fold": "pairs.txt"}

    def __init__(self, root, split="10fold", image_set="funneled",
                 transform=None, target_transform=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        base = os.path.join(self.root, "lfw-py")
        images_dir = {"original": "lfw", "funneled": "lfw_funneled",
                      "deepfunneled": "lfw-deepfunneled"}[image_set]
        images = os.path.join(base, images_dir)
        if not os.path.isdir(images):
            images = os.path.join(base, "lfw")  # single-tree checkouts
        labels = os.path.join(base, self._label_files[split])
        if not os.path.exists(labels):
            raise RuntimeError(f"LFW pairs file not found: {labels}")
        self.split = split
        self.loader = loader

        def path(name, no):
            return os.path.join(images, name, f"{name}_{int(no):04d}.jpg")

        self.pair_names, self.data, self.targets = [], [], []
        with open(labels) as f:
            lines = f.readlines()
        if split == "10fold":
            n_folds, n_pairs = (int(x) for x in lines[0].split("\t"))
        else:
            n_folds, n_pairs = 1, int(lines[0])
        s = 1
        for _ in range(n_folds):
            matched = [line.strip().split("\t") for line in lines[s : s + n_pairs]]
            unmatched = [line.strip().split("\t")
                         for line in lines[s + n_pairs : s + 2 * n_pairs]]
            s += 2 * n_pairs
            for p in matched:
                self.pair_names.append((p[0], p[0]))
                self.data.append((path(p[0], p[1]), path(p[0], p[2])))
                self.targets.append(1)
            for p in unmatched:
                self.pair_names.append((p[0], p[2]))
                self.data.append((path(p[0], p[1]), path(p[2], p[3])))
                self.targets.append(0)

    def __getitem__(self, index):
        p1, p2 = self.data[index]
        img1, img2 = self.loader(p1), self.loader(p2)
        target = self.targets[index]
        if self.transform is not None:
            img1, img2 = self.transform(img1), self.transform(img2)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img1, img2, target

    def __len__(self):
        return len(self.data)


class WIDERFace(VisionDataset):
    """Layout: ``root/widerface/WIDER_<split>/images/<event>/*.jpg`` +
    ``wider_face_split/wider_face_<split>_bbx_gt.txt`` state-machine format
    (reference ``widerface.py:113-160``). Targets are numpy arrays."""

    BASE_FOLDER = "widerface"

    def __init__(self, root, split="train", transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(os.path.join(root, self.BASE_FOLDER), transform=transform,
                         target_transform=target_transform)
        if split not in ("train", "val", "test"):
            raise ValueError(f"invalid split {split!r}")
        self.split = split
        self.loader = loader
        self.img_info: List[Dict[str, Any]] = []
        if split in ("train", "val"):
            self._parse_train_val()
        else:
            self._parse_test()

    def _parse_train_val(self):
        fname = f"wider_face_{self.split}_bbx_gt.txt"
        filepath = os.path.join(self.root, "wider_face_split", fname)
        with open(filepath) as f:
            lines = [line.rstrip() for line in f]
        i = 0
        while i < len(lines):
            img_path = os.path.join(self.root, f"WIDER_{self.split}", "images", lines[i])
            num_boxes = int(lines[i + 1])
            # the format emits one all-zero row when num_boxes == 0
            n_rows = max(num_boxes, 1)
            rows = [[int(x) for x in lines[i + 2 + j].split()] for j in range(n_rows)]
            i += 2 + n_rows
            labels = np.asarray(rows, dtype=np.int64).reshape(-1, 10)
            self.img_info.append({
                "img_path": img_path,
                "annotations": {
                    "bbox": labels[:num_boxes, 0:4].copy(),  # x, y, w, h
                    "blur": labels[:num_boxes, 4].copy(),
                    "expression": labels[:num_boxes, 5].copy(),
                    "illumination": labels[:num_boxes, 6].copy(),
                    "occlusion": labels[:num_boxes, 7].copy(),
                    "pose": labels[:num_boxes, 8].copy(),
                    "invalid": labels[:num_boxes, 9].copy(),
                },
            })

    def _parse_test(self):
        filepath = os.path.join(self.root, "wider_face_split",
                                "wider_face_test_filelist.txt")
        with open(filepath) as f:
            for line in f:
                line = line.rstrip()
                if line:
                    self.img_info.append({
                        "img_path": os.path.join(self.root, "WIDER_test", "images", line)
                    })

    def __getitem__(self, index):
        info = self.img_info[index]
        img = self.loader(info["img_path"])
        if self.transform is not None:
            img = self.transform(img)
        target = None if self.split == "test" else info["annotations"]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.img_info)


class SBDataset(VisionDataset):
    """Semantic Boundaries: ``root/{img/*.jpg, cls/*.mat, train.txt, val.txt}``
    (reference ``sbd.py:55-126``). ``mode='segmentation'`` yields the class
    mask; ``'boundaries'`` a (20, H, W) edge stack."""

    num_classes = 20

    def __init__(self, root, image_set="train", mode="boundaries", transforms=None,
                 loader=default_loader):
        super().__init__(root, transforms=transforms)
        from scipy.io import loadmat

        self._loadmat = loadmat
        if mode not in ("segmentation", "boundaries"):
            raise ValueError(f"invalid mode {mode!r}")
        self.mode = mode
        self.loader = loader
        split_f = os.path.join(self.root, image_set.rstrip("\n") + ".txt")
        with open(split_f) as f:
            names = [x.strip() for x in f.readlines()]
        self.images = [os.path.join(self.root, "img", n + ".jpg") for n in names]
        self.masks = [os.path.join(self.root, "cls", n + ".mat") for n in names]

    def _get_target(self, filepath):
        mat = self._loadmat(filepath)
        if self.mode == "segmentation":
            return np.asarray(mat["GTcls"][0]["Segmentation"][0])
        return np.concatenate(
            [mat["GTcls"][0]["Boundaries"][0][i][0].toarray()[None]
             for i in range(self.num_classes)], axis=0)

    def __getitem__(self, index):
        img = self.loader(self.images[index])
        target = self._get_target(self.masks[index])
        if self.transforms is not None:
            img, target = self.transforms(img, target)
        return img, target

    def __len__(self):
        return len(self.images)


CityscapesClass = namedtuple(
    "CityscapesClass",
    ["name", "id", "train_id", "category", "category_id", "has_instances",
     "ignore_in_eval", "color"],
)


class Cityscapes(VisionDataset):
    """Layout: ``root/leftImg8bit/<split>/<city>/*_leftImg8bit.png`` +
    ``root/gtFine|gtCoarse/<split>/<city>/*_<type>`` (reference
    ``cityscapes.py:105-222``)."""

    classes = [
        CityscapesClass("unlabeled", 0, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("ego vehicle", 1, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("rectification border", 2, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("out of roi", 3, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("static", 4, 255, "void", 0, False, True, (0, 0, 0)),
        CityscapesClass("dynamic", 5, 255, "void", 0, False, True, (111, 74, 0)),
        CityscapesClass("ground", 6, 255, "void", 0, False, True, (81, 0, 81)),
        CityscapesClass("road", 7, 0, "flat", 1, False, False, (128, 64, 128)),
        CityscapesClass("sidewalk", 8, 1, "flat", 1, False, False, (244, 35, 232)),
        CityscapesClass("parking", 9, 255, "flat", 1, False, True, (250, 170, 160)),
        CityscapesClass("rail track", 10, 255, "flat", 1, False, True, (230, 150, 140)),
        CityscapesClass("building", 11, 2, "construction", 2, False, False, (70, 70, 70)),
        CityscapesClass("wall", 12, 3, "construction", 2, False, False, (102, 102, 156)),
        CityscapesClass("fence", 13, 4, "construction", 2, False, False, (190, 153, 153)),
        CityscapesClass("guard rail", 14, 255, "construction", 2, False, True, (180, 165, 180)),
        CityscapesClass("bridge", 15, 255, "construction", 2, False, True, (150, 100, 100)),
        CityscapesClass("tunnel", 16, 255, "construction", 2, False, True, (150, 120, 90)),
        CityscapesClass("pole", 17, 5, "object", 3, False, False, (153, 153, 153)),
        CityscapesClass("polegroup", 18, 255, "object", 3, False, True, (153, 153, 153)),
        CityscapesClass("traffic light", 19, 6, "object", 3, False, False, (250, 170, 30)),
        CityscapesClass("traffic sign", 20, 7, "object", 3, False, False, (220, 220, 0)),
        CityscapesClass("vegetation", 21, 8, "nature", 4, False, False, (107, 142, 35)),
        CityscapesClass("terrain", 22, 9, "nature", 4, False, False, (152, 251, 152)),
        CityscapesClass("sky", 23, 10, "sky", 5, False, False, (70, 130, 180)),
        CityscapesClass("person", 24, 11, "human", 6, True, False, (220, 20, 60)),
        CityscapesClass("rider", 25, 12, "human", 6, True, False, (255, 0, 0)),
        CityscapesClass("car", 26, 13, "vehicle", 7, True, False, (0, 0, 142)),
        CityscapesClass("truck", 27, 14, "vehicle", 7, True, False, (0, 0, 70)),
        CityscapesClass("bus", 28, 15, "vehicle", 7, True, False, (0, 60, 100)),
        CityscapesClass("caravan", 29, 255, "vehicle", 7, True, True, (0, 0, 90)),
        CityscapesClass("trailer", 30, 255, "vehicle", 7, True, True, (0, 0, 110)),
        CityscapesClass("train", 31, 16, "vehicle", 7, True, False, (0, 80, 100)),
        CityscapesClass("motorcycle", 32, 17, "vehicle", 7, True, False, (0, 0, 230)),
        CityscapesClass("bicycle", 33, 18, "vehicle", 7, True, False, (119, 11, 32)),
        CityscapesClass("license plate", -1, -1, "vehicle", 7, False, True, (0, 0, 142)),
    ]

    def __init__(self, root, split="train", mode="fine", target_type="instance",
                 transform=None, target_transform=None, transforms=None,
                 loader=default_loader):
        super().__init__(root, transforms=transforms, transform=transform,
                         target_transform=target_transform)
        self.mode = "gtFine" if mode == "fine" else "gtCoarse"
        self.images_dir = os.path.join(self.root, "leftImg8bit", split)
        self.targets_dir = os.path.join(self.root, self.mode, split)
        self.target_type = target_type if isinstance(target_type, list) else [target_type]
        self.split = split
        self.loader = loader
        for t in self.target_type:
            if t not in ("instance", "semantic", "polygon", "color"):
                raise ValueError(f"invalid target_type {t!r}")
        if not (os.path.isdir(self.images_dir) and os.path.isdir(self.targets_dir)):
            raise RuntimeError(f"Cityscapes not found under {self.root}")
        self.images, self.targets = [], []
        for city in sorted(os.listdir(self.images_dir)):
            img_dir = os.path.join(self.images_dir, city)
            target_dir = os.path.join(self.targets_dir, city)
            for file_name in sorted(os.listdir(img_dir)):
                stem = file_name.split("_leftImg8bit")[0]
                self.images.append(os.path.join(img_dir, file_name))
                self.targets.append([
                    os.path.join(target_dir, f"{stem}_{self._suffix(t)}")
                    for t in self.target_type
                ])

    def _suffix(self, target_type):
        return {
            "instance": f"{self.mode}_instanceIds.png",
            "semantic": f"{self.mode}_labelIds.png",
            "color": f"{self.mode}_color.png",
            "polygon": f"{self.mode}_polygons.json",
        }[target_type]

    def __getitem__(self, index):
        image = self.loader(self.images[index])
        targets = []
        for i, t in enumerate(self.target_type):
            if t == "polygon":
                with open(self.targets[index][i]) as f:
                    targets.append(json.load(f))
            else:
                targets.append(self.loader(self.targets[index][i]))
        target = tuple(targets) if len(targets) > 1 else targets[0]
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        return image, target

    def __len__(self):
        return len(self.images)


class Kitti(VisionDataset):
    """Layout: ``root/Kitti/raw/{training,testing}/image_2/*.png`` +
    ``training/label_2/*.txt`` 15-column rows (reference ``kitti.py:73-130``)."""

    image_dir_name = "image_2"
    labels_dir_name = "label_2"

    def __init__(self, root, train=True, transform=None, target_transform=None,
                 transforms=None, loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform,
                         transforms=transforms)
        self.train = train
        self.loader = loader
        location = "training" if train else "testing"
        raw = os.path.join(self.root, "Kitti", "raw")
        image_dir = os.path.join(raw, location, self.image_dir_name)
        if not os.path.isdir(image_dir):
            raise RuntimeError(f"Kitti not found at {image_dir}")
        labels_dir = os.path.join(raw, location, self.labels_dir_name)
        self.images, self.targets = [], []
        for img_file in sorted(os.listdir(image_dir)):
            self.images.append(os.path.join(image_dir, img_file))
            if train:
                self.targets.append(
                    os.path.join(labels_dir, f"{img_file.split('.')[0]}.txt"))

    def _parse_target(self, index):
        target = []
        with open(self.targets[index]) as f:
            for line in csv.reader(f, delimiter=" "):
                target.append({
                    "type": line[0],
                    "truncated": float(line[1]),
                    "occluded": int(line[2]),
                    "alpha": float(line[3]),
                    "bbox": [float(x) for x in line[4:8]],
                    "dimensions": [float(x) for x in line[8:11]],
                    "location": [float(x) for x in line[11:14]],
                    "rotation_y": float(line[14]),
                })
        return target

    def __getitem__(self, index):
        image = self.loader(self.images[index])
        target = self._parse_target(index) if self.train else None
        if self.transforms is not None:
            image, target = self.transforms(image, target)
        return image, target

    def __len__(self):
        return len(self.images)


class PhotoTour(VisionDataset):
    """UBC patch sets: grids of 64x64 patches in bmp sheets under
    ``root/<name>/`` + ``info.txt`` 3D-point ids + ``m50_*.txt`` match lists
    (reference ``phototour.py:95-234``). Cached as ``<name>.npz``."""

    means = {"notredame": 0.4854, "yosemite": 0.4844, "liberty": 0.4437,
             "notredame_harris": 0.4854, "yosemite_harris": 0.4844,
             "liberty_harris": 0.4437}
    stds = {"notredame": 0.1864, "yosemite": 0.1818, "liberty": 0.2019,
            "notredame_harris": 0.1864, "yosemite_harris": 0.1818,
            "liberty_harris": 0.2019}
    lens = {"notredame": 468159, "yosemite": 633587, "liberty": 450092,
            "liberty_harris": 379587, "yosemite_harris": 450912,
            "notredame_harris": 325295}
    image_ext = "bmp"
    info_file = "info.txt"
    matches_files = "m50_100000_100000_0.txt"

    def __init__(self, root, name, train=True, transform=None, download=False):
        super().__init__(root, transform=transform)
        self.name = name
        self.train = train
        self.mean = self.means.get(name)
        self.std = self.stds.get(name)
        self.data_dir = os.path.join(self.root, name)
        self.data_file = os.path.join(self.root, f"{name}.npz")
        if not os.path.exists(self.data_file):
            self._cache()
        cached = np.load(self.data_file)
        self.data = cached["data"]
        self.labels = cached["labels"]
        self.matches = cached["matches"]

    def _cache(self):
        if not os.path.isdir(self.data_dir):
            raise RuntimeError(f"PhotoTour set not found at {self.data_dir}")
        patches = []
        for fname in sorted(os.listdir(self.data_dir)):
            if not fname.endswith(self.image_ext):
                continue
            sheet = default_loader(os.path.join(self.data_dir, fname))
            if sheet.ndim == 3:
                sheet = sheet[:, :, 0]
            h, w = sheet.shape
            for y in range(0, h, 64):
                for x in range(0, w, 64):
                    patches.append(sheet[y : y + 64, x : x + 64])
        n = self.lens.get(self.name, len(patches))
        data = np.stack(patches[:n]) if patches else np.zeros((0, 64, 64), np.uint8)
        with open(os.path.join(self.data_dir, self.info_file)) as f:
            labels = np.asarray([int(line.split()[0]) for line in f], np.int64)
        matches = []
        with open(os.path.join(self.data_dir, self.matches_files)) as f:
            for line in f:
                s = line.split()
                matches.append([int(s[0]), int(s[3]), int(s[1] == s[4])])
        np.savez(self.data_file, data=data, labels=labels[: len(data)],
                 matches=np.asarray(matches, np.int64))

    def __getitem__(self, index):
        if self.train:
            data = self.data[index]
            if self.transform is not None:
                data = self.transform(data)
            return data
        m = self.matches[index]
        d1, d2 = self.data[m[0]], self.data[m[1]]
        if self.transform is not None:
            d1, d2 = self.transform(d1), self.transform(d2)
        return d1, d2, int(m[2])

    def __len__(self):
        return len(self.data) if self.train else len(self.matches)


class SBU(VisionDataset):
    """SBU captioned photos: ``root/dataset/SBU_captioned_photo_dataset_
    {urls,captions}.txt`` + downloaded images (reference ``sbu.py:45-82``)."""

    def __init__(self, root, transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        self.loader = loader
        self.photos, self.captions = [], []
        base = os.path.join(self.root, "dataset")
        urls = os.path.join(base, "SBU_captioned_photo_dataset_urls.txt")
        caps = os.path.join(base, "SBU_captioned_photo_dataset_captions.txt")
        for line1, line2 in zip(open(urls), open(caps)):
            photo = os.path.basename(line1.rstrip())
            if os.path.exists(os.path.join(base, photo)):
                self.photos.append(photo)
                self.captions.append(line2.rstrip())

    def __getitem__(self, index):
        img = self.loader(os.path.join(self.root, "dataset", self.photos[index]))
        if self.transform is not None:
            img = self.transform(img)
        target = self.captions[index]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.photos)


class _Flickr8kParser(HTMLParser):
    """Caption extraction from the Flickr8k annotation web page
    (reference ``flickr.py:14-54``)."""

    def __init__(self, root):
        super().__init__()
        self.root = root
        self.annotations: Dict[str, List[str]] = {}
        self.in_table = False
        self.current_tag: Optional[str] = None
        self.current_img: Optional[str] = None

    def handle_starttag(self, tag, attrs):
        self.current_tag = tag
        if tag == "table":
            self.in_table = True

    def handle_endtag(self, tag):
        self.current_tag = None
        if tag == "table":
            self.in_table = False

    def handle_data(self, data):
        if not self.in_table:
            return
        if data == "Image Not Found":
            self.current_img = None
        elif self.current_tag == "a":
            img_id = data.split("/")[-2]
            matches = glob.glob(os.path.join(self.root, img_id + "_*.jpg"))
            self.current_img = matches[0]
            self.annotations[matches[0]] = []
        elif self.current_tag == "li" and self.current_img:
            self.annotations[self.current_img].append(data.strip())


class Flickr8k(VisionDataset):
    """Images under ``root`` + HTML annotation page (reference
    ``flickr.py:56-140``)."""

    def __init__(self, root, ann_file, transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        self.ann_file = os.path.expanduser(ann_file)
        self.loader = loader
        parser = _Flickr8kParser(self.root)
        with open(self.ann_file) as f:
            parser.feed(f.read())
        self.annotations = parser.annotations
        self.ids = sorted(self.annotations)

    def __getitem__(self, index):
        img_id = self.ids[index]
        img = self.loader(img_id)
        if self.transform is not None:
            img = self.transform(img)
        target = self.annotations[img_id]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.ids)


class Flickr30k(VisionDataset):
    """Images under ``root`` + tab-separated ``<img>#<n>\\t<caption>`` file
    (reference ``flickr.py:142-231``)."""

    def __init__(self, root, ann_file, transform=None, target_transform=None,
                 loader=default_loader):
        super().__init__(root, transform=transform, target_transform=target_transform)
        self.ann_file = os.path.expanduser(ann_file)
        self.loader = loader
        self.annotations = defaultdict(list)
        with open(self.ann_file) as f:
            for line in f:
                img_id, caption = line.strip().split("\t")
                self.annotations[img_id[:-2]].append(caption)
        self.ids = sorted(self.annotations)

    def __getitem__(self, index):
        img_id = self.ids[index]
        img = self.loader(os.path.join(self.root, img_id))
        if self.transform is not None:
            img = self.transform(img)
        target = self.annotations[img_id]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return len(self.ids)


class LSUNClass(VisionDataset):
    """One LSUN lmdb environment (reference ``lsun.py:19-58``); requires the
    optional ``lmdb`` package."""

    def __init__(self, root, transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        try:
            import lmdb
        except ImportError as e:
            raise RuntimeError(
                "LSUN requires the 'lmdb' package, which is not installed"
            ) from e
        self.env = lmdb.open(root, max_readers=1, readonly=True, lock=False,
                             readahead=False, meminit=False)
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = [key for key in txn.cursor().iternext(keys=True, values=False)]

    def __getitem__(self, index):
        from ..io import decode_image

        with self.env.begin(write=False) as txn:
            imgbuf = txn.get(self.keys[index])
        img = decode_image(bytes(imgbuf))
        target = None
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.length


class LSUN(VisionDataset):
    """Concatenation of per-category ``<category>_<split>_lmdb`` environments
    (reference ``lsun.py:61-168``)."""

    categories = ["bedroom", "bridge", "church_outdoor", "classroom",
                  "conference_room", "dining_room", "kitchen", "living_room",
                  "restaurant", "tower"]

    def __init__(self, root, classes="train", transform=None, target_transform=None):
        super().__init__(root, transform=transform, target_transform=target_transform)
        if isinstance(classes, str):
            if classes == "test":
                classes = ["test"]
            else:
                classes = [f"{c}_{classes}" for c in self.categories]
        self.classes = classes
        self.dbs = [
            LSUNClass(os.path.join(self.root, f"{c}_lmdb") if c != "test"
                      else os.path.join(self.root, "test_lmdb"),
                      transform=transform)
            for c in classes
        ]
        self.indices = []
        count = 0
        for db in self.dbs:
            count += len(db)
            self.indices.append(count)
        self.length = count

    def __getitem__(self, index):
        target = 0
        sub = 0
        for ind in self.indices:
            if index < ind:
                break
            target += 1
            sub = ind
        img, _ = self.dbs[target][index - sub]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.length
