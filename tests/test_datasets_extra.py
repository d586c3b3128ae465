"""COCO/VOC/STL10 datasets with injected fake data (the reference's dataset
test strategy) + the detection/segmentation reference scripts."""

import json
import os
import sys

import numpy as np
import pytest

from cpu_vision_tpu import datasets
from cpu_vision_tpu.io import write_png, write_jpeg


class TestCoco:
    def _make(self, tmp_path, rng):
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(3):
            write_jpeg(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8), str(img_dir / f"{i}.jpg"))
            images.append({"id": i, "file_name": f"{i}.jpg", "height": 32, "width": 48})
            anns.append({
                "id": 10 + i, "image_id": i, "category_id": 1,
                "bbox": [2, 3, 10, 12], "area": 120, "iscrowd": 0,
            })
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps({
            "images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "thing"}],
        }))
        return str(img_dir), str(ann_file)

    def test_detection(self, tmp_path, rng):
        root, ann = self._make(tmp_path, rng)
        ds = datasets.CocoDetection(root, ann)
        assert len(ds) == 3
        img, target = ds[0]
        assert img.shape == (32, 48, 3)
        assert target[0]["bbox"] == [2, 3, 10, 12]

    def test_captions(self, tmp_path, rng):
        root, ann = self._make(tmp_path, rng)
        # rewrite annotations as captions
        data = json.loads(open(ann).read())
        for a in data["annotations"]:
            a["caption"] = "a thing"
        open(ann, "w").write(json.dumps(data))
        ds = datasets.CocoCaptions(root, ann)
        _, captions = ds[1]
        assert captions == ["a thing"]


class TestVOC:
    def test_detection(self, tmp_path, rng):
        base = tmp_path / "VOCdevkit" / "VOC2012"
        (base / "ImageSets" / "Main").mkdir(parents=True)
        (base / "JPEGImages").mkdir()
        (base / "Annotations").mkdir()
        (base / "ImageSets" / "Main" / "train.txt").write_text("img0\n")
        write_jpeg(rng.integers(0, 256, (20, 30, 3), dtype=np.uint8),
                   str(base / "JPEGImages" / "img0.jpg"))
        (base / "Annotations" / "img0.xml").write_text(
            "<annotation><filename>img0.jpg</filename>"
            "<object><name>cat</name><bndbox><xmin>1</xmin><ymin>2</ymin>"
            "<xmax>10</xmax><ymax>12</ymax></bndbox></object></annotation>"
        )
        ds = datasets.VOCDetection(str(tmp_path), "2012", "train")
        img, target = ds[0]
        assert img.shape == (20, 30, 3)
        obj = target["annotation"]["object"][0]
        assert obj["name"] == "cat" and obj["bndbox"]["xmin"] == "1"

    def test_segmentation(self, tmp_path, rng):
        base = tmp_path / "VOCdevkit" / "VOC2012"
        (base / "ImageSets" / "Segmentation").mkdir(parents=True)
        (base / "JPEGImages").mkdir()
        (base / "SegmentationClass").mkdir()
        (base / "ImageSets" / "Segmentation" / "val.txt").write_text("img0\n")
        write_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                   str(base / "JPEGImages" / "img0.jpg"))
        write_png(rng.integers(0, 21, (16, 16, 1)).astype(np.uint8),
                  str(base / "SegmentationClass" / "img0.png"))
        ds = datasets.VOCSegmentation(str(tmp_path), "2012", "val")
        img, mask = ds[0]
        assert img.shape == (16, 16, 3) and mask.shape == (16, 16, 1)


class TestSTL10:
    def test_binary_parsing(self, tmp_path, rng):
        folder = tmp_path / "stl10_binary"
        folder.mkdir()
        imgs = rng.integers(0, 256, (4, 3, 96, 96), dtype=np.uint8)
        (folder / "train_X.bin").write_bytes(imgs.tobytes())
        (folder / "train_y.bin").write_bytes(np.array([1, 2, 3, 4], np.uint8).tobytes())
        ds = datasets.STL10(str(tmp_path), "train")
        img, target = ds[0]
        assert img.shape == (96, 96, 3)
        assert target == 0  # labels are 1-based in the files
        np.testing.assert_array_equal(img, imgs[0].transpose(2, 1, 0))


class TestReferenceScripts:
    def test_detection_script(self, capsys):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from references.detection.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--image-size", "64", "--batch-size", "1"])
        out = capsys.readouterr().out
        assert "detections" in out

    def test_segmentation_script(self, capsys):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from references.segmentation.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--image-size", "32", "--batch-size", "2", "--model", "lraspp_mobilenet_v3_large",
              "--num-classes", "4"])
        out = capsys.readouterr().out
        assert "mIoU" in out
