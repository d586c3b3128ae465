"""Datasets (fake-data injection like the reference), viz utils, metrics,
checkpointing, presets, and the training reference script."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import datasets, utils
from cpu_vision_tpu.io import encode_png, write_png
from cpu_vision_tpu.train import (
    MetricLogger,
    SmoothedValue,
    accuracy,
    load_checkpoint,
    save_checkpoint,
)
from cpu_vision_tpu.train.presets import ImageClassificationEval, ImageClassificationTrain


class TestFolder:
    def _make_tree(self, tmp_path, rng):
        for cls in ("cat", "dog"):
            d = tmp_path / "train" / cls
            d.mkdir(parents=True)
            for i in range(3):
                img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                write_png(img, str(d / f"{i}.png"))
        return str(tmp_path / "train")

    def test_image_folder(self, tmp_path, rng):
        root = self._make_tree(tmp_path, rng)
        ds = datasets.ImageFolder(root)
        assert len(ds) == 6
        assert ds.classes == ["cat", "dog"]
        img, target = ds[0]
        assert img.shape == (8, 8, 3) and target == 0

    def test_transform_applied(self, tmp_path, rng):
        root = self._make_tree(tmp_path, rng)
        ds = datasets.ImageFolder(root, transform=lambda x: x.astype(np.float32) / 255.0)
        img, _ = ds[0]
        assert img.dtype == np.float32

    def test_empty_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            datasets.ImageFolder(str(tmp_path))


class TestFakeAndLoader:
    def test_fake_data_deterministic(self):
        ds = datasets.FakeData(10, (16, 16, 3), 4)
        img1, t1 = ds[3]
        img2, t2 = ds[3]
        np.testing.assert_array_equal(img1, img2)
        assert t1 == t2

    def test_loader_batches(self):
        ds = datasets.FakeData(10, (8, 8, 3), 2)
        loader = datasets.DataLoader(ds, batch_size=4, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        x, y = batches[0]
        assert x.shape == (4, 8, 8, 3) and y.shape == (4,)

    def test_loader_shuffle_by_epoch(self):
        ds = datasets.FakeData(16, (4, 4, 3), 2)
        loader = datasets.DataLoader(ds, batch_size=16, shuffle=True)
        loader.set_epoch(0)
        (x0, y0), = list(loader)
        loader.set_epoch(1)
        (x1, y1), = list(loader)
        assert not np.array_equal(y0, y1) or not np.array_equal(x0, x1)

    def test_mnist_idx_parsing(self, tmp_path, rng):
        # forge an IDX pair and read it through MNIST
        import struct

        raw = tmp_path / "MNIST" / "raw"
        raw.mkdir(parents=True)
        imgs = rng.integers(0, 256, (5, 28, 28), dtype=np.uint8)
        labels = rng.integers(0, 10, (5,), dtype=np.uint8)
        with open(raw / "train-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">i", 2051) + struct.pack(">3i", 5, 28, 28) + imgs.tobytes())
        with open(raw / "train-labels-idx1-ubyte", "wb") as f:
            f.write(struct.pack(">i", 2049) + struct.pack(">i", 5) + labels.tobytes())
        ds = datasets.MNIST(str(tmp_path), train=True)
        img, t = ds[2]
        assert img.shape == (28, 28, 1)
        np.testing.assert_array_equal(img[:, :, 0], imgs[2])
        assert t == int(labels[2])

    def test_extract_archive_zip(self, tmp_path):
        import zipfile

        z = tmp_path / "a.zip"
        with zipfile.ZipFile(z, "w") as f:
            f.writestr("inner.txt", "hello")
        datasets.extract_archive(str(z), str(tmp_path))
        assert (tmp_path / "inner.txt").read_text() == "hello"


class TestVizUtils:
    def test_make_grid(self, rng):
        imgs = jnp.asarray(rng.random((4, 8, 8, 3), dtype=np.float32))
        grid = utils.make_grid(imgs, nrow=2, padding=1)
        assert grid.shape == (2 * 9 + 1, 2 * 9 + 1, 3)

    def test_draw_bounding_boxes(self, rng):
        img = jnp.zeros((20, 20, 3), jnp.uint8)
        out = np.asarray(utils.draw_bounding_boxes(img, jnp.asarray([[2.0, 2, 10, 10]])))
        assert out[2, 5].sum() > 0  # top edge drawn
        assert out[5, 5].sum() == 0  # interior untouched

    def test_draw_segmentation_masks(self, rng):
        img = jnp.zeros((10, 10, 3), jnp.uint8)
        mask = np.zeros((10, 10), bool)
        mask[2:5, 2:5] = True
        out = np.asarray(utils.draw_segmentation_masks(img, jnp.asarray(mask), alpha=1.0))
        assert out[3, 3].sum() > 0 and out[8, 8].sum() == 0

    def test_draw_keypoints(self):
        img = jnp.zeros((20, 20, 3), jnp.uint8)
        kps = jnp.asarray([[[5.0, 5.0], [15.0, 15.0]]])
        out = np.asarray(utils.draw_keypoints(img, kps, connectivity=[(0, 1)]))
        assert out[5, 5].sum() > 0 and out[10, 10].sum() > 0

    def test_flow_to_image(self, rng):
        flow = jnp.asarray(rng.normal(0, 2, (8, 8, 2)).astype(np.float32))
        out = utils.flow_to_image(flow)
        assert out.shape == (8, 8, 3) and out.dtype == jnp.uint8

    def test_save_image(self, tmp_path, rng):
        imgs = jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32))
        path = str(tmp_path / "grid.png")
        utils.save_image(imgs, path)
        from cpu_vision_tpu.io import read_image

        assert read_image(path).shape[2] == 3


class TestTrainUtils:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=3)
        for x in (1, 2, 3, 4):
            v.update(x)
        assert v.median == 3 and v.global_avg == 2.5 and v.max == 4

    def test_metric_logger(self, capsys):
        logger = MetricLogger()
        for _ in logger.log_every(range(5), 2, "test"):
            logger.update(loss=1.0)
        out = capsys.readouterr().out
        assert "test" in out and "loss" in out

    def test_accuracy(self):
        logits = jnp.asarray([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0], [10.0, 9.0, 0]])
        targets = jnp.asarray([0, 1, 2, 1])
        top1, top2 = accuracy(logits, targets, topk=(1, 2))
        assert top1 == 75.0 and top2 == 100.0

    def test_checkpoint_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "epoch": jnp.asarray(3)}
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)
        restored = load_checkpoint(path)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
        assert int(restored["epoch"]) == 3

    def test_presets_compose(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
        ev = ImageClassificationEval(32, 36)
        out = ev(img)
        assert out.shape == (32, 32, 3) and out.dtype == jnp.float32
        tr = ImageClassificationTrain(32)
        out = tr(img, key=jax.random.PRNGKey(0))
        assert out.shape == (32, 32, 3)


class TestTrainScript:
    def test_smoke_run_improves_loss(self, tmp_path, capsys):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from references.classification.train import main

        main([
            "--fake-data", "--model", "resnet18", "--num-classes", "4",
            "--image-size", "32", "--batch-size", "16", "--epochs", "1",
            "--steps-per-epoch", "3", "--print-freq", "1",
            "--output-dir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "val acc@1" in out
        assert os.path.exists(str(tmp_path / "ckpt_latest"))
