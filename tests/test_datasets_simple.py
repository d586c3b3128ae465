"""Named datasets with injected fake on-disk layouts + quantization module."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import datasets
from cpu_vision_tpu.io import write_jpeg, write_png


def _img(rng):
    return rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)


class TestSimpleDatasets:
    def test_caltech101(self, tmp_path, rng):
        base = tmp_path / "caltech101" / "101_ObjectCategories"
        for cls in ("ant", "bee", "BACKGROUND_Google"):
            (base / cls).mkdir(parents=True)
            write_jpeg(_img(rng), str(base / cls / "image_0001.jpg"))
        ds = datasets.Caltech101(str(tmp_path))
        assert len(ds) == 2  # background removed
        img, t = ds[0]
        assert img.shape == (8, 8, 3) and t == 0

    def test_oxford_pet(self, tmp_path, rng):
        base = tmp_path / "oxford-iiit-pet"
        (base / "images").mkdir(parents=True)
        (base / "annotations").mkdir()
        write_jpeg(_img(rng), str(base / "images" / "Abyssinian_1.jpg"))
        (base / "annotations" / "trainval.txt").write_text("Abyssinian_1 1 1 1\n")
        ds = datasets.OxfordIIITPet(str(tmp_path))
        img, t = ds[0]
        assert t == 0 and img.shape == (8, 8, 3)

    def test_dtd(self, tmp_path, rng):
        base = tmp_path / "dtd"
        (base / "images" / "dotted").mkdir(parents=True)
        (base / "labels").mkdir()
        write_jpeg(_img(rng), str(base / "images" / "dotted" / "d1.jpg"))
        (base / "labels" / "train1.txt").write_text("dotted/d1.jpg\n")
        ds = datasets.DTD(str(tmp_path))
        img, t = ds[0]
        assert t == 0 and len(ds) == 1

    def test_eurosat(self, tmp_path, rng):
        base = tmp_path / "eurosat" / "2750" / "Forest"
        base.mkdir(parents=True)
        write_jpeg(_img(rng), str(base / "f1.jpg"))
        ds = datasets.EuroSAT(str(tmp_path))
        assert len(ds) == 1 and ds.classes == ["Forest"]

    def test_gtsrb_train(self, tmp_path, rng):
        d = tmp_path / "gtsrb" / "GTSRB" / "Training" / "00003"
        d.mkdir(parents=True)
        write_png(_img(rng), str(d / "s1.png"))
        ds = datasets.GTSRB(str(tmp_path), "train")
        img, t = ds[0]
        assert t == 3

    def test_food101(self, tmp_path, rng):
        base = tmp_path / "food-101"
        (base / "images" / "pizza").mkdir(parents=True)
        (base / "meta").mkdir()
        write_jpeg(_img(rng), str(base / "images" / "pizza" / "p1.jpg"))
        (base / "meta" / "train.json").write_text(json.dumps({"pizza": ["pizza/p1"]}))
        ds = datasets.Food101(str(tmp_path))
        img, t = ds[0]
        assert t == 0

    def test_flowers102_json_fallback(self, tmp_path, rng):
        base = tmp_path / "flowers-102"
        (base / "jpg").mkdir(parents=True)
        write_jpeg(_img(rng), str(base / "jpg" / "image_00001.jpg"))
        (base / "splits.json").write_text(json.dumps({"train": [["image_00001.jpg", 5]]}))
        ds = datasets.Flowers102(str(tmp_path))
        img, t = ds[0]
        assert t == 5

    def test_country211(self, tmp_path, rng):
        base = tmp_path / "country211" / "train" / "US"
        base.mkdir(parents=True)
        write_jpeg(_img(rng), str(base / "a.jpg"))
        ds = datasets.Country211(str(tmp_path), "train")
        assert len(ds) == 1


class TestQuantization:
    def test_int8_dense_close(self, rng):
        from cpu_vision_tpu.models import quantization as Q

        x = jnp.asarray(rng.random((4, 128), dtype=np.float32))
        w = jnp.asarray(rng.normal(0, 0.1, (128, 64)).astype(np.float32))
        q, s = Q.quantize_weight(w)
        out = Q.int8_dense(x, q, s)
        ref = x @ w
        assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 0.03

    def test_quantize_restore_roundtrip(self, rng):
        from cpu_vision_tpu.models import quantization as Q

        params = {"big": jnp.asarray(rng.normal(0, 1, (128, 64)).astype(np.float32)),
                  "small": jnp.asarray(rng.normal(0, 1, (4,)).astype(np.float32))}
        qp, meta = Q.quantize_params(params, min_size=1024)
        assert meta == [True, False]
        rp = Q.restore_params(qp)
        rel = float(jnp.abs(rp["big"] - params["big"]).max() / jnp.abs(params["big"]).max())
        assert rel < 0.02
        np.testing.assert_array_equal(np.asarray(rp["small"]), np.asarray(params["small"]))
        assert Q.param_bytes(qp) < Q.param_bytes(params) / 2

    def test_quantized_resnet_top1_stable(self, rng):
        from cpu_vision_tpu import models
        from cpu_vision_tpu.models import quantization as Q

        m = models.get_model("resnet18", num_classes=10)
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        qp, _ = Q.quantize_params(v["params"])
        out = m.apply({"params": Q.restore_params(qp), "batch_stats": v["batch_stats"]}, x, train=False)
        ref = m.apply(v, x, train=False)
        assert int(jnp.argmax(out)) == int(jnp.argmax(ref))


class TestExtra2Datasets:
    def test_celeba(self, tmp_path, rng):
        base = tmp_path / "celeba"
        (base / "img_align_celeba").mkdir(parents=True)
        write_jpeg(_img(rng), str(base / "img_align_celeba" / "000001.jpg"))
        write_jpeg(_img(rng), str(base / "img_align_celeba" / "000002.jpg"))
        (base / "list_eval_partition.txt").write_text("000001.jpg 0\n000002.jpg 2\n")
        (base / "list_attr_celeba.txt").write_text(
            "2\nSmiling Young\n000001.jpg 1 -1\n000002.jpg -1 1\n"
        )
        ds = datasets.CelebA(str(tmp_path), "train")
        assert len(ds) == 1
        img, attr = ds[0]
        assert list(attr) == [1, 0]

    def test_lfw_people(self, tmp_path, rng):
        base = tmp_path / "lfw-py"
        (base / "lfw" / "Ada_Lovelace").mkdir(parents=True)
        write_jpeg(_img(rng), str(base / "lfw" / "Ada_Lovelace" / "Ada_Lovelace_0001.jpg"))
        (base / "peopleDevTrain.txt").write_text("1\nAda_Lovelace\t1\n")
        ds = datasets.LFWPeople(str(tmp_path), "train")
        img, t = ds[0]
        assert t == 0 and len(ds) == 1

    def test_fer2013(self, tmp_path, rng):
        d = tmp_path / "fer2013"
        d.mkdir()
        pixels = " ".join(str(int(v)) for v in rng.integers(0, 256, 48 * 48))
        (d / "train.csv").write_text(f"emotion,pixels\n3,{pixels}\n")
        ds = datasets.FER2013(str(tmp_path), "train")
        img, t = ds[0]
        assert img.shape == (48, 48, 1) and t == 3

    def test_omniglot(self, tmp_path, rng):
        d = tmp_path / "omniglot-py" / "images_background" / "Latin" / "character01"
        d.mkdir(parents=True)
        write_png(_img(rng), str(d / "0001_01.png"))
        ds = datasets.Omniglot(str(tmp_path))
        img, t = ds[0]
        assert t == 0 and len(ds) == 1

    def test_presets_new(self, rng):
        import jax.numpy as jnp

        from cpu_vision_tpu.train import (
            ObjectDetectionEval,
            SemanticSegmentationEval,
            VideoClassificationEval,
        )
        from cpu_vision_tpu.tv_arrays import Video

        img = jnp.asarray(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
        out = ObjectDetectionEval()(img)
        assert out.dtype == jnp.float32 and float(out.max()) <= 1.0
        out = SemanticSegmentationEval(32)(img)
        assert out.shape[-1] == 3 and out.dtype == jnp.float32
        vid = Video(jnp.asarray(rng.integers(0, 256, (2, 4, 64, 64, 3)).astype(np.uint8)))
        out = VideoClassificationEval(32, 40)(vid)
        assert out.shape == (2, 4, 32, 32, 3)

    def test_weights_enum(self):
        from cpu_vision_tpu import models

        w = models.get_weight("ResNet18_Weights.IMAGENET1K_V1")
        assert w.meta["num_params"] == 11_689_512
        assert models.get_model_weights("resnet50").DEFAULT.meta["_metrics"]["ImageNet-1K"]["acc@1"] == 80.858


class TestCalibratedInt8:
    def test_calibrated_act_scales_match_dynamic(self, rng):
        """calibrate_activations (observer-style static activation scales,
        reference models/quantization/utils.py:quantize_model MinMaxObserver)
        produces per-layer scales that keep apply_int8 as close to f32 as
        the dynamic abs-max path."""
        from cpu_vision_tpu import models

        q = models.get_model("quantized_resnet18", num_classes=16)
        x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
        v = q.init(jax.random.PRNGKey(0), x, train=False)

        cal_batches = [jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
                       for _ in range(2)]
        scales = q.calibrate(v, cal_batches, train=False)
        assert len(scales) >= 10  # every large conv/dense observed
        assert all(float(s) > 0 for s in scales.values())

        f32 = np.asarray(q.apply(v, x, train=False))
        stat = np.asarray(q.apply_int8(v, x, act_scales=scales, train=False))
        cos = float((f32 * stat).sum()
                    / (np.linalg.norm(f32) * np.linalg.norm(stat) + 1e-12))
        assert cos > 0.995
        assert (f32.argmax(-1) == stat.argmax(-1)).mean() >= 0.5

    def test_uncalibrated_layer_stays_float(self, rng):
        """A module path missing from act_scales falls back to the float
        kernel instead of guessing a scale."""
        from cpu_vision_tpu import models

        q = models.get_model("quantized_resnet18", num_classes=8)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        v = q.init(jax.random.PRNGKey(0), x, train=False)
        f32 = np.asarray(q.apply(v, x, train=False))
        # empty calibration dict -> every layer uncalibrated -> pure float
        out = np.asarray(q.apply_int8(v, x, act_scales={}, train=False))
        np.testing.assert_allclose(out, f32, rtol=1e-5, atol=1e-5)


class TestSyntheticTaskVariants:
    def test_segmentation_variant(self):
        from cpu_vision_tpu.datasets import SyntheticShapesSegmentation

        ds = SyntheticShapesSegmentation(16, (48, 48, 3), 5)
        img, tgt = ds[2]
        img2, tgt2 = ds[2]
        assert (img == img2).all() and (tgt == tgt2).all()
        assert img.shape == (48, 48, 3) and tgt.shape == (48, 48)
        assert tgt.min() == 0 and 1 <= tgt.max() <= 5
        # the glyph occupies a nontrivial but minority share of pixels
        frac = (tgt > 0).mean()
        assert 0.01 < frac < 0.9

    def test_video_variant(self):
        from cpu_vision_tpu.datasets import SyntheticShapesVideo

        ds = SyntheticShapesVideo(16, frames=6, image_size=48)
        vid, cls = ds[3]
        vid2, cls2 = ds[3]
        assert (vid == vid2).all() and cls == cls2
        assert vid.shape == (6, 48, 48, 3) and vid.dtype == np.uint8
        assert 0 <= cls < 4
        # the label is temporal: frame t+1 is frame t rolled by the class
        # direction, and no single frame differs across classes in kind
        dy, dx = SyntheticShapesVideo._DIRS[cls]
        assert (np.roll(vid[0], (2 * dy, 2 * dx), axis=(0, 1)) == vid[1]).all()

    def test_detection_variant(self):
        from cpu_vision_tpu.datasets import SyntheticShapesDetection

        ds = SyntheticShapesDetection(16, (64, 64, 3), 6)
        img, tgt = ds[5]
        box = tgt["boxes"]
        assert box.shape == (1, 4) and tgt["labels"].shape == (1,)
        x1, y1, x2, y2 = box[0]
        assert 0 <= x1 < x2 <= 64 and 0 <= y1 < y2 <= 64
        assert 0 <= int(tgt["labels"][0]) < 6
        # box really bounds the glyph: it must be tight against the mask
        assert (x2 - x1) * (y2 - y1) >= 16


class TestQuantizedWeightEnums:
    def test_all_12_builders_have_enums(self):
        """Reference models/quantization/*.py ship *_QuantizedWeights for all
        12 quantized builders; get_model_weights must resolve each."""
        from cpu_vision_tpu import models

        expected = {
            "quantized_googlenet": ("GoogLeNet_QuantizedWeights", 69.826),
            "quantized_inception_v3": ("Inception_V3_QuantizedWeights", 77.176),
            "quantized_mobilenet_v2": ("MobileNet_V2_QuantizedWeights", 71.658),
            "quantized_mobilenet_v3_large": ("MobileNet_V3_Large_QuantizedWeights", 73.004),
            "quantized_resnet18": ("ResNet18_QuantizedWeights", 69.494),
            "quantized_resnet50": ("ResNet50_QuantizedWeights", 75.920),
            "quantized_resnext101_32x8d": ("ResNeXt101_32X8D_QuantizedWeights", 78.986),
            "quantized_resnext101_64x4d": ("ResNeXt101_64X4D_QuantizedWeights", 82.898),
            "quantized_shufflenet_v2_x0_5": ("ShuffleNet_V2_X0_5_QuantizedWeights", 57.972),
            "quantized_shufflenet_v2_x1_0": ("ShuffleNet_V2_X1_0_QuantizedWeights", 68.360),
            "quantized_shufflenet_v2_x1_5": ("ShuffleNet_V2_X1_5_QuantizedWeights", 72.052),
            "quantized_shufflenet_v2_x2_0": ("ShuffleNet_V2_X2_0_QuantizedWeights", 75.354),
        }
        for name, (enum_name, acc1) in expected.items():
            enum = models.get_model_weights(name)
            assert enum is not None and enum.__name__ == enum_name
            assert enum.DEFAULT.meta["_metrics"]["ImageNet-1K"]["acc@1"] == acc1
        # get_weight resolves the dotted string form
        w = models.get_weight("ResNet50_QuantizedWeights.IMAGENET1K_FBGEMM_V2")
        assert w.meta["_metrics"]["ImageNet-1K"]["acc@1"] == 80.282
