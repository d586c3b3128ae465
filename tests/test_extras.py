"""Mask R-CNN, RandomIoUCrop/JPEG aug, quantized ops, profiling, hubconf."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops, profiling
from cpu_vision_tpu import transforms as T
from cpu_vision_tpu.models import detection as det
from cpu_vision_tpu.tv_arrays import BoundingBoxes, Image


class TestMaskRCNN:
    def test_inference_with_masks(self, rng):
        model = det.MaskRCNN(num_classes=4, rpn_pre_nms_top_n=100, rpn_post_nms_top_n=32,
                             max_detections=5)
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        dets = model.apply(v, x, train=False)
        assert dets["masks"].shape == (1, 5, 28, 28)
        assert float(dets["masks"].min()) >= 0 and float(dets["masks"].max()) <= 1

    def test_mask_loss_finite(self, rng):
        model = det.MaskRCNN(num_classes=4, rpn_pre_nms_top_n=100, rpn_post_nms_top_n=32,
                             max_detections=5)
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        rois = jnp.asarray([[[10.0, 10, 50, 50], [20.0, 20, 80, 80]]])
        labels = jnp.asarray([[1, 2]])
        pos = jnp.asarray([[True, True]])
        gt_masks = jnp.zeros((1, 2, 128, 128), jnp.float32).at[:, :, 20:60, 20:60].set(1.0)
        matched = jnp.asarray([[0, 1]])
        feats = model.apply(v, x, train=False, method=lambda m, im, train: m.backbone(im, train=train))
        loss = model.apply(
            v, feats[:4], rois, labels, pos, gt_masks, matched, (128, 128),
            method=model.mask_loss,
        )
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_registered(self):
        from cpu_vision_tpu.models import list_models

        assert "maskrcnn_resnet50_fpn" in list_models()


class TestDetectionAug:
    def test_random_iou_crop(self, rng):
        img = Image(jnp.asarray(rng.integers(0, 256, (100, 100, 3)).astype(np.uint8)))
        boxes = BoundingBoxes(jnp.asarray([[20.0, 20, 60, 60], [70.0, 70, 95, 95]]), "xyxy", (100, 100))
        t = T.RandomIoUCrop()
        for seed in range(5):
            out = t({"image": img, "boxes": boxes}, key=jax.random.PRNGKey(seed))
            h, w = out["boxes"].canvas_size
            assert out["image"].shape[:2] == (h, w)

    def test_jpeg_aug(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
        out = T.JPEG((50, 70))(img, key=jax.random.PRNGKey(0))
        assert out.shape == img.shape and out.dtype == jnp.uint8
        assert not np.array_equal(np.asarray(out), np.asarray(img))  # lossy


class TestQuantized:
    def test_quantize_roundtrip(self, rng):
        x = jnp.asarray(rng.random((8, 8), dtype=np.float32))
        q = ops.quantize(x, 1 / 255.0, 0)
        back = ops.dequantize(q, 1 / 255.0, 0)
        assert np.abs(np.asarray(back) - np.asarray(x)).max() <= 1 / 255.0 + 1e-6

    def test_qnms_matches_float(self, rng):
        boxes = np.concatenate([rng.random((16, 2)) * 50, rng.random((16, 2)) * 50 + 60], 1).astype(np.float32)
        scores = rng.random(16, dtype=np.float32)
        scale = 0.5
        qboxes = ops.quantize(jnp.asarray(boxes), scale, 0, jnp.uint8)
        qscores = ops.quantize(jnp.asarray(scores), 1 / 255.0, 0, jnp.uint8)
        keep_q = np.asarray(ops.qnms(qboxes, qscores, 0.5, scale, 0))
        dq = np.asarray(ops.dequantize(qboxes, scale, 0))
        keep_f = np.asarray(ops.nms(jnp.asarray(dq), jnp.asarray(np.asarray(ops.dequantize(qscores, 1/255.0, 0))), 0.5))
        np.testing.assert_array_equal(keep_q, keep_f)

    def test_qroi_align(self, rng):
        feats = jnp.asarray(rng.random((1, 16, 16, 4), dtype=np.float32))
        scale = 1 / 127.0
        q = ops.quantize(feats, scale, 0, jnp.uint8)
        rois = jnp.asarray([[0, 2.0, 2, 12, 12]])
        out, s, zp = ops.qroi_align(q, rois, 4, scale, 0, 1.0, 2)
        ref = ops.roi_align(ops.dequantize(q, scale, 0), rois, 4, 1.0, 2)
        diff = np.abs(np.asarray(ops.dequantize(out, s, zp)) - np.asarray(ref)).max()
        assert diff <= scale  # requantisation error only


class TestProfiling:
    def test_benchmark(self):
        f = jax.jit(lambda x: x * 2.0)
        stats = profiling.benchmark(f, jnp.ones((64, 64)), iters=3, warmup=1)
        assert stats["mean_s"] > 0

    def test_api_usage(self):
        from cpu_vision_tpu import _log_api_usage_once

        _log_api_usage_once(TestProfiling)
        assert any("TestProfiling" in k for k in profiling.api_usage_counts())


class TestHubconf:
    def test_hubconf_exports(self):
        import hubconf

        assert callable(hubconf.resnet50)
        assert callable(hubconf.maskrcnn_resnet50_fpn)
