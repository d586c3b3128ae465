"""MultiScaleRoIAlign / LevelMapper and Faster R-CNN end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu.models import detection as det
from cpu_vision_tpu.ops import roi_align
from cpu_vision_tpu.ops.poolers import LevelMapper, multiscale_roi_align


class TestLevelMapper:
    def test_canonical_assignment(self):
        m = LevelMapper(2, 5)
        boxes = jnp.asarray([
            [0, 0, 224, 224],   # canonical scale -> level 4 -> idx 2
            [0, 0, 56, 56],     # -> level 2 -> idx 0
            [0, 0, 448, 448],   # -> level 5 -> idx 3
            [0, 0, 10, 10],     # clamps to k_min
        ], jnp.float32)
        np.testing.assert_array_equal(np.asarray(m(boxes)), [2, 0, 3, 0])


class TestMultiscaleRoiAlign:
    def test_selects_right_level(self, rng):
        # two levels; a small roi must pool from level 0, a big one from level 1
        image_size = 224
        f0 = jnp.asarray(rng.random((1, 56, 56, 8), dtype=np.float32))   # stride 4
        f1 = jnp.asarray(rng.random((1, 7, 7, 8), dtype=np.float32))     # stride 32
        rois = jnp.asarray([
            [0, 10.0, 10, 60, 60],      # sqrt(2500)=50 -> level 2 (f0)
            [0, 0.0, 0, 220, 220],      # level 5 -> clamped to f1
        ])
        out = multiscale_roi_align([f0, f1], rois, (7, 7), scales=[1 / 4, 1 / 32])
        ref_small = roi_align(f0, rois[:1], (7, 7), 1 / 4, 2)
        ref_big = roi_align(f1, rois[1:], (7, 7), 1 / 32, 2)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref_small[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref_big[0]), atol=1e-5)

    def test_pyramid_matches_pool_everywhere(self, rng, monkeypatch):
        """roi_align_pyramid (one gather at the roi's own level) must equal
        the pool-at-every-level-and-select formulation bit-for-bit in f32,
        including edge rois that exercise the per-level clamping."""
        import os

        f = [jnp.asarray(rng.random((2, 80, 80, 16), dtype=np.float32)),
             jnp.asarray(rng.random((2, 40, 40, 16), dtype=np.float32)),
             jnp.asarray(rng.random((2, 20, 20, 16), dtype=np.float32)),
             jnp.asarray(rng.random((2, 10, 10, 16), dtype=np.float32))]
        scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32]
        # mixed sizes incl. map-edge and out-of-bounds rois
        rois = jnp.asarray([
            [0, 5.0, 5, 60, 60],
            [1, 0.0, 0, 319, 319],
            [0, 100.0, 100, 319, 300],
            [1, 310.0, 310, 320, 320],   # clamps at the bottom-right edge
            [0, -4.0, -4, 30, 30],       # negative start
            [1, 40.0, 8, 296, 160],
        ])
        out_pyr = multiscale_roi_align(f, rois, (7, 7), scales=scales)
        monkeypatch.setenv("CVT_ROI_ALLLEVEL", "1")
        out_all = multiscale_roi_align(f, rois, (7, 7), scales=scales)
        np.testing.assert_allclose(np.asarray(out_pyr), np.asarray(out_all),
                                   atol=1e-6)


@pytest.fixture(scope="module")
def frcnn():
    model = det.FasterRCNN(num_classes=5, rpn_pre_nms_top_n=200, rpn_post_nms_top_n=64,
                           max_detections=10)
    x = jnp.ones((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


class TestFasterRCNN:
    def test_inference_fixed_shapes(self, frcnn, rng):
        model, v = frcnn
        x = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
        dets = model.apply(v, x, train=False)
        assert dets["boxes"].shape == (2, 10, 4)
        assert dets["scores"].shape == (2, 10)
        assert dets["labels"].shape == (2, 10)
        assert bool(jnp.all(dets["labels"][dets["valid"]] >= 1))  # background excluded

    def test_training_losses(self, frcnn, rng):
        model, v = frcnn
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        gt_boxes = jnp.asarray([[[20.0, 20, 60, 60], [0, 0, 0, 0]]])
        gt_labels = jnp.asarray([[2, 0]])
        gt_valid = jnp.asarray([[True, False]])
        losses = model.apply(
            v, x, gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(1),
            method=model.forward_train, mutable=["batch_stats"],
        )[0]
        assert set(losses) == {"loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"}
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_grads_flow_through_all_losses(self, frcnn, rng):
        model, v = frcnn
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        gt_boxes = jnp.asarray([[[30.0, 30, 90, 90]]])
        gt_labels = jnp.asarray([[1]])
        gt_valid = jnp.asarray([[True]])

        def total_loss(params):
            losses = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2),
                method=model.forward_train, mutable=["batch_stats"],
            )[0]
            return sum(losses.values())

        g = jax.grad(total_loss)(v["params"])
        total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_registered(self):
        from cpu_vision_tpu.models import list_models

        assert "fasterrcnn_resnet50_fpn" in list_models()
