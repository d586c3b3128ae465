"""Module-form ops wrappers (reference ``torchvision/ops/__init__.py``
class exports) + full ops-namespace parity with the reference export list."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops

REFERENCE_OPS_ALL = [
    # torchvision/ops/__init__.py:__all__ (39 names)
    "masks_to_boxes", "deform_conv2d", "DeformConv2d", "nms", "batched_nms",
    "remove_small_boxes", "clip_boxes_to_image", "box_convert", "box_area",
    "box_iou", "generalized_box_iou", "distance_box_iou", "complete_box_iou",
    "roi_align", "RoIAlign", "roi_pool", "RoIPool", "ps_roi_align",
    "PSRoIAlign", "ps_roi_pool", "PSRoIPool", "sigmoid_focal_loss",
    "stochastic_depth", "StochasticDepth", "FrozenBatchNorm2d",
    "ConvNormActivation", "Conv2dNormActivation", "Conv3dNormActivation",
    "SqueezeExcitation", "FeaturePyramidNetwork", "MLP", "Permute",
    "generalized_box_iou_loss", "distance_box_iou_loss",
    "complete_box_iou_loss", "drop_block2d", "DropBlock2d", "drop_block3d",
    "DropBlock3d",
]


class TestNamespaceParity:
    def test_all_reference_ops_exports_present(self):
        missing = [n for n in REFERENCE_OPS_ALL if not hasattr(ops, n)]
        assert missing == []


class TestRoIWrappers:
    def test_roi_align_wrapper_matches_functional(self, rng):
        feats = jnp.asarray(rng.random((2, 16, 16, 8), dtype=np.float32))
        rois = jnp.asarray([[0, 1.0, 1.0, 9.0, 9.0], [1, 2.0, 3.0, 12.0, 11.0]],
                           dtype=jnp.float32)
        mod = ops.RoIAlign(output_size=5, spatial_scale=1.0, sampling_ratio=2,
                           aligned=True)
        np.testing.assert_array_equal(
            np.asarray(mod(feats, rois)),
            np.asarray(ops.roi_align(feats, rois, 5, 1.0, 2, True)))

    def test_roi_pool_wrapper(self, rng):
        feats = jnp.asarray(rng.random((1, 12, 12, 4), dtype=np.float32))
        rois = jnp.asarray([[0, 0.0, 0.0, 8.0, 8.0]], dtype=jnp.float32)
        out = ops.RoIPool(output_size=3, spatial_scale=1.0)(feats, rois)
        assert out.shape == (1, 3, 3, 4)

    def test_ps_wrappers(self, rng):
        feats = jnp.asarray(rng.random((1, 12, 12, 9 * 2), dtype=np.float32))
        rois = jnp.asarray([[0, 0.0, 0.0, 9.0, 9.0]], dtype=jnp.float32)
        a = ops.PSRoIAlign(output_size=3, spatial_scale=1.0, sampling_ratio=2)(feats, rois)
        p = ops.PSRoIPool(output_size=3, spatial_scale=1.0)(feats, rois)
        assert a.shape == (1, 3, 3, 2) and p.shape == (1, 3, 3, 2)


class TestDeformConv2dModule:
    def test_forward_and_grad(self, rng):
        x = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
        offset = jnp.zeros((1, 8, 8, 2 * 3 * 3))
        m = ops.DeformConv2d(features=6, kernel_size=3, padding=1)
        v = m.init(jax.random.PRNGKey(0), x, offset)
        out = m.apply(v, x, offset)
        assert out.shape == (1, 8, 8, 6)
        # zero offsets == plain conv with the same kernel
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + v["params"]["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestDropBlockModules:
    def test_dropblock2d_eval_identity(self, rng):
        x = jnp.asarray(rng.random((2, 8, 8, 4), dtype=np.float32))
        m = ops.DropBlock2d(p=0.5, block_size=3)
        np.testing.assert_array_equal(np.asarray(m(x, training=False)), np.asarray(x))

    def test_dropblock2d_drops(self, rng):
        x = jnp.ones((2, 16, 16, 4))
        m = ops.DropBlock2d(p=0.5, block_size=3)
        out = m(x, training=True, key=jax.random.PRNGKey(0))
        assert float(jnp.sum(out == 0)) > 0

    def test_dropblock3d_shape(self, rng):
        x = jnp.ones((1, 4, 8, 8, 2))
        out = ops.DropBlock3d(p=0.3, block_size=3)(x, training=True,
                                                   key=jax.random.PRNGKey(1))
        assert out.shape == x.shape


class TestConv3dNormActivation:
    def test_forward(self, rng):
        x = jnp.asarray(rng.random((1, 4, 8, 8, 3), dtype=np.float32))
        m = ops.Conv3dNormActivation(features=16, kernel_size=3)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 4, 8, 8, 16)
        assert float(jnp.min(out)) >= 0.0  # relu applied
