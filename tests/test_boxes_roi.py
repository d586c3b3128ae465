"""Box ops, NMS, RoI ops, losses, regularizers, deform conv."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops
import np_roi_oracle as oracle


def _rand_boxes(rng, n, size=100.0):
    xy = rng.random((n, 2), dtype=np.float32) * size
    wh = rng.random((n, 2), dtype=np.float32) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxMath:
    def test_iou_known_values(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[5.0, 5, 15, 15], [0.0, 0, 10, 10], [20.0, 20, 30, 30]])
        iou = np.asarray(ops.box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [25 / 175, 1.0, 0.0], atol=1e-6)

    def test_giou_disjoint_negative(self):
        a = jnp.asarray([[0.0, 0, 1, 1]])
        b = jnp.asarray([[3.0, 3, 4, 4]])
        assert float(ops.generalized_box_iou(a, b)[0, 0]) < 0

    def test_diou_ciou_self_is_one(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 5))
        d = np.asarray(ops.distance_box_iou(boxes, boxes))
        c = np.asarray(ops.complete_box_iou(boxes, boxes))
        np.testing.assert_allclose(np.diag(d), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.diag(c), 1.0, atol=1e-5)

    def test_box_convert_roundtrip(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 10))
        for fmt in ("xywh", "cxcywh"):
            conv = ops.box_convert(boxes, "xyxy", fmt)
            back = ops.box_convert(conv, fmt, "xyxy")
            np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-4)

    def test_clip_and_small(self, rng):
        boxes = jnp.asarray([[-5.0, -5, 50, 200], [1, 1, 2, 2]])
        clipped = np.asarray(ops.clip_boxes_to_image(boxes, (100, 60)))
        np.testing.assert_allclose(clipped[0], [0, 0, 50, 100])
        mask = np.asarray(ops.remove_small_boxes(boxes, min_size=5.0))
        assert mask.tolist() == [True, False]

    def test_masks_to_boxes(self):
        m = np.zeros((2, 10, 10), bool)
        m[0, 2:5, 3:7] = True
        boxes = np.asarray(ops.masks_to_boxes(jnp.asarray(m)))
        np.testing.assert_allclose(boxes[0], [3, 2, 6, 4])
        np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])


class TestNMS:
    @pytest.mark.parametrize("n,thr", [(20, 0.5), (64, 0.3), (7, 0.7)])
    def test_matches_reference_loop(self, rng, n, thr):
        boxes = _rand_boxes(rng, n, 30.0)
        scores = rng.random(n, dtype=np.float32)
        ref = oracle.nms(boxes, scores, thr)
        ours = np.asarray(ops.nms(jnp.asarray(boxes), jnp.asarray(scores), thr))
        np.testing.assert_array_equal(ours, ref)

    def test_padded_indices(self, rng):
        boxes = _rand_boxes(rng, 16, 30.0)
        scores = rng.random(16, dtype=np.float32)
        idx, count = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_output_size=8)
        ref = oracle.nms(boxes, scores, 0.5)
        kept = np.asarray(idx)[: int(count)]
        assert len(kept) == min(ref.sum(), 8)
        assert all(ref[i] for i in kept)
        # ordered by descending score
        s = scores[kept]
        assert (np.diff(s) <= 1e-6).all()

    def test_batched_nms_classes_dont_suppress(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
        scores = jnp.asarray([0.9, 0.8])
        same = np.asarray(ops.batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5))
        diff = np.asarray(ops.batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5))
        assert same.tolist() == [True, False]
        assert diff.tolist() == [True, True]

    def test_nms_jits(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 32, 30.0))
        scores = jnp.asarray(rng.random(32, dtype=np.float32))
        keep = jax.jit(lambda b, s: ops.nms(b, s, 0.5))(boxes, scores)
        assert keep.shape == (32,)


def _nchw(x_nhwc):
    return x_nhwc.transpose(0, 3, 1, 2)


class TestRoiAlign:
    @pytest.mark.parametrize("aligned", [False, True])
    @pytest.mark.parametrize("ratio", [2, -1])
    def test_matches_cpp_loop(self, rng, aligned, ratio):
        x = rng.random((2, 16, 20, 3), dtype=np.float32)
        rois = np.array(
            [[0, 2.0, 3.0, 15.0, 12.0], [1, 0.0, 0.0, 19.5, 15.5], [0, 5.2, 4.1, 8.8, 9.9]],
            np.float32,
        )
        ref = oracle.roi_align(_nchw(x), rois, (5, 4), 0.5, ratio, aligned)
        ours = np.asarray(
            ops.roi_align(jnp.asarray(x), jnp.asarray(rois), (5, 4), 0.5, ratio, aligned, adaptive_max_grid=32)
        )
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)

    def test_differentiable(self, rng):
        x = jnp.asarray(rng.random((1, 8, 8, 2), dtype=np.float32))
        rois = jnp.asarray([[0, 1.0, 1.0, 6.0, 6.0]], jnp.float32)
        g = jax.grad(lambda f: ops.roi_align(f, rois, 3, 1.0, 2).sum())(x)
        assert g.shape == x.shape and float(jnp.abs(g).sum()) > 0


class TestRoiPool:
    def test_matches_cpp_loop(self, rng):
        x = rng.random((2, 12, 14, 2), dtype=np.float32)
        rois = np.array([[0, 1.0, 2.0, 10.0, 9.0], [1, 0.0, 0.0, 13.0, 11.0]], np.float32)
        ref = oracle.roi_pool(_nchw(x), rois, (4, 3), 1.0)
        ours = np.asarray(ops.roi_pool(jnp.asarray(x), jnp.asarray(rois), (4, 3), 1.0))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)

    def test_exact_for_huge_bins(self, rng):
        """One output bin spanning the whole map — exact max with the
        auto-sized cell grid (reference roi_pool_kernel.cpp:20-80 computes
        exact max over arbitrary bins)."""
        x = rng.random((1, 60, 60, 1), dtype=np.float32)
        rois = np.array([[0, 0.0, 0.0, 59.0, 59.0]], np.float32)
        ref = oracle.roi_pool(_nchw(x), rois, (1, 1), 1.0)
        ours = np.asarray(ops.roi_pool(jnp.asarray(x), jnp.asarray(rois), (1, 1), 1.0))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=0)

    def test_insufficient_max_cells_is_loud(self, rng):
        x = jnp.asarray(rng.random((1, 60, 60, 1), dtype=np.float32))
        rois = jnp.asarray([[0, 0.0, 0.0, 59.0, 59.0]], jnp.float32)
        with pytest.raises(ValueError, match="max_cells"):
            ops.roi_pool(x, rois, (1, 1), 1.0, max_cells=16)


class TestPsRoiAlign:
    def test_matches_cpp_loop(self, rng):
        ph = pw = 3
        c_out = 2
        x = rng.random((1, 14, 14, c_out * ph * pw), dtype=np.float32)
        rois = np.array([[0, 1.0, 1.0, 12.0, 12.0]], np.float32)
        ref = oracle.ps_roi_align(_nchw(x), rois, (ph, pw), 1.0, 2)
        ours = np.asarray(ops.ps_roi_align(jnp.asarray(x), jnp.asarray(rois), (ph, pw), 1.0, 2))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


class TestLosses:
    def test_focal_matches_manual(self, rng):
        logits = rng.normal(0, 2, (10, 4)).astype(np.float32)
        targets = (rng.random((10, 4)) > 0.5).astype(np.float32)
        p = 1 / (1 + np.exp(-logits))
        ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        p_t = p * targets + (1 - p) * (1 - targets)
        ref = ce * (1 - p_t) ** 2.0
        ref = (0.25 * targets + 0.75 * (1 - targets)) * ref
        ours = np.asarray(ops.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_giou_loss_zero_for_identical(self, rng):
        b = jnp.asarray(_rand_boxes(rng, 6))
        loss = np.asarray(ops.generalized_box_iou_loss(b, b))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)

    def test_diou_ciou_loss_reductions(self, rng):
        a = jnp.asarray(_rand_boxes(rng, 6))
        b = jnp.asarray(_rand_boxes(rng, 6))
        for fn in (ops.distance_box_iou_loss, ops.complete_box_iou_loss):
            none = np.asarray(fn(a, b))
            mean = float(fn(a, b, reduction="mean"))
            np.testing.assert_allclose(mean, none.mean(), atol=1e-5)
            assert (none >= -1e-5).all()


class TestRegularizers:
    def test_stochastic_depth_eval_identity(self, rng):
        x = jnp.asarray(rng.random((4, 3, 3, 2), dtype=np.float32))
        out = ops.stochastic_depth(x, 0.5, "row", training=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_stochastic_depth_row_zeroes_rows(self, rng):
        x = jnp.ones((64, 2, 2, 2), jnp.float32)
        out = np.asarray(ops.stochastic_depth(x, 0.5, "row", True, jax.random.PRNGKey(0)))
        per_row = out.reshape(64, -1)
        zeroed = (per_row == 0).all(axis=1)
        mixed = ~zeroed & (per_row != 0).all(axis=1)
        assert (zeroed | mixed).all()
        assert 10 < zeroed.sum() < 54  # ~50%

    def test_drop_block_shape_and_rate(self, rng):
        x = jnp.ones((2, 32, 32, 4), jnp.float32)
        out = np.asarray(ops.drop_block2d(x, 0.2, 5, training=True, key=jax.random.PRNGKey(1)))
        assert out.shape == x.shape
        assert (out == 0).mean() > 0.02


class TestDeformConv:
    def test_zero_offset_equals_conv(self, rng):
        x = rng.random((2, 10, 10, 4), dtype=np.float32)
        w = rng.normal(0, 0.5, (3, 3, 4, 6)).astype(np.float32)
        offset = np.zeros((2, 8, 8, 2 * 9), np.float32)
        ours = np.asarray(ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w)))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-4)

    def test_half_pixel_offset_interpolates(self, rng):
        x = np.zeros((1, 4, 4, 1), np.float32)
        x[0, :, :, 0] = np.arange(16).reshape(4, 4)
        w = np.zeros((1, 1, 1, 1), np.float32)
        w[0, 0, 0, 0] = 1.0
        offset = np.zeros((1, 4, 4, 2), np.float32)
        offset[..., 1] = 0.5  # dx = 0.5
        out = np.asarray(ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w)))
        # interior: average of neighbours
        np.testing.assert_allclose(out[0, 0, 0, 0], 0.5, atol=1e-5)
        np.testing.assert_allclose(out[0, 1, 1, 0], 5.5, atol=1e-5)

    def test_mask_modulation(self, rng):
        x = rng.random((1, 6, 6, 2), dtype=np.float32)
        w = rng.normal(0, 0.5, (3, 3, 2, 2)).astype(np.float32)
        offset = np.zeros((1, 4, 4, 18), np.float32)
        mask = np.full((1, 4, 4, 9), 0.5, np.float32)
        full = np.asarray(ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w)))
        half = np.asarray(
            ops.deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w), mask=jnp.asarray(mask))
        )
        np.testing.assert_allclose(half, full * 0.5, atol=1e-5)
