"""torchvision.ops vs our ops on random inputs, calling the LIVE reference
source (box ops and loss functions are pure torch — no C ops needed)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rops():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import torchvision.ops as _rops

        yield _rops
    finally:
        cleanup_reference_path(added)


def _boxes(rng, n=9, hw=50.0):
    x1 = rng.uniform(0, hw - 2, n)
    y1 = rng.uniform(0, hw - 2, n)
    x2 = x1 + rng.uniform(0.5, hw - x1)
    y2 = y1 + rng.uniform(0.5, hw - y1)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)


class TestBoxOpsVsReference:
    @pytest.mark.parametrize("name", ["box_iou", "generalized_box_iou",
                                      "distance_box_iou", "complete_box_iou"])
    def test_iou_family(self, rops, rng, name):
        import torch

        from cpu_vision_tpu import ops

        a, b = _boxes(rng), _boxes(rng, 7)
        got = np.asarray(getattr(ops, name)(jnp.asarray(a), jnp.asarray(b)))
        want = getattr(rops, name)(torch.from_numpy(a), torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.parametrize("fmt", ["xywh", "cxcywh"])
    def test_box_convert_roundtrip(self, rops, rng, fmt):
        import torch

        from cpu_vision_tpu import ops

        a = _boxes(rng)
        got = np.asarray(ops.box_convert(jnp.asarray(a), "xyxy", fmt))
        want = rops.box_convert(torch.from_numpy(a), "xyxy", fmt).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_box_area(self, rops, rng):
        import torch

        from cpu_vision_tpu import ops

        a = _boxes(rng)
        np.testing.assert_allclose(np.asarray(ops.box_area(jnp.asarray(a))),
                                   rops.box_area(torch.from_numpy(a)).numpy(),
                                   atol=1e-4)

    def test_masks_to_boxes(self, rops, rng):
        import torch

        from cpu_vision_tpu import ops

        masks = np.zeros((3, 20, 30), np.uint8)
        masks[0, 4:9, 7:15] = 1
        masks[1, 0:3, 0:2] = 1
        masks[2, 10:11, 22:23] = 1
        got = np.asarray(ops.masks_to_boxes(jnp.asarray(masks)))
        want = rops.masks_to_boxes(torch.from_numpy(masks)).numpy()
        np.testing.assert_allclose(got, want)

    def test_clip_and_remove_small(self, rops, rng):
        import torch

        from cpu_vision_tpu import ops

        a = _boxes(rng) * 1.4 - 5.0  # push some outside
        got = np.asarray(ops.clip_boxes_to_image(jnp.asarray(a), (50, 50)))
        want = rops.clip_boxes_to_image(torch.from_numpy(a), (50, 50)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)
        keep_w = rops.remove_small_boxes(torch.from_numpy(a), 6.0).numpy()
        mask = np.asarray(ops.remove_small_boxes(jnp.asarray(a), 6.0))
        np.testing.assert_array_equal(np.nonzero(mask)[0], keep_w)


class TestLossesVsReference:
    def test_sigmoid_focal_loss(self, rops, rng):
        import torch

        from cpu_vision_tpu import ops

        logits = rng.normal(0, 2, (12, 5)).astype(np.float32)
        targets = (rng.random((12, 5)) < 0.3).astype(np.float32)
        for reduction in ("none", "mean", "sum"):
            got = np.asarray(ops.sigmoid_focal_loss(
                jnp.asarray(logits), jnp.asarray(targets), reduction=reduction))
            want = rops.sigmoid_focal_loss(
                torch.from_numpy(logits), torch.from_numpy(targets),
                reduction=reduction).numpy()
            np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("name", ["generalized_box_iou_loss",
                                      "distance_box_iou_loss",
                                      "complete_box_iou_loss"])
    def test_iou_losses(self, rops, rng, name):
        import torch

        from cpu_vision_tpu import ops

        a, b = _boxes(rng, 8), _boxes(rng, 8)
        got = np.asarray(getattr(ops, name)(jnp.asarray(a), jnp.asarray(b),
                                            reduction="mean"))
        want = getattr(rops, name)(torch.from_numpy(a), torch.from_numpy(b),
                                   reduction="mean").numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nms_matches_reference_python_semantics(self, rops, rng):
        """Our vectorized fixpoint == the reference's greedy algorithm
        (re-derived in python; the C++ kernel implements the same order)."""
        import torch

        from cpu_vision_tpu import ops

        boxes = _boxes(rng, 40)
        scores = rng.random(40).astype(np.float32)
        keep_mask = np.asarray(ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = np.nonzero(keep_mask)[0]
        # greedy reference semantics
        order = np.argsort(-scores)
        alive = np.ones(40, bool)
        ref_keep = []
        tb = torch.from_numpy(boxes)
        iou = rops.box_iou(tb, tb).numpy()
        for i in order:
            if alive[i]:
                ref_keep.append(i)
                alive[iou[i] > 0.5] = False
                alive[i] = True  # only later boxes suppressed; keep i itself
        np.testing.assert_array_equal(np.sort(got), np.sort(ref_keep))
