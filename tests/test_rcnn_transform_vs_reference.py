"""GeneralizedRCNNTransform vs the LIVE reference: the min/max-size rule,
normalization, resized pixels, and box scaling must agree (the static padded
canvas is the one intentional departure — documented in transform.py)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rtr():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        from torchvision.models.detection.transform import (
            GeneralizedRCNNTransform as RefT,
        )
        from torchvision.models.detection.transform import resize_boxes

        yield RefT, resize_boxes
    finally:
        cleanup_reference_path(added)


class TestRCNNTransformVsReference:
    def test_target_size_rule(self, rtr):
        from cpu_vision_tpu.models.detection.transform import GeneralizedRCNNTransform

        ours = GeneralizedRCNNTransform(min_size=800, max_size=1333, size_bucket=None)
        for h, w in [(480, 640), (1024, 768), (333, 1999), (800, 800), (2000, 100)]:
            th, tw = ours._target_size(h, w)
            # the reference rule: scale = min(min_size/min, max_size/max)
            scale = min(800 / min(h, w), 1333 / max(h, w))
            assert (th, tw) == (int(round(h * scale)), int(round(w * scale)))

    def test_pixels_and_boxes_match(self, rtr, rng):
        import torch

        from cpu_vision_tpu.models.detection.transform import GeneralizedRCNNTransform

        RefT, _ = rtr
        img = rng.random((200, 300, 3)).astype(np.float32)
        boxes = np.array([[10.0, 20.0, 120.0, 150.0], [0.0, 0.0, 300.0, 200.0]],
                         np.float32)
        theirs = RefT(min_size=100, max_size=200,
                      image_mean=[0.485, 0.456, 0.406], image_std=[0.229, 0.224, 0.225])
        tlist, ttargets = theirs([torch.from_numpy(img.transpose(2, 0, 1))],
                                 [{"boxes": torch.from_numpy(boxes),
                                   "labels": torch.zeros(2, dtype=torch.int64)}])
        want_img = tlist.tensors[0].numpy().transpose(1, 2, 0)
        want_boxes = ttargets[0]["boxes"].numpy()

        ours = GeneralizedRCNNTransform(min_size=100, max_size=200, size_bucket=None)
        batch, out_boxes, scales = ours([jnp.asarray(img)], [jnp.asarray(boxes)])
        got_img = np.asarray(batch[0])
        got_boxes = np.asarray(out_boxes[0])
        # compare on the reference's (smaller, /32-padded) canvas region
        hh, ww = want_img.shape[:2]
        np.testing.assert_allclose(got_img[:hh, :ww], want_img, atol=2e-5)
        # our padding beyond the reference canvas must be zeros
        assert np.abs(got_img[hh:]).max(initial=0.0) == 0.0
        np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-3)

    def test_postprocess_round_trip(self, rtr, rng):
        import torch

        from cpu_vision_tpu.models.detection.transform import GeneralizedRCNNTransform

        _, resize_boxes = rtr
        boxes = np.array([[12.0, 8.0, 50.0, 42.0]], np.float32)
        ours = GeneralizedRCNNTransform(min_size=100, max_size=200, size_bucket=None)
        _, out_boxes, scales = ours([jnp.zeros((200, 300, 3))], [jnp.asarray(boxes)])
        back = np.asarray(ours.postprocess_boxes(out_boxes[0], scales, 0))
        want = resize_boxes(torch.from_numpy(np.asarray(out_boxes[0])),
                            (100, 150), (200, 300)).numpy()
        np.testing.assert_allclose(back, want, atol=1e-4)
        np.testing.assert_allclose(back, boxes, atol=1e-3)
