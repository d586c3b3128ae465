"""SSD, Keypoint R-CNN, RAFT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu.models import detection as det
from cpu_vision_tpu.models.optical_flow import raft_small


class TestSSD:
    def test_anchor_count_matches_reference(self):
        gen = det.DefaultBoxGenerator()
        anchors = gen(300, [38, 19, 10, 5, 3, 1])
        assert anchors.shape == (8732, 4)  # the canonical SSD300 count

    def test_forward_and_postprocess(self, rng):
        m = det.SSD(num_classes=5, max_detections=10, topk_candidates=50)
        x = jnp.asarray(rng.random((1, 300, 300, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        cls, reg, anchors = m.apply(v, x, train=False)
        assert cls.shape == (1, 8732, 5) and reg.shape == (1, 8732, 4)
        out = m.postprocess(cls, reg, anchors, (300, 300))
        assert out["boxes"].shape == (1, 10, 4)

    def test_registered(self):
        from cpu_vision_tpu.models import list_models

        assert "ssd300_vgg16" in list_models()


class TestKeypointRCNN:
    def test_inference_keypoints(self, rng):
        m = det.KeypointRCNN(num_classes=2, rpn_pre_nms_top_n=100,
                             rpn_post_nms_top_n=32, max_detections=4)
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        dets = m.apply(v, x, train=False)
        assert dets["keypoints"].shape == (1, 4, 17, 2)
        assert dets["keypoints_scores"].shape == (1, 4, 17)
        # keypoints lie inside their boxes
        kx = np.asarray(dets["keypoints"][..., 0])
        x1 = np.asarray(dets["boxes"][..., 0])[..., None]
        x2 = np.asarray(dets["boxes"][..., 2])[..., None]
        assert ((kx >= x1 - 1e-3) & (kx <= x2 + 1e-3)).all()


class TestRAFT:
    def test_recovers_translation(self, rng):
        # RAFT with random weights won't recover flow, but the pipeline must
        # produce the right shapes and iterate stably
        m = raft_small(iters=2)
        x1 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        x2 = jnp.roll(x1, 3, axis=2)
        v = m.init(jax.random.PRNGKey(0), x1, x2, train=False)
        flows = m.apply(v, x1, x2, train=False)
        assert len(flows) == 2
        assert flows[-1].shape == (1, 64, 64, 2)
        assert bool(jnp.all(jnp.isfinite(flows[-1])))

    def test_grad_through_iterations(self, rng):
        m = raft_small(iters=2)
        x1 = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        x2 = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x1, x2, train=False)
        tgt = jnp.ones((1, 32, 32, 2))

        def loss(params):
            flows = m.apply({"params": params}, x1, x2, train=False)
            return sum(jnp.mean((f - tgt) ** 2) for f in flows)

        g = jax.grad(loss)(v["params"])
        total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0

    def test_registered(self):
        from cpu_vision_tpu.models import list_models

        names = list_models()
        assert "raft_large" in names and "raft_small" in names


class TestPasteMasks:
    def _torch_oracle(self, masks, boxes, im_h, im_w, padding=1):
        """Re-derivation of the reference algorithm (roi_heads.py:392-474):
        1-px zero pad, box expansion by (M+2p)/M, int truncation, bilinear
        align_corners=False resize to the box, clipped paste."""
        import torch
        import torch.nn.functional as TF

        m = masks.shape[-1]
        scale = float(m + 2 * padding) / m
        t = torch.from_numpy(masks)
        t = TF.pad(t, (padding,) * 4)
        b = torch.from_numpy(boxes)
        w_half = (b[:, 2] - b[:, 0]) * 0.5 * scale
        h_half = (b[:, 3] - b[:, 1]) * 0.5 * scale
        x_c = (b[:, 2] + b[:, 0]) * 0.5
        y_c = (b[:, 3] + b[:, 1]) * 0.5
        eb = torch.stack([x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half], 1)
        eb = eb.to(torch.int64)
        out = np.zeros((masks.shape[0], im_h, im_w), np.float32)
        for i in range(masks.shape[0]):
            x0, y0, x1, y1 = (int(v) for v in eb[i])
            w = max(x1 - x0 + 1, 1)
            h = max(y1 - y0 + 1, 1)
            r = TF.interpolate(t[i][None, None], size=(h, w), mode="bilinear",
                               align_corners=False)[0, 0]
            xs0, xs1 = max(x0, 0), min(x1 + 1, im_w)
            ys0, ys1 = max(y0, 0), min(y1 + 1, im_h)
            out[i, ys0:ys1, xs0:xs1] = r[(ys0 - y0):(ys1 - y0), (xs0 - x0):(xs1 - x0)].numpy()
        return out

    def test_matches_reference_algorithm(self, rng):
        torch = pytest.importorskip("torch")  # noqa: F841
        m = 14
        masks = rng.random((5, m, m), dtype=np.float32)
        boxes = np.stack([
            [4.3, 6.1, 30.7, 25.2],
            [0.0, 0.0, 10.0, 10.0],
            [40.0, 30.0, 63.9, 47.9],   # touches the image edge
            [-5.0, -3.0, 12.0, 9.0],    # partially outside
            [20.0, 20.0, 21.0, 21.0],   # tiny box
        ]).astype(np.float32)
        got = np.asarray(det.paste_masks_in_image(jnp.asarray(masks),
                                                  jnp.asarray(boxes), (48, 64)))
        want = self._torch_oracle(masks, boxes, 48, 64)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_jits_and_vmaps(self, rng):
        masks = jnp.asarray(rng.random((2, 3, 14, 14), dtype=np.float32))
        boxes = jnp.asarray(rng.random((2, 3, 4), dtype=np.float32) * 20)
        boxes = boxes.at[..., 2:].add(20)
        f = jax.jit(jax.vmap(lambda mk, bx: det.paste_masks_in_image(mk, bx, (32, 32))))
        out = f(masks, boxes)
        assert out.shape == (2, 3, 32, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_maskrcnn_paste_masks_full(self, rng):
        """paste_masks=True returns full-image masks zeroed on padded rows
        (the reference transform.postprocess contract, transform.py:263)."""
        m = det.MaskRCNN(num_classes=4, rpn_pre_nms_top_n=50,
                         rpn_post_nms_top_n=16, max_detections=4)
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        dets = m.apply(v, x, train=False, paste_masks=True)
        assert dets["masks"].shape == (1, 4, 28, 28)
        assert dets["masks_full"].shape == (1, 4, 128, 128)
        full = np.asarray(dets["masks_full"])
        assert np.isfinite(full).all() and full.min() >= 0 and full.max() <= 1
        invalid = ~np.asarray(dets["valid"])
        assert full[invalid].max(initial=0.0) == 0.0
