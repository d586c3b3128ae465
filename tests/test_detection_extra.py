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
