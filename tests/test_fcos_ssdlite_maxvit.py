"""FCOS, SSDLite, MaxViT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.models import detection as det


class TestFCOS:
    @pytest.fixture(scope="class")
    def fcos(self):
        m = det.FCOS(num_classes=5, topk_candidates=200, max_detections=10)
        x = jnp.ones((1, 128, 128, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v

    def test_forward_locations(self, fcos):
        m, v = fcos
        x = jnp.ones((1, 128, 128, 3), jnp.float32)
        cls, reg, ctr, locs, strides = m.apply(v, x, train=False)
        # P3..P7 of 128: 16²+8²+4²+2²+1² = 341 locations
        assert locs.shape == (341, 2) and cls.shape == (1, 341, 5)
        assert float(reg.min()) >= 0  # ltrb distances are ReLU'd

    def test_loss_and_grad(self, fcos, rng):
        m, v = fcos
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        gt_boxes = jnp.asarray([[[20.0, 20, 70, 70]]])
        gt_labels = jnp.asarray([[3]])
        gt_valid = jnp.asarray([[True]])
        stats = v["batch_stats"]

        def loss_fn(params):
            vv = {"params": params, "batch_stats": stats}
            cls, reg, ctr, locs, strides = m.apply(vv, x, train=False)
            losses = m.apply(vv, cls, reg, ctr, locs, strides, gt_boxes, gt_labels, gt_valid,
                             method=m.compute_loss)
            return sum(losses.values())

        l0 = float(loss_fn(v["params"]))
        g = jax.grad(loss_fn)(v["params"])
        assert np.isfinite(l0)
        assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0

    def test_postprocess(self, fcos, rng):
        m, v = fcos
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        cls, reg, ctr, locs, strides = m.apply(v, x, train=False)
        out = m.postprocess(cls, reg, ctr, locs, strides, (128, 128))
        assert out["boxes"].shape == (1, 10, 4)


class TestSSDLite:
    def test_anchor_count(self, rng):
        m = det.SSDLite(num_classes=3, max_detections=5, topk_candidates=20)
        x = jnp.ones((1, 320, 320, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        cls, reg, anchors = jax.eval_shape(lambda v: m.apply(v, x, train=False), variables)
        assert anchors.shape == (3234, 4)  # the canonical SSDLite320 count
        assert cls.shape == (1, 3234, 3)

    def test_registered(self):
        assert "ssdlite320_mobilenet_v3_large" in models.list_models()
        assert "fcos_resnet50_fpn" in models.list_models()


class TestMaxViT:
    def test_shapes_and_params(self):
        m = models.get_model("maxvit_t", num_classes=7)
        x = jnp.ones((1, 224, 224, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        out = jax.eval_shape(lambda v: m.apply(v, x, train=False), variables)
        assert out.shape == (1, 7)

    def test_param_parity(self):
        m = models.get_model("maxvit_t")  # 1000 classes
        x = jnp.ones((1, 224, 224, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        n = int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))
        assert n == 30_919_624  # exact reference maxvit_t count

    def test_small_forward(self, rng):
        m = models.MaxVit if hasattr(models, "MaxVit") else None
        from cpu_vision_tpu.models.maxvit import MaxVit

        m = MaxVit(stem_channels=8, block_channels=(8, 16), block_layers=(1, 1),
                   partition=4, num_classes=3)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 3) and bool(jnp.all(jnp.isfinite(out)))
