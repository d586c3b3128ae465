"""New model families: cheap shape checks via eval_shape (no compute), a few
real forwards, param parity where reference numbers are known."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models

REF_NUM_PARAMS = {
    "googlenet": 13_004_888,  # incl. the two aux heads (reference default)
    "mnasnet1_0": 4_383_312,
    "shufflenet_v2_x1_0": 2_278_604,
    "swin_t": 28_288_354,
    "swin_s": 49_606_258,
    "swin_b": 87_768_224,
    "swin_v2_t": 28_351_570,
    "swin_v2_s": 49_737_442,
    "swin_v2_b": 87_930_848,
    "vit_b_16": 86_567_656,
    "regnet_y_8gf": 39_381_472,
    "regnet_y_16gf": 83_590_140,
    "regnet_y_32gf": 145_046_770,
    "regnet_y_128gf": 644_812_894,
    "regnet_x_8gf": 39_572_648,
    "regnet_x_16gf": 54_278_536,
    "regnet_x_32gf": 107_811_560,
}

EVAL_SHAPE_ONLY = [
    "inception_v3",
    "mnasnet0_5",
    "shufflenet_v2_x0_5",
    "regnet_x_400mf",
    "regnet_y_400mf",
    "swin_t",
]

REAL_FORWARD = ["googlenet", "mnasnet1_0", "shufflenet_v2_x1_0"]


class TestShapes:
    @pytest.mark.parametrize("name", EVAL_SHAPE_ONLY)
    def test_eval_shape_forward(self, name):
        size = 299 if name == "inception_v3" else 64 if "swin" not in name else 224
        m = models.get_model(name, num_classes=11)
        x = jnp.ones((1, size, size, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        out = jax.eval_shape(lambda v: m.apply(v, x, train=False), variables)
        assert out.shape == (1, 11)

    @pytest.mark.parametrize("name", REAL_FORWARD)
    def test_real_forward(self, name):
        m = models.get_model(name, num_classes=7)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 7) and bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.parametrize("name,expected", sorted(REF_NUM_PARAMS.items()))
    def test_param_parity(self, name, expected):
        size = 224
        m = models.get_model(name)
        x = jnp.ones((1, size, size, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        n = int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))
        assert n == expected, f"{name}: {n} != {expected}"


class TestVideo:
    def test_video_resnet_shapes(self):
        for name in ("r3d_18", "mc3_18", "r2plus1d_18"):
            m = models.get_model(name, num_classes=13)
            x = jnp.ones((1, 8, 32, 32, 3), jnp.float32)
            variables = jax.eval_shape(lambda m=m: m.init(jax.random.PRNGKey(0), x, train=False))
            out = jax.eval_shape(lambda v, m=m: m.apply(v, x, train=False), variables)
            assert out.shape == (1, 13), name

    def test_r3d_runs(self):
        m = models.get_model("r3d_18", num_classes=5)
        x = jnp.ones((1, 4, 16, 16, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 5)

    def test_s3d_shape(self):
        m = models.get_model("s3d", num_classes=9)
        x = jnp.ones((1, 16, 64, 64, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        out = jax.eval_shape(lambda v: m.apply(v, x, train=False), variables)
        assert out.shape == (1, 9)


class TestSwinRuns:
    def test_swin_forward_small(self):
        # window 7 with 56x56 first stage (input 224) is the real config;
        # use it at eval_shape level and run a real forward at 112 (ws
        # shrinks to the feature size automatically)
        m = models.get_model("swin_t", num_classes=3)
        x = jnp.ones((1, 112, 112, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 3) and bool(jnp.all(jnp.isfinite(out)))


class TestRegistryCount:
    def test_zoo_size(self):
        assert len(models.list_models()) >= 75


class TestMViT:
    def test_shapes(self):
        m = models.get_model("mvit_v1_b", num_classes=11)
        x = jnp.ones((1, 16, 224, 224, 3), jnp.float32)
        variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        out = jax.eval_shape(lambda v: m.apply(v, x, train=False), variables)
        assert out.shape == (1, 11)

    def test_param_parity(self):
        # torchvision documented counts: 36.61M (v1_b), 34.54M (v2_s)
        expected = {"mvit_v1_b": 36_610_672, "mvit_v2_s": 34_537_744}
        x = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
        for name, want in expected.items():
            m = models.get_model(name)
            var = jax.eval_shape(lambda k, m=m: m.init(k, x), jax.random.PRNGKey(0))
            n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(var))
            assert n == want, f"{name}: {n} != {want}"

    def _tiny(self, **flags):
        from cpu_vision_tpu.models.mvit import MSBlockConfig, MViT

        blocks = (
            MSBlockConfig(1, 16, 16, (3, 3, 3), (3, 3, 3), (1, 1, 1), (1, 2, 2)),
            MSBlockConfig(2, 16, 32, (3, 3, 3), (3, 3, 3), (1, 2, 2), (1, 2, 2)),
        )
        return MViT(block_setting=blocks, num_classes=3,
                    spatial_size=(32, 32), temporal_size=4, **flags)

    def test_small_forward_v1_style(self, rng):
        m = self._tiny(residual_pool=False, residual_with_cls_embed=False,
                       rel_pos_embed=False, proj_after_attn=False)
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 3) and bool(jnp.all(jnp.isfinite(out)))

    def test_small_forward_v2_style(self, rng):
        m = self._tiny(residual_pool=True, residual_with_cls_embed=False,
                       rel_pos_embed=True, proj_after_attn=True)
        x = jnp.asarray(rng.random((1, 4, 32, 32, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 3) and bool(jnp.all(jnp.isfinite(out)))
