"""Model zoo: every registered builder runs on tiny inputs (the reference's
test strategy, ``test/test_models.py:133-155``), parameter-count parity for
key models, registry machinery, feature extraction, cnn_forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.ops.cnn import cnn_forward, cnn_init

# reference parameter counts from the weight metadata (models/*.py _metrics)
REF_NUM_PARAMS = {
    "resnet18": 11_689_512,
    "resnet50": 25_557_032,
    "resnext50_32x4d": 25_028_904,
    "wide_resnet50_2": 68_883_240,
    "alexnet": 61_100_840,
    "vgg16": 138_357_544,
    "squeezenet1_0": 1_248_424,
    "squeezenet1_1": 1_235_496,
    "densenet121": 7_978_856,
    "mobilenet_v2": 3_504_872,
    "mobilenet_v3_large": 5_483_032,
    "mobilenet_v3_small": 2_542_856,
    "efficientnet_b0": 5_288_548,
    "convnext_tiny": 28_589_128,
    "vit_b_16": 86_567_656,
}

# builders cheap enough for the per-model smoke test on 1 CPU core
SMOKE = [
    "resnet18",
    "resnet50",
    "resnext50_32x4d",
    "alexnet",
    "vgg11",
    "squeezenet1_1",
    "densenet121",
    "mobilenet_v2",
    "mobilenet_v3_small",
    "efficientnet_b0",
    "efficientnet_v2_s",
    "convnext_tiny",
    "vit_b_32",
]

_INPUT = {
    "alexnet": (1, 72, 72, 3),
    "vgg11": (1, 64, 64, 3),
    "vit_b_32": (1, 64, 64, 3),
}


def _count(variables):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))


class TestRegistry:
    def test_list_models(self):
        names = models.list_models()
        assert len(names) >= 40
        assert "resnet50" in names and "vit_b_16" in names

    def test_list_models_filters(self):
        assert all(n.startswith("resnet") for n in models.list_models(include="resnet*"))
        assert "resnet50" not in models.list_models(exclude="resnet*")

    def test_get_model(self):
        m = models.get_model("resnet18", num_classes=10)
        assert m.num_classes == 10

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown model"):
            models.get_model("resnet9000")


class TestModelsRun:
    @pytest.mark.parametrize("name", SMOKE)
    def test_forward_shape(self, name):
        shape = _INPUT.get(name, (1, 32, 32, 3))
        m = models.get_model(name, num_classes=7)
        variables = m.init(jax.random.PRNGKey(0), jnp.ones(shape, jnp.float32), train=False)
        out = m.apply(variables, jnp.ones(shape, jnp.float32), train=False)
        assert out.shape == (shape[0], 7)
        assert bool(jnp.all(jnp.isfinite(out)))

    @pytest.mark.parametrize("name,expected", sorted(REF_NUM_PARAMS.items()))
    def test_param_count_matches_reference(self, name, expected):
        shape = {
            "alexnet": (1, 224, 224, 3),
            "vgg16": (1, 224, 224, 3),
            "vit_b_16": (1, 224, 224, 3),
        }.get(name, (1, 32, 32, 3))
        m = models.get_model(name)
        variables = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.ones(shape, jnp.float32), train=False)
        )
        n = _count(variables)
        assert n == expected, f"{name}: {n} != reference {expected}"

    def test_train_mode_updates_batch_stats(self):
        m = models.get_model("resnet18", num_classes=4)
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        out, updates = m.apply(variables, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in updates

    def test_grads_flow(self):
        m = models.get_model("resnet18", num_classes=4)
        x = jnp.ones((2, 32, 32, 3), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            out = m.apply({"params": params, "batch_stats": variables["batch_stats"]}, x, train=False)
            return jnp.sum(out**2)

        g = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
        assert total > 0


class TestSegmentation:
    def test_fcn_output_dict(self):
        m = models.get_model("fcn_resnet50", num_classes=5)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["out"].shape == (1, 64, 64, 5)

    def test_lraspp(self):
        m = models.get_model("lraspp_mobilenet_v3_large", num_classes=3)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["out"].shape == (1, 64, 64, 3)


class TestFeatureExtraction:
    def test_resnet_intermediate_layers(self):
        m = models.get_model("resnet18")
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        feats = models.extract_features(m, v, x, ["layer2_1"], train=False)
        assert "layer2_1" in feats
        # dict form renames outputs (reference return_nodes dict)
        feats = models.extract_features(m, v, x, {"layer2_1": "c3"}, train=False)
        assert set(feats) == {"c3"}

    def test_features_only_mode(self):
        m = models.get_model("resnet18")
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        feats = m.apply(v, x, train=False, features_only=True)
        assert set(feats) == {"layer1", "layer2", "layer3", "layer4"}
        assert feats["layer4"].shape == (1, 2, 2, 512)


class TestCnnForward:
    def test_lenet_shapes(self):
        params = cnn_init(jax.random.PRNGKey(0))
        x = jnp.ones((4, 28, 28, 1), jnp.float32)
        out = jax.jit(cnn_forward)(params, x)
        assert out.shape == (4, 10)

    def test_224(self):
        params = cnn_init(jax.random.PRNGKey(0), (224, 224), 3, (16, 32), 64, 100)
        out = cnn_forward(params, jnp.ones((2, 224, 224, 3)))
        assert out.shape == (2, 100)

    def test_grad(self):
        params = cnn_init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 28, 28, 1))
        g = jax.grad(lambda p: cnn_forward(p, x).sum())(params)
        assert float(jnp.abs(g["conv0"]["w"]).sum()) > 0
