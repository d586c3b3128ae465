"""Conv->BatchNorm folding (``models/quantization.py:fold_batchnorm``):
the traced-call-graph counterpart of the reference's hand-written
``fuse_modules`` lists (``models/quantization/resnet.py:fuse_model``).
Folded inference must match unfolded to float tolerance, and the int8 path
must keep its accuracy on folded variables."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.models import quantization as q


@pytest.fixture(scope="module")
def r18():
    model = models.resnet18(num_classes=10)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    # randomise BN stats so folding is non-trivial
    variables = jax.device_get(variables)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    variables = jax.tree_util.tree_unflatten(treedef, leaves)

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        r = np.random.default_rng(abs(hash(name)) % 2**32)
        if name.endswith("mean"):
            return jnp.asarray(r.uniform(-0.5, 0.5, leaf.shape), jnp.float32)
        if name.endswith("var"):
            return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        if name.endswith("scale"):
            return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    return model, variables, x0


def test_trace_finds_all_conv_bn_pairs(r18):
    model, variables, x0 = r18
    pairs = q.trace_conv_bn_pairs(model, variables, x0, train=False)
    # resnet18: stem + 8 blocks x 2 convs + 3 downsample convs = 20 conv/bn
    assert len(pairs) == 20
    for conv_path, bn_path in pairs.items():
        assert "Conv" in conv_path and "BatchNorm" in bn_path


def test_folded_forward_matches(r18):
    model, variables, x0 = r18
    folded = q.fold_batchnorm(model, variables, x0, train=False)
    ref = model.apply(variables, x0, train=False)
    got = model.apply(folded, x0, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_folded_bn_scale_rides_kernel(r18):
    model, variables, x0 = r18
    folded = q.fold_batchnorm(model, variables, x0, train=False)
    # every folded BN is the identity-affine form
    def check(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "BatchNorm" in name and name.endswith("scale"):
            np.testing.assert_array_equal(np.asarray(leaf), 1.0)
        if "BatchNorm" in name and name.endswith("mean"):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    jax.tree_util.tree_map_with_path(check, folded)
    # treedef unchanged (jit caches, checkpoints keep working)
    assert (jax.tree_util.tree_structure(folded)
            == jax.tree_util.tree_structure(variables))


def test_int8_on_folded_keeps_accuracy(r18):
    model, variables, x0 = r18
    folded = q.fold_batchnorm(model, variables, x0, train=False)
    ref = np.asarray(model.apply(variables, x0, train=False))
    got = np.asarray(q.apply_int8(model, folded, x0, train=False, min_size=1024))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"int8-on-folded rel err {rel}"


def test_mobilenet_v3_folding(rng):
    """SE-interleaved net: MBConv blocks interleave non-BN convs (the SE
    squeeze/excite 1x1s) with conv+bn pairs — the exact topology where the
    old id()-reuse trace mispaired a BN with a freed conv's recycled id
    (kernel (1,1,24,144) * scale (960,)). Regression for VERDICT r4 #1."""
    model = models.mobilenet_v3_large(num_classes=10)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(2), x0, train=False)
    pairs = q.trace_conv_bn_pairs(model, variables, x0, train=False)
    assert len(pairs) >= 30
    folded = q.fold_batchnorm(model, variables, x0, train=False)
    ref = model.apply(variables, x0, train=False)
    got = model.apply(folded, x0, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_mobilenet_folding(rng):
    model = models.mobilenet_v2(num_classes=10)
    x0 = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(1), x0, train=False)
    pairs = q.trace_conv_bn_pairs(model, variables, x0, train=False)
    assert len(pairs) >= 35  # every conv in v2 is conv+bn
    folded = q.fold_batchnorm(model, variables, x0, train=False)
    ref = model.apply(variables, x0, train=False)
    got = model.apply(folded, x0, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
