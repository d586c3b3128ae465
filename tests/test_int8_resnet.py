"""End-to-end int8 ResNet engine (``models/quantization_resnet.py``),
counterpart of the reference's ``models/quantization/resnet.py`` fused
QuantizableResNet: BN-folded int8 graph vs the float flax model, int8
activations between layers, grouped (resnext) convs, calibration gating."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.models.quantization_resnet import Int8ResNet


def _perturbed_init(model, x, seed=0):
    v = model.init(jax.random.PRNGKey(seed), x, train=False)

    def perturb(path, leaf):
        nm = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        r = np.random.default_rng(abs(hash(nm)) % 2**32)
        if nm.endswith("mean"):
            return jnp.asarray(r.uniform(-0.3, 0.3, leaf.shape), jnp.float32)
        if nm.endswith("var"):
            return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        if "BatchNorm" in nm and nm.endswith("scale"):
            return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, v)


@pytest.mark.parametrize("name", ["resnet18", "resnet50", "resnext50_32x4d"])
def test_folded_graph_matches_flax(name, rng):
    m = models.get_model(name, num_classes=10)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    ref = np.asarray(m.apply(v, x, train=False))
    eng = Int8ResNet.from_model(m, v)
    got = np.asarray(eng.float_reference(x))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_int8_logits_close_and_dtype_int8_between_layers(rng):
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.asarray(rng.random((4, 64, 64, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    eng = Int8ResNet.from_model(m, v).calibrate([x])
    ref = np.asarray(m.apply(v, x, train=False))
    q = np.asarray(jax.jit(eng)(x))
    rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.06, f"int8 rel err {rel}"
    corr = np.corrcoef(q.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995

    # the inter-layer tensors really are int8 (spy on the requantiser)
    dtypes = []
    orig = eng._requant

    def spy(f, site, int8_mode):
        out = orig(f, site, int8_mode)
        dtypes.append(out.dtype)
        return out

    eng._requant = spy
    eng._forward(x, int8_mode=True)
    assert all(d == jnp.int8 for d in dtypes)


def test_uncalibrated_raises(rng):
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    eng = Int8ResNet.from_model(m, v)
    with pytest.raises(RuntimeError, match="calibrate"):
        eng(x)


def test_weight_memory_is_int8():
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    eng = Int8ResNet.from_model(m, v)
    for name, spec in eng.convs.items():
        assert spec.qw.dtype == jnp.int8, name
        assert spec.w_scale.dtype == jnp.float32


def test_pallas_path_matches_xla_path(rng):
    """use_pallas routes every bottleneck 1x1 conv (inner, block-final,
    strided downsample) through the fused Pallas requant-matmul.  The two
    int8 graphs differ by 1-LSB requant flips (XLA reassociates the f32
    epilogue multiplies), which compound over 16 blocks — so the contract
    is accuracy against the float oracle, not bit-parity across paths:
    the Pallas graph must be at least as accurate as the XLA int8 graph."""
    m = models.get_model("resnet50", num_classes=10)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    eng = Int8ResNet.from_model(m, v).calibrate([x])
    fl = np.asarray(eng.float_reference(x))
    scale = np.abs(fl).max() + 1e-9
    rel_xla = np.abs(np.asarray(eng(x)) - fl).max() / scale
    eng.use_pallas = True
    got = np.asarray(eng(x))
    rel_pl = np.abs(got - fl).max() / scale
    assert rel_pl < rel_xla * 1.2 + 0.005, (
        f"pallas int8 rel err {rel_pl} vs xla {rel_xla}")
    # per-requant-site agreement stays within 1 LSB of the XLA graph
    eng.use_pallas = False
    ref = np.asarray(eng(x))
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_s2d2_stem_bit_exact(rng):
    """The space-to-depth stem (k7 s2 p3 -> s2d + 4x4 s1 conv) is a pure
    permutation of the int8 weights, so the whole int8 forward must be
    BIT-IDENTICAL to the direct-conv graph."""
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    eng = Int8ResNet.from_model(m, v).calibrate([x])
    eng.use_s2d2_stem = False
    direct = np.asarray(eng(x))
    eng.use_s2d2_stem = True
    s2d = np.asarray(eng(x))
    np.testing.assert_array_equal(direct, s2d)


def test_s2d2_stem_odd_input_falls_back(rng):
    """Odd spatial dims can't space-to-depth; the engine must fall back to
    the direct conv (and still match the float oracle)."""
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.asarray(rng.random((2, 65, 65, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    eng = Int8ResNet.from_model(m, v).calibrate([x])
    fl = np.asarray(eng.float_reference(x))
    got = np.asarray(eng(x))
    rel = np.abs(got - fl).max() / (np.abs(fl).max() + 1e-9)
    assert rel < 0.06


def test_bf16_epilogue_close_to_f32(rng):
    """The bf16 pre-requant carry (a perf knob, default off) adds at most
    ~0.5 LSB of rounding per requant site — logits must stay close to the
    f32-epilogue graph and within the engine's error budget of the float
    oracle."""
    m = models.get_model("resnet18", num_classes=10)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = _perturbed_init(m, x)
    eng = Int8ResNet.from_model(m, v).calibrate([x])
    f32 = np.asarray(eng(x))
    eng.bf16_epilogue = True
    b16 = np.asarray(eng(x))
    fl = np.asarray(eng.float_reference(x))
    scale = max(np.abs(fl).max(), 1e-9)
    # per-site rounding is <=0.5 LSB but flipped LSBs cascade through the
    # downstream requant chain, so graph-vs-graph drift exceeds one LSB
    assert np.abs(b16 - f32).max() / scale < 0.04
    assert np.abs(b16 - fl).max() / scale < 0.06
