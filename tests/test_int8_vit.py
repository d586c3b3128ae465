"""Int8ViT PTQ engine (models/quantization_vit.py) + the int8 fused
transformer kernels (ops/pallas/int8_transformer.py).

The reference has no quantized ViT (models/quantization/ is CNN-only);
the contract here is against our own float oracle: the int8 graph must
track the bf16 fused path closely and the engine must gate on
calibration like Int8ResNet does."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu.models.vision_transformer import VisionTransformer
from cpu_vision_tpu.models.quantization_vit import Int8ViT
from cpu_vision_tpu.ops.pallas.int8_transformer import (
    attention_block_int8, mlp_block_int8, quantize_weight)
from cpu_vision_tpu.ops.pallas.transformer_block import (
    _ln_f32, _gelu_f32)


def _tiny(rng):
    m = VisionTransformer(16, 2, 4, 256, 512, num_classes=10,
                          dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, v, x


def test_mlp_kernel_matches_float_math(rng):
    m_tok, d, dh = 70, 256, 512
    x = jnp.asarray(rng.standard_normal((m_tok, d)), jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    b = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, dh)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(dh) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((dh, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    x32 = x.astype(jnp.float32)
    h = _ln_f32(x32, g, b, 1e-6)
    f = _gelu_f32(h @ w1 + b1)
    ref = x32 + f @ w2 + b2
    # per-channel act scales, folded into the weight rows (the engine's
    # calibrate() contract)
    a1 = jnp.max(jnp.abs(h), axis=0) / 127.0
    a2 = jnp.max(jnp.abs(f), axis=0) / 127.0
    qw1, s1 = quantize_weight(w1 * a1[:, None])
    qw2, s2 = quantize_weight(w2 * a2[:, None])

    got = mlp_block_int8(x, g, b, qw1, s1, b1, qw2, s2, b2, a1, a2,
                         interpret=True).astype(jnp.float32)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.02, rel


def test_attention_kernel_matches_float_math(rng):
    n, s, d, heads = 2, 33, 256, 4
    hd = d // heads
    x = jnp.asarray(rng.standard_normal((n, s, d)), jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    b = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    scale = 1.0 / float(hd) ** 0.5

    x32 = x.astype(jnp.float32)
    h = _ln_f32(x32, g, b, 1e-6)
    qkv = (h.reshape(-1, d) @ wqkv + bqkv).reshape(n, s, 3 * d)
    q, k, v = [a.reshape(n, s, heads, hd) for a in jnp.split(qkv, 3, -1)]
    sc = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(n, s, d)
    ref = x32 + (o.reshape(-1, d) @ wo + bo).reshape(n, s, d)
    a1 = jnp.max(jnp.abs(h.reshape(-1, d)), axis=0) / 127.0
    ao = jnp.max(jnp.abs(o.reshape(-1, d)), axis=0) / 127.0
    qwqkv, sqkv = quantize_weight(wqkv * a1[:, None])
    qwo, so = quantize_weight(wo * ao[:, None])

    got = attention_block_int8(
        x, g, b, qwqkv, sqkv, bqkv, qwo, so, bo, a1, ao, heads, scale,
        interpret=True).astype(jnp.float32)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9)
    assert rel < 0.03, rel


def test_engine_logits_close_to_flax(rng):
    m, v, x = _tiny(rng)
    ref = np.asarray(m.apply(v, x, train=False)).astype(np.float32)
    eng = Int8ViT.from_model(m, v).calibrate([x])
    fl = np.asarray(eng.float_reference(x)).astype(np.float32)
    q = np.asarray(eng(x)).astype(np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(fl - ref).max() / scale < 0.02      # float twin == model
    assert np.abs(q - fl).max() / scale < 0.05        # int8 tracks float
    assert np.corrcoef(q.ravel(), ref.ravel())[0, 1] > 0.995


def test_uncalibrated_raises(rng):
    m, v, x = _tiny(rng)
    eng = Int8ViT.from_model(m, v)
    with pytest.raises(RuntimeError, match="calibrate"):
        eng(x)


def test_quantized_vit_builders_registered():
    from cpu_vision_tpu import models
    from cpu_vision_tpu.models.quantization import QuantizableModel
    for n in ("quantized_vit_b_16", "quantized_vit_b_32",
              "quantized_vit_l_16", "quantized_vit_l_32"):
        assert n in models.list_models()
        m = models.get_model(n, num_classes=10)
        assert isinstance(m, QuantizableModel)
        assert isinstance(m.model, VisionTransformer)


def test_weights_are_int8(rng):
    m, v, _ = _tiny(rng)
    eng = Int8ViT.from_model(m, v)
    for ly in eng.layers:
        for qw in (ly.qw_qkv, ly.qw_o, ly.qw1, ly.qw2):
            assert qw.dtype == jnp.int8
