"""Fused Swin window-attention kernel vs the plain-XLA oracle.

Covers the group-batched, sublane-padded kernel (S=49 -> 56 padding with
softmax-killed keys) for v1/v2, masked/unmasked, across the stage shapes
swin_t actually runs (reference semantics:
``torchvision/models/swin_transformer.py:shifted_window_attention``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpu_vision_tpu.models.swin import _shift_mask
from cpu_vision_tpu.ops.pallas.swin_attention import (_ref_math,
                                                      window_attention_block)


def _mk(rng, nw, s, c, heads, v2, masked, nw_img, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((nw, s, c)).astype(np.float32)).astype(dtype)
    ln_g = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    w_qkv = jnp.asarray((rng.standard_normal((c, 3 * c)) * 0.05).astype(np.float32)).astype(dtype)
    b_qkv = jnp.asarray((rng.standard_normal(3 * c) * 0.02).astype(np.float32))
    w_o = jnp.asarray((rng.standard_normal((c, c)) * 0.05).astype(np.float32)).astype(dtype)
    b_o = jnp.asarray((rng.standard_normal(c) * 0.02).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal((heads, s, s)) * 0.3).astype(np.float32))
    ws = int(round(s ** 0.5))
    side = int(round(nw_img ** 0.5)) * ws
    mask = _shift_mask(side, side, ws, ws // 2, ws // 2) if masked else None
    ls = (jnp.asarray(rng.uniform(0.5, 2.0, heads).astype(np.float32))
          if v2 else None)
    return x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls


@pytest.mark.parametrize(
    "nw,s,c,heads,v2,masked,nw_img",
    [
        (64, 49, 96, 3, False, False, 64),    # swin_t stage 1
        (64, 49, 96, 3, False, True, 64),     # stage 1 shifted
        (16, 49, 192, 6, False, True, 16),    # stage 2 shifted
        (8, 49, 384, 12, False, False, 4),    # stage 3, 2 images
        (4, 49, 768, 24, False, True, 1),     # stage 4 shifted
        (16, 64, 96, 3, True, False, 16),     # v2 ws=8 (no padding path)
        (16, 64, 96, 3, True, True, 16),      # v2 shifted
        (8, 49, 192, 6, True, True, 4),       # v2 with padding (odd S)
    ],
)
def test_kernel_matches_oracle(nw, s, c, heads, v2, masked, nw_img):
    rng = np.random.default_rng(0)
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls = _mk(
        rng, nw, s, c, heads, v2, masked, nw_img)
    scale = float((c // heads) ** -0.5)
    out = window_attention_block(
        x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls, heads, scale,
        1e-5, v2, nw_img, jax.default_backend() != "tpu")
    ref = _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls,
                    heads, scale, 1e-5, v2, nw_img, w_qkv.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_per_head_softmax_extreme_spread():
    """Regression (ADVICE r4): the packed path must subtract a PER-HEAD row
    max.  With a global max, a head sitting ~100 logits below another
    head's max underflows exp() to all-zeros and silently outputs ~0.
    Drive the v2 cosine path with per-head logit scales spread 0.01..100
    (cosine logits in [-1,1] -> per-head logit ranges ±100 vs ±0.01)."""
    rng = np.random.default_rng(7)
    nw, s, c, heads, nw_img = 16, 64, 96, 3, 16
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, _ = _mk(
        rng, nw, s, c, heads, True, False, nw_img)
    ls = jnp.asarray([100.0, 0.01, 1.0], jnp.float32)
    bias = bias * 0.0  # keep the spread purely from the per-head scales
    scale = float((c // heads) ** -0.5)
    out = window_attention_block(
        x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, None, ls, heads, scale,
        1e-5, True, nw_img, jax.default_backend() != "tpu")
    ref = _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, None, ls,
                    heads, scale, 1e-5, True, nw_img, w_qkv.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_packed_per_head_softmax_v1_bias_offset():
    """Same failure mode in v1: a large constant per-head bias offset is a
    softmax no-op per head, and must stay one through the packed kernel."""
    rng = np.random.default_rng(8)
    nw, s, c, heads, nw_img = 64, 49, 96, 3, 64
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, _ = _mk(
        rng, nw, s, c, heads, False, False, nw_img)
    off = jnp.asarray([0.0, -150.0, 120.0], jnp.float32)
    bias = bias + off[:, None, None]
    scale = float((c // heads) ** -0.5)
    out = window_attention_block(
        x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, None, None, heads,
        scale, 1e-5, False, nw_img, jax.default_backend() != "tpu")
    ref = _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, None, None,
                    heads, scale, 1e-5, False, nw_img, w_qkv.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_oracle_bf16():
    rng = np.random.default_rng(1)
    nw, s, c, heads = 16, 49, 192, 6
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls = _mk(
        rng, nw, s, c, heads, False, True, 16, dtype=jnp.bfloat16)
    scale = float((c // heads) ** -0.5)
    out = window_attention_block(
        x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls, heads, scale,
        1e-5, False, 16, jax.default_backend() != "tpu")
    ref = _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls,
                    heads, scale, 1e-5, False, 16, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_gradients_flow():
    rng = np.random.default_rng(2)
    nw, s, c, heads = 4, 49, 96, 3
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls = _mk(
        rng, nw, s, c, heads, False, True, 4)
    scale = float((c // heads) ** -0.5)

    def loss(x, w_qkv):
        out = window_attention_block(
            x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask, ls, heads,
            scale, 1e-5, False, 4, jax.default_backend() != "tpu")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w_qkv)
    assert bool(jnp.all(jnp.isfinite(gx))) and bool(jnp.all(jnp.isfinite(gw)))
    # numeric check against the oracle's autodiff
    def loss_ref(x, w_qkv):
        out = _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, bias, mask,
                        ls, heads, scale, 1e-5, False, 4, w_qkv.dtype)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_qkv)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-4, atol=1e-4)
