"""PatchifyDense (space-to-depth matmul patch embed, models/layers.py) must
be numerically identical to the stride==kernel conv it replaces — the TPU
lane-padding fix for ViT/Swin/Swin3D patch embeds (VERDICT.md round-2
item 2; reference conv_proj at ``vision_transformer.py:290``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from cpu_vision_tpu.models.layers import PatchifyDense


@pytest.mark.parametrize("patch,shape,feat", [
    ((16, 16), (2, 64, 48, 3), 96),
    ((4, 4), (2, 32, 32, 3), 24),
    ((2, 4, 4), (1, 4, 16, 16, 3), 32),  # video (T, H, W) patches
])
def test_matches_conv(patch, shape, feat, rng):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    pd = PatchifyDense(feat, patch)
    variables = pd.init(jax.random.PRNGKey(0), x)
    got = pd.apply(variables, x)

    conv = nn.Conv(feat, patch, strides=patch, padding="VALID")
    # same kernel/bias: PatchifyDense keeps the conv's HWIO param shape
    ref = conv.apply({"params": {"kernel": variables["params"]["kernel"],
                                 "bias": variables["params"]["bias"]}}, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_param_tree_slot_unchanged():
    """ViT still exposes Conv_0/{kernel,bias} with the HWIO conv shape, so
    vit_from_torch and param-parity are unaffected."""
    from cpu_vision_tpu import models

    m = models.vit_b_32(num_classes=10)
    variables = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)), train=False))
    conv0 = variables["params"]["Conv_0"]
    assert conv0["kernel"].shape == (32, 32, 3, 768)
    assert conv0["bias"].shape == (768,)


def test_indivisible_raises(rng):
    x = jnp.ones((1, 30, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        PatchifyDense(8, (16, 16)).init(jax.random.PRNGKey(0), x)


class TestFusedMHA:
    """FusedMHA (one QKV matmul) must equal flax MultiHeadDotProductAttention
    on the same params — it occupies the identical param slots."""

    def test_matches_flax_mha(self, rng):
        from cpu_vision_tpu.models.vision_transformer import FusedMHA

        d, nh, s, n = 64, 4, 17, 2
        x = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
        fused = FusedMHA(num_heads=nh)
        variables = fused.init(jax.random.PRNGKey(0), x)
        got = fused.apply(variables, x)

        mha = nn.MultiHeadDotProductAttention(num_heads=nh, deterministic=True)
        ref = mha.apply(variables, x, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_vit_param_tree_has_flax_mha_slots(self):
        from cpu_vision_tpu import models

        m = models.vit_b_32(num_classes=10)
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0),
                                          jnp.ones((1, 64, 64, 3)), train=False))
        attn = v["params"]["encoder_0"]["MultiHeadDotProductAttention_0"]
        assert attn["query"]["kernel"].shape == (768, 12, 64)
        assert attn["out"]["kernel"].shape == (12, 64, 768)
