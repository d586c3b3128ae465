"""DepthwiseConv (shifted-slice FMA) vs flax's grouped nn.Conv.

The module replaces ``feature_group_count == C`` convs in ConvNeXt /
MobileNet / EfficientNet (the few-lane MXU trap — see
``models/layers.py:DepthwiseConv``).  Reference semantics: torch's
``Conv2d(groups=C)`` as used by ``torchvision/models/convnext.py:62-92``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cpu_vision_tpu.models.layers import ConvNormActivation, DepthwiseConv


def _grouped_conv_ref(x, kernel, bias, strides, padding, dilation):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + bias if bias is not None else out


@pytest.mark.parametrize(
    "k,strides,padding,dilation",
    [
        ((7, 7), (1, 1), [(3, 3), (3, 3)], (1, 1)),   # convnext CNBlock
        ((3, 3), (1, 1), [(1, 1), (1, 1)], (1, 1)),   # mobilenet dw
        ((3, 3), (2, 2), [(1, 1), (1, 1)], (1, 1)),   # mobilenet dw stride 2
        ((5, 5), (1, 1), [(2, 2), (2, 2)], (1, 1)),   # efficientnet dw 5x5
        ((5, 5), (2, 2), [(2, 2), (2, 2)], (1, 1)),
        ((3, 3), (1, 1), [(2, 2), (2, 2)], (2, 2)),   # dilated
        ((3, 3), (1, 1), "VALID", (1, 1)),
        ((1, 7), (1, 1), [(0, 0), (3, 3)], (1, 1)),   # asymmetric
    ],
)
def test_matches_grouped_conv(k, strides, padding, dilation):
    rng = np.random.default_rng(0)
    c = 32
    x = jnp.asarray(rng.standard_normal((2, 17, 19, c)).astype(np.float32))
    mod = DepthwiseConv(c, k, strides=strides, padding=padding,
                        kernel_dilation=dilation)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    ref = _grouped_conv_ref(
        x, variables["params"]["kernel"], variables["params"]["bias"],
        strides, padding if isinstance(padding, str) else [tuple(p) for p in padding],
        dilation)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_param_tree_matches_grouped_nn_conv():
    """Same param names/shapes as the nn.Conv it replaces (weight
    converters and param-parity depend on this)."""
    x = jnp.zeros((1, 8, 8, 16))
    dw = DepthwiseConv(16, (7, 7), padding=[(3, 3), (3, 3)], name="Conv_0")
    ref = nn.Conv(16, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=16,
                  name="Conv_0")
    pa = jax.tree.map(lambda a: a.shape, dw.init(jax.random.PRNGKey(0), x))
    pb = jax.tree.map(lambda a: a.shape, ref.init(jax.random.PRNGKey(0), x))
    assert pa == pb


def test_conv_norm_activation_depthwise_path_param_compatible():
    """ConvNormActivation(groups=features) keeps its param tree identical
    to the grouped-nn.Conv version and computes the same function."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 14, 14, 24)).astype(np.float32))
    cna = ConvNormActivation(24, kernel_size=3, strides=2, groups=24, norm="batch")
    variables = cna.init(jax.random.PRNGKey(0), x, train=False)
    kshape = variables["params"]["Conv_0"]["kernel"].shape
    assert kshape == (3, 3, 1, 24)
    out = cna.apply(variables, x, train=False)
    ref = _grouped_conv_ref(
        x, variables["params"]["Conv_0"]["kernel"], None,
        (2, 2), [(1, 1), (1, 1)], (1, 1))
    # BN at init is identity-ish (mean 0 var 1) then relu
    np.testing.assert_allclose(
        np.asarray(out), np.maximum(np.asarray(ref) / np.sqrt(1 + 1e-5), 0),
        rtol=2e-5, atol=2e-5)


def test_bf16_dtype_roundtrip():
    rng = np.random.default_rng(2)
    c = 64
    x = jnp.asarray(rng.standard_normal((1, 12, 12, c)).astype(np.float32))
    mod = DepthwiseConv(c, (7, 7), padding=[(3, 3), (3, 3)], dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.dtype == jnp.bfloat16
    ref = _grouped_conv_ref(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        variables["params"]["kernel"].astype(jnp.bfloat16).astype(jnp.float32),
        variables["params"]["bias"], (1, 1), [(3, 3), (3, 3)], (1, 1))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
