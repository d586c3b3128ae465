"""RAFT correlation-pyramid lookup (``models/optical_flow.py:
_bilinear_lookup``): the structured patch-gather redesign must reproduce
the reference grid_sample(zeros, align_corners=True) tap semantics exactly
(oracle = the straightforward per-tap loop it replaced)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cpu_vision_tpu.models.optical_flow import _bilinear_lookup


def _oracle(corr, coords, radius):
    n, hw, hl, wl = corr.shape
    d = np.arange(-radius, radius + 1, dtype=np.float32)
    di, dj = np.meshgrid(d, d, indexing="ij")
    offs = np.stack([di.reshape(-1), dj.reshape(-1)], axis=-1)  # (K, 2)=(dx,dy)
    k = offs.shape[0]
    x = coords[..., 0:1] + offs[None, None, :, 0]
    y = coords[..., 1:2] + offs[None, None, :, 1]
    x0 = np.floor(x)
    y0 = np.floor(y)
    tx = x - x0
    ty = y - y0
    out = np.zeros((n, hw, k), np.float32)
    flat = corr.reshape(n, hw, hl * wl)
    for dyi, wy in ((0, 1.0 - ty), (1, ty)):
        for dxi, wx in ((0, 1.0 - tx), (1, tx)):
            yt = y0 + dyi
            xt = x0 + dxi
            valid = (yt >= 0) & (yt <= hl - 1) & (xt >= 0) & (xt <= wl - 1)
            yi = np.clip(yt, 0, hl - 1).astype(np.int64)
            xi = np.clip(xt, 0, wl - 1).astype(np.int64)
            idx = yi * wl + xi
            tap = np.take_along_axis(flat, idx, axis=2)
            out = out + np.where(valid, tap * (wy * wx), 0.0)
    return out


@pytest.mark.parametrize("radius", [4, 3, 1])
def test_patch_lookup_matches_oracle(rng, radius):
    n, hw, hl, wl = 2, 40, 14, 32
    corr = rng.standard_normal((n, hw, hl, wl)).astype(np.float32)
    # centres spread WELL outside the map to hit every clamp/pad regime
    coords = np.stack([
        rng.uniform(-12, wl + 12, (n, hw)).astype(np.float32),
        rng.uniform(-12, hl + 12, (n, hw)).astype(np.float32),
    ], axis=-1)
    got = np.asarray(_bilinear_lookup(jnp.asarray(corr), jnp.asarray(coords),
                                      radius))
    ref = _oracle(corr, coords, radius)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_patch_lookup_integer_and_edge_centres(rng):
    n, hw, hl, wl = 1, 16, 8, 8
    corr = rng.standard_normal((n, hw, hl, wl)).astype(np.float32)
    cs = [(0.0, 0.0), (7.0, 7.0), (-1.0, 3.5), (8.0, 2.0), (3.0, -0.5),
          (6.999, 6.999), (-5.0, -5.0), (12.0, 12.0), (3.5, 3.5),
          (0.5, 7.5), (7.5, 0.5), (-0.999, -0.999), (2.0, 9.0),
          (9.0, 2.0), (4.25, 4.75), (1.0, 1.0)]
    coords = np.asarray(cs, np.float32).reshape(1, hw, 2)
    got = np.asarray(_bilinear_lookup(jnp.asarray(corr), jnp.asarray(coords), 4))
    ref = _oracle(corr, coords, 4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
