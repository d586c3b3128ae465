"""Warp parity vs torch grid_sample / the reference's grid pipeline."""

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cpu_vision_tpu import ops


def _img(rng, h, w, c, dtype=np.float32):
    if dtype == np.uint8:
        return rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return rng.random((h, w, c), dtype=np.float32)


def t_grid_sample(img_nhwc, grid, mode):
    t = torch.from_numpy(img_nhwc.transpose(0, 3, 1, 2))
    g = torch.from_numpy(grid)
    out = F.grid_sample(t, g, mode=mode, padding_mode="zeros", align_corners=False)
    return out.numpy().transpose(0, 2, 3, 1)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_random_grid_matches(self, rng, mode):
        img = np.stack([_img(rng, 12, 17, 3)])
        grid = (rng.random((1, 9, 11, 2), dtype=np.float32) * 2.4 - 1.2).astype(np.float32)
        ref = t_grid_sample(img, grid, mode)
        ours = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_identity_grid(self, rng):
        img = np.stack([_img(rng, 8, 8, 1)])
        ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        gx = (xs + 0.5) / 8 * 2 - 1
        gy = (ys + 0.5) / 8 * 2 - 1
        grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
        out = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(out, img, atol=1e-5)


def t_affine(img_hwc, matrix, mode, fill=None):
    """Reference affine: _gen_affine_grid + grid_sample (+fill mask)."""
    t = torch.from_numpy(img_hwc.transpose(2, 0, 1))[None].float()
    theta = torch.tensor(matrix, dtype=torch.float32).reshape(1, 2, 3)
    h, w = t.shape[-2], t.shape[-1]
    d = 0.5
    base_grid = torch.empty(1, h, w, 3)
    base_grid[..., 0].copy_(torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, steps=w))
    base_grid[..., 1].copy_(torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, steps=h).unsqueeze_(-1))
    base_grid[..., 2].fill_(1)
    rescaled = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    grid = base_grid.view(1, h * w, 3).bmm(rescaled).view(1, h, w, 2)
    if fill is not None:
        mask = torch.ones((1, 1, h, w))
        t = torch.cat([t, mask], dim=1)
    out = F.grid_sample(t, grid, mode=mode, padding_mode="zeros", align_corners=False)
    if fill is not None:
        mask = out[:, -1:]
        out = out[:, :-1]
        fill_t = torch.tensor(fill).view(1, -1, 1, 1).expand_as(out)
        if mode == "nearest":
            out = torch.where(mask.expand_as(out) < 0.5, fill_t, out)
        else:
            out = out * mask + (1.0 - mask) * fill_t
    return out[0].numpy().transpose(1, 2, 0)


class TestAffine:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_rotation_matrix_matches(self, rng, mode):
        img = _img(rng, 16, 20, 3)
        a = math.radians(20)
        matrix = [math.cos(a), -math.sin(a), 1.5, math.sin(a), math.cos(a), -2.0]
        ref = t_affine(img, matrix, mode)
        ours = np.asarray(ops.affine(jnp.asarray(img), matrix, interpolation=mode))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_fill(self, rng):
        img = _img(rng, 10, 10, 3)
        matrix = [1.0, 0.0, 6.0, 0.0, 1.0, 0.0]  # translate out of range
        ref = t_affine(img, matrix, "bilinear", fill=[0.5, 0.25, 1.0])
        ours = np.asarray(ops.affine(jnp.asarray(img), matrix, "bilinear", fill=[0.5, 0.25, 1.0]))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_identity(self, rng):
        img = _img(rng, 9, 9, 1)
        out = np.asarray(ops.affine(jnp.asarray(img), [1, 0, 0, 0, 1, 0], "bilinear"))
        np.testing.assert_allclose(out, img, atol=1e-4)


class TestRotate:
    def test_rotate_90_exact(self, rng):
        img = _img(rng, 12, 12, 1)
        out = np.asarray(ops.rotate(jnp.asarray(img), 90.0, interpolation="bilinear"))
        np.testing.assert_allclose(out, np.rot90(img, 1, axes=(0, 1)), atol=1e-3)

    def test_expand_changes_size(self, rng):
        img = _img(rng, 10, 20, 1)
        out = ops.rotate(jnp.asarray(img), 90.0, expand=True)
        assert out.shape == (20, 10, 1)

    def test_uint8_roundtrip(self, rng):
        img = _img(rng, 12, 12, 3, np.uint8)
        out = ops.rotate(jnp.asarray(img), 45.0, interpolation="bilinear", fill=0)
        assert out.dtype == jnp.uint8


class TestPerspective:
    def test_identity_coeffs(self, rng):
        img = _img(rng, 11, 13, 3)
        out = np.asarray(ops.perspective(jnp.asarray(img), [1, 0, 0, 0, 1, 0, 0, 0]))
        np.testing.assert_allclose(out, img, atol=1e-3)


class TestElastic:
    def test_zero_displacement_is_identity(self, rng):
        img = _img(rng, 8, 10, 1)
        disp = np.zeros((1, 8, 10, 2), np.float32)
        out = np.asarray(ops.elastic(jnp.asarray(img), jnp.asarray(disp)))
        np.testing.assert_allclose(out, img, atol=1e-4)
