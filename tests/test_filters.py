"""Parity tests for filter kernels vs the reference's exact call sequences
(computed with the torch oracle in tests/torch_oracle.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops

from torch_oracle import adjust_sharpness as t_sharpness
from torch_oracle import depthwise_stencil as t_stencil
from torch_oracle import gaussian_blur as t_blur
from torch_oracle import gaussian_kernel1d as t_gk1d


def _rand_img(rng, h, w, c, dtype):
    if dtype == np.uint8:
        return rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return rng.random((h, w, c), dtype=np.float32)


class TestGaussianKernel:
    @pytest.mark.parametrize("ksize,sigma", [(3, 0.8), (5, 1.5), (7, 2.0), (11, 3.7), (1, 1.0)])
    def test_kernel1d_matches(self, ksize, sigma):
        ours = np.asarray(ops.get_gaussian_kernel1d(ksize, sigma))
        ref = t_gk1d(ksize, sigma)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_kernel2d_outer(self):
        k2 = np.asarray(ops.get_gaussian_kernel2d((5, 3), (1.0, 2.0)))
        assert k2.shape == (3, 5)  # (ky, kx)
        np.testing.assert_allclose(k2.sum(), 1.0, atol=1e-6)


class TestGaussianBlur:
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    @pytest.mark.parametrize("ksize,sigma", [((3, 3), (0.8, 0.8)), ((5, 5), (1.5, 1.5)), ((5, 3), (2.0, 0.7))])
    @pytest.mark.parametrize("c", [1, 3])
    def test_matches_reference(self, rng, dtype, ksize, sigma, c):
        img = _rand_img(rng, 40, 56, c, dtype)
        ref = t_blur(img, list(ksize), list(sigma))
        ours = np.asarray(ops.gaussian_blur(jnp.asarray(img), ksize, sigma))
        if dtype == np.uint8:
            diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 1, f"max uint8 err {diff.max()}"
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_nonseparable_matches_exactly(self, rng):
        img = _rand_img(rng, 32, 32, 3, np.float32)
        ref = t_blur(img, [5, 5], [1.5, 1.5])
        ours = np.asarray(ops.gaussian_blur(jnp.asarray(img), 5, 1.5, separable=False))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_batched_vmap_equivalence(self, rng):
        # batched-vs-unbatched check, the reference's check_kernel idea
        # (test/test_transforms_v2.py:122)
        batch = np.stack([_rand_img(rng, 24, 24, 3, np.float32) for _ in range(4)])
        f = lambda im: ops.gaussian_blur(im, 5, 1.5)
        batched = np.asarray(jax.vmap(f)(jnp.asarray(batch)))
        single = np.stack([np.asarray(f(jnp.asarray(b))) for b in batch])
        np.testing.assert_allclose(batched, single, atol=1e-6)

    def test_accepts_hw_hwc_nhwc(self, rng):
        img = _rand_img(rng, 16, 16, 1, np.float32)
        out_hw = ops.gaussian_blur(jnp.asarray(img[:, :, 0]), 3, 1.0)
        out_hwc = ops.gaussian_blur(jnp.asarray(img), 3, 1.0)
        out_nhwc = ops.gaussian_blur(jnp.asarray(img[None]), 3, 1.0)
        assert out_hw.shape == (16, 16)
        assert out_hwc.shape == (16, 16, 1)
        assert out_nhwc.shape == (1, 16, 16, 1)
        np.testing.assert_allclose(np.asarray(out_hw), np.asarray(out_hwc)[:, :, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_hwc), np.asarray(out_nhwc)[0], atol=1e-6)

    def test_default_sigma_rule(self):
        # sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
        img = jnp.zeros((8, 8, 1), jnp.float32)
        out = ops.gaussian_blur(img, 5)  # must not raise
        assert out.shape == (8, 8, 1)


class TestFilter2d:
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    @pytest.mark.parametrize("kshape", [(3, 3), (5, 3), (1, 7)])
    def test_matches_reference_stencil(self, rng, dtype, kshape):
        img = _rand_img(rng, 33, 47, 3, dtype)
        kernel = rng.random(kshape, dtype=np.float32)
        if dtype == np.uint8:
            # keep outputs in the uint8 range: the reference wraps on
            # out-of-range uint8 casts (UB per torch docs), we clip.
            kernel = kernel / kernel.sum()
        else:
            kernel = kernel - 0.3
        ref = t_stencil(img, kernel)
        ours = np.asarray(ops.filter2d(jnp.asarray(img), jnp.asarray(kernel)))
        if dtype == np.uint8:
            diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 1
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_uint8_out_of_range_clips(self, rng):
        # Our contract: integer outputs are clipped to the dtype range, not
        # wrapped (departure from the reference's UB cast).
        img = _rand_img(rng, 8, 8, 1, np.uint8)
        neg = ops.filter2d(jnp.asarray(img), -jnp.ones((3, 3), jnp.float32))
        assert int(np.asarray(neg).max()) == 0

    @pytest.mark.parametrize("mode", ["reflect", "replicate", "constant", "circular"])
    def test_pad_modes(self, rng, mode):
        tmode = {"reflect": "reflect", "replicate": "replicate", "constant": "constant", "circular": "circular"}[mode]
        img = _rand_img(rng, 20, 20, 1, np.float32)
        kernel = rng.random((3, 3), dtype=np.float32)
        ref = t_stencil(img, kernel, pad_mode=tmode)
        ours = np.asarray(ops.filter2d(jnp.asarray(img), jnp.asarray(kernel), mode=mode))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_separable_equals_full(self, rng):
        img = _rand_img(rng, 30, 30, 2, np.float32)
        kx = rng.random(5, dtype=np.float32)
        ky = rng.random(3, dtype=np.float32)
        full = ops.filter2d(jnp.asarray(img), jnp.outer(jnp.asarray(ky), jnp.asarray(kx)))
        sep = ops.separable_filter2d(jnp.asarray(img), jnp.asarray(kx), jnp.asarray(ky))
        np.testing.assert_allclose(np.asarray(sep), np.asarray(full), atol=1e-4)


class TestSobel:
    def test_gradients_match_stencil_oracle(self, rng):
        img = _rand_img(rng, 40, 40, 1, np.float32)
        gx_k = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
        gy_k = gx_k.T
        ref_gx = t_stencil(img, gx_k)
        ref_gy = t_stencil(img, gy_k)
        gx, gy = ops.sobel_gradients(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(gx), ref_gx, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy), ref_gy, atol=1e-4)

    def test_magnitude(self, rng):
        img = _rand_img(rng, 24, 24, 1, np.float32)
        gx, gy = ops.sobel_gradients(jnp.asarray(img))
        mag = ops.sobel(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(mag), np.sqrt(np.asarray(gx) ** 2 + np.asarray(gy) ** 2), atol=1e-5)

    def test_uint8_input_returns_float(self, rng):
        img = _rand_img(rng, 16, 16, 1, np.uint8)
        mag = ops.sobel(jnp.asarray(img))
        assert mag.dtype == jnp.float32

    def test_jit_compiles(self, rng):
        img = jnp.asarray(_rand_img(rng, 32, 32, 1, np.float32))
        out = jax.jit(ops.sobel)(img)
        assert out.shape == img.shape


class TestSharpness:
    @pytest.mark.parametrize("factor", [0.0, 0.5, 1.0, 2.0])
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    def test_matches_reference(self, rng, factor, dtype):
        img = _rand_img(rng, 21, 17, 3, dtype)
        ref = t_sharpness(img, factor)
        ours = np.asarray(ops.adjust_sharpness(jnp.asarray(img), factor))
        if dtype == np.uint8:
            diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 1
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestMisc:
    def test_box_blur_is_mean(self, rng):
        img = jnp.ones((10, 10, 1), jnp.float32) * 3.0
        out = ops.box_blur(img, 3)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    def test_laplacian_of_constant_is_zero(self):
        img = jnp.full((12, 12, 1), 7.0, jnp.float32)
        out = ops.laplacian(img)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_unsharp_mask_identity_at_zero(self, rng):
        img = jnp.asarray(_rand_img(rng, 16, 16, 3, np.float32))
        out = ops.unsharp_mask(img, 5, 1.0, amount=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
