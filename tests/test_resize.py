"""Resize parity vs torch F.interpolate (the reference's backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops
from torch_oracle import resize as t_resize


def _img(rng, h, w, c, dtype):
    if dtype == np.uint8:
        return rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return rng.random((h, w, c), dtype=np.float32)


SIZES = [((32, 48), (16, 24)), ((32, 48), (64, 96)), ((37, 23), (20, 40)), ((16, 16), (31, 7))]


class TestBilinear:
    @pytest.mark.parametrize("antialias", [False, True])
    @pytest.mark.parametrize("insize,outsize", SIZES)
    def test_float_matches(self, rng, antialias, insize, outsize):
        img = _img(rng, *insize, 3, np.float32)
        ref = t_resize(img, outsize, "bilinear", antialias)
        ours = np.asarray(ops.resize(jnp.asarray(img), outsize, "bilinear", antialias))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    @pytest.mark.parametrize("antialias", [False, True])
    @pytest.mark.parametrize("insize,outsize", SIZES)
    def test_uint8_within_1lsb(self, rng, antialias, insize, outsize):
        img = _img(rng, *insize, 3, np.uint8)
        ref = t_resize(img, outsize, "bilinear", antialias)
        ours = np.asarray(ops.resize(jnp.asarray(img), outsize, "bilinear", antialias))
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max err {diff.max()}"


class TestBicubic:
    @pytest.mark.parametrize("antialias", [False, True])
    @pytest.mark.parametrize("insize,outsize", SIZES)
    def test_float_matches(self, rng, antialias, insize, outsize):
        img = _img(rng, *insize, 1, np.float32)
        ref = t_resize(img, outsize, "bicubic", antialias)
        ours = np.asarray(ops.resize(jnp.asarray(img), outsize, "bicubic", antialias))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_uint8_clamped(self, rng):
        img = _img(rng, 16, 16, 3, np.uint8)
        ref = t_resize(img, (40, 40), "bicubic", False)
        ours = np.asarray(ops.resize(jnp.asarray(img), (40, 40), "bicubic", False))
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1


class TestNearest:
    @pytest.mark.parametrize("mode", ["nearest", "nearest-exact"])
    @pytest.mark.parametrize("insize,outsize", SIZES)
    def test_exact_match(self, rng, mode, insize, outsize):
        img = _img(rng, *insize, 3, np.uint8)
        ref = t_resize(img, outsize, mode.replace("nearest-exact", "nearest-exact"), False)
        ours = np.asarray(ops.resize(jnp.asarray(img), outsize, mode, False))
        np.testing.assert_array_equal(ours, ref)


class TestMisc:
    def test_identity(self, rng):
        img = _img(rng, 20, 20, 3, np.float32)
        out = np.asarray(ops.resize(jnp.asarray(img), (20, 20)))
        np.testing.assert_array_equal(out, img)

    def test_jit_and_vmap(self, rng):
        imgs = jnp.asarray(np.stack([_img(rng, 32, 32, 3, np.float32) for _ in range(3)]))
        f = jax.jit(lambda x: ops.resize(x, (16, 16)))
        out = f(imgs)
        assert out.shape == (3, 16, 16, 3)
        per = np.stack([np.asarray(ops.resize(i, (16, 16))) for i in imgs])
        np.testing.assert_allclose(np.asarray(out), per, atol=1e-5)

    def test_rescale(self, rng):
        img = _img(rng, 30, 40, 1, np.float32)
        out = ops.rescale(jnp.asarray(img), 0.5)
        assert out.shape == (15, 20, 1)
