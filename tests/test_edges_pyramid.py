"""Canny / Harris / pyramid behavioural tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops


def _square_img(h=64, w=64, lo=0.1, hi=0.9):
    img = np.full((h, w), lo, np.float32)
    img[16:48, 16:48] = hi
    return img


class TestCanny:
    def test_square_produces_closed_contour(self):
        img = _square_img()
        edges = np.asarray(ops.canny(jnp.asarray(img), 0.1, 0.3))
        assert edges.shape == (64, 64)
        assert set(np.unique(edges)).issubset({0.0, 1.0})
        # edges exist near the square border, none deep inside/outside
        assert edges[14:18, 20:44].sum() > 10  # top edge band
        assert edges[30:34, 30:34].sum() == 0  # interior
        assert edges[2:8, 2:8].sum() == 0  # exterior

    def test_hysteresis_connects_weak_chain(self):
        # gradient ramp: weak edge segment attached to a strong one survives,
        # isolated weak segment dies
        mag = np.zeros((1, 16, 16), np.float32)
        strong = jnp.asarray(mag > 1)  # none yet
        weak = np.zeros((1, 16, 16), bool)
        weak[0, 8, 2:10] = True  # chain
        weak[0, 2, 12:15] = True  # isolated
        strong = np.zeros((1, 16, 16), bool)
        strong[0, 8, 2] = True
        out = np.asarray(ops.hysteresis(jnp.asarray(strong), jnp.asarray(weak)))
        assert out[0, 8, 2:10].all()  # grew along the chain
        assert not out[0, 2, 12:15].any()  # isolated weak dropped

    def test_thresholds_monotonic(self):
        img = _square_img()
        lo = np.asarray(ops.canny(jnp.asarray(img), 0.05, 0.1)).sum()
        hi = np.asarray(ops.canny(jnp.asarray(img), 0.3, 0.6)).sum()
        assert lo >= hi

    def test_jit_and_batch(self):
        imgs = jnp.asarray(np.stack([_square_img(), _square_img(lo=0.2)])[..., None])
        out = jax.jit(lambda x: ops.canny(x, 0.1, 0.3))(imgs)
        assert out.shape == (2, 64, 64, 1)

    def test_uint8_input(self):
        img = (np.asarray(_square_img()) * 255).astype(np.uint8)
        edges = np.asarray(ops.canny(jnp.asarray(img), 25.0, 75.0))
        assert edges.sum() > 10


class TestHarris:
    def test_corners_of_square(self):
        img = _square_img()
        coords, scores, valid = ops.harris(jnp.asarray(img), max_corners=8)
        got = {tuple(c) for c, v in zip(np.asarray(coords), np.asarray(valid)) if v}
        # all four inner corners of the square found within a couple pixels
        expect = [(16, 16), (16, 47), (47, 16), (47, 47)]
        for ey, ex in expect:
            assert any(abs(gy - ey) <= 2 and abs(gx - ex) <= 2 for gy, gx in got), (ey, ex, got)

    def test_response_flat_region_zero(self):
        img = jnp.full((32, 32), 0.5, jnp.float32)
        resp = np.asarray(ops.harris_response(img))
        np.testing.assert_allclose(resp, 0.0, atol=1e-6)

    def test_fixed_output_shape(self):
        img = _square_img()
        coords, scores, valid = ops.harris(jnp.asarray(img), max_corners=16)
        assert coords.shape == (16, 2) and scores.shape == (16,) and valid.shape == (16,)


class TestPyramid:
    def test_pyr_down_shape_halves(self, rng):
        img = jnp.asarray(rng.random((1, 64, 48, 3), dtype=np.float32))
        out = ops.pyr_down(img)
        assert out.shape == (1, 32, 24, 3)

    def test_pyr_up_doubles(self, rng):
        img = jnp.asarray(rng.random((16, 16, 1), dtype=np.float32))
        out = ops.pyr_up(img)
        assert out.shape == (32, 32, 1)

    def test_constant_preserved(self):
        img = jnp.full((32, 32, 1), 0.7, jnp.float32)
        down = ops.pyr_down(img)
        np.testing.assert_allclose(np.asarray(down), 0.7, atol=1e-5)
        up = ops.pyr_up(down)
        np.testing.assert_allclose(np.asarray(up)[2:-2, 2:-2], 0.7, atol=1e-5)

    def test_gaussian_pyramid_levels(self, rng):
        img = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
        pyr = ops.gaussian_pyramid(img, 4)
        assert [p.shape for p in pyr] == [(64, 64, 3), (32, 32, 3), (16, 16, 3), (8, 8, 3)]

    def test_laplacian_reconstruction(self, rng):
        img = jnp.asarray(rng.random((64, 64, 1), dtype=np.float32))
        lap = ops.laplacian_pyramid(img, 4)
        rec = ops.reconstruct_from_laplacian(lap)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-5)

    def test_odd_sizes(self, rng):
        img = jnp.asarray(rng.random((33, 47, 1), dtype=np.float32))
        lap = ops.laplacian_pyramid(img, 3)
        rec = ops.reconstruct_from_laplacian(lap)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-5)
