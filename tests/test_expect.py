"""Expect-file regression tier (the reference's ``test/expect/`` strategy,
``test_models.py:133-155``): stored golden outputs generated from the
torch-oracle-verified implementations guard against semantic drift.
Regenerate deliberately with tests/expect/README instructions."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "expect", "golden_kernels.npz"))


def test_gaussian_blur_u8():
    out = np.asarray(ops.gaussian_blur(jnp.asarray(GOLDEN["input_u8"]), 5, 1.5))
    np.testing.assert_array_equal(out, GOLDEN["gaussian_blur_u8"])


def test_sobel_f32():
    out = np.asarray(ops.sobel(jnp.asarray(GOLDEN["input_f32"])))
    np.testing.assert_allclose(out, GOLDEN["sobel_f32"], atol=1e-6)


def test_canny():
    out = np.asarray(ops.canny(jnp.asarray(GOLDEN["input_f32"]), 0.08, 0.2, backend="xla"))
    np.testing.assert_array_equal(out, GOLDEN["canny"])


def test_resize_bilinear_aa_u8():
    out = np.asarray(ops.resize(jnp.asarray(GOLDEN["input_u8"]), (32, 48), "bilinear", True))
    np.testing.assert_array_equal(out, GOLDEN["resize_bilinear_aa_u8"])


def test_resize_bicubic_u8():
    out = np.asarray(ops.resize(jnp.asarray(GOLDEN["input_u8"]), (96, 128), "bicubic", False))
    np.testing.assert_array_equal(out, GOLDEN["resize_bicubic_u8"])


def test_harris_f32():
    out = np.asarray(ops.harris_response(jnp.asarray(GOLDEN["input_f32"])))
    np.testing.assert_allclose(out, GOLDEN["harris_f32"], atol=1e-6)


def test_equalize_u8():
    out = np.asarray(ops.equalize(jnp.asarray(GOLDEN["input_u8"])))
    np.testing.assert_array_equal(out, GOLDEN["equalize_u8"])


def test_rotate30_u8():
    out = np.asarray(ops.rotate(jnp.asarray(GOLDEN["input_u8"]), 30.0, "bilinear", fill=0))
    np.testing.assert_array_equal(out, GOLDEN["rotate30_u8"])
