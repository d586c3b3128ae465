"""QAT (straight-through fake-quant) — counterpart of the reference's
torch.ao-based QAT model variants (``models/quantization/``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu.models import quantization as Q


class TestFakeQuant:
    def test_matches_int8_deployment_exactly(self, rng):
        """forward under fake-quant == forward under quantize->restore."""
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        params = {"Dense_0": {"kernel": w, "bias": jnp.zeros(128)}}
        fq = Q.fake_quantize_params(params, min_size=16)
        qp, _ = Q.quantize_params(params, min_size=16)
        restored = Q.restore_params(qp)
        np.testing.assert_allclose(
            np.asarray(fq["Dense_0"]["kernel"]),
            np.asarray(restored["Dense_0"]["kernel"]), atol=1e-6)
        # bias too small to quantise -> untouched
        np.testing.assert_array_equal(np.asarray(fq["Dense_0"]["bias"]), 0.0)

    def test_straight_through_gradient(self, rng):
        w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))

        def loss(w):
            fq = Q.fake_quantize_params({"k": w}, min_size=16)["k"]
            return jnp.sum(fq**2)

        g = jax.grad(loss)(w)
        # STE: d/dw sum(fq^2) = 2*fq (gradient flows through round as identity)
        fq = Q.fake_quantize_params({"k": w}, min_size=16)["k"]
        np.testing.assert_allclose(np.asarray(g), np.asarray(2 * fq), atol=1e-5)

    def test_qat_training_converges(self, rng):
        """A linear-regression fit trained entirely under fake-quant reaches
        near-zero loss and deploys to int8 with the same predictions."""
        true_w = rng.standard_normal((16, 4)).astype(np.float32)
        x = rng.standard_normal((256, 16)).astype(np.float32)
        y = x @ true_w

        w = jnp.zeros((16, 4))

        @jax.jit
        def step(w):
            def loss(w):
                fq = Q.fake_quantize_params({"k": w}, min_size=8)["k"]
                return jnp.mean((x @ fq - y) ** 2)

            l, g = jax.value_and_grad(loss)(w)
            return w - 0.05 * g, l

        losses = []
        for _ in range(300):
            w, l = step(w)
            losses.append(float(l))
        assert losses[-1] < 0.01 * losses[0]

        # deploy: int8 weights reproduce the QAT forward exactly
        qp, _ = Q.quantize_params({"k": w}, min_size=8)
        deployed = Q.restore_params(qp)["k"]
        fq = Q.fake_quantize_params({"k": w}, min_size=8)["k"]
        np.testing.assert_allclose(np.asarray(x @ deployed), np.asarray(x @ fq),
                                   rtol=1e-5, atol=1e-5)
