"""RAFT-Stereo model + depth training reference (counterparts of the
reference's ``prototype/models/depth/stereo/raft_stereo.py`` and
``references/depth/stereo/train.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.models.stereo import _corr_pyramid_1d, _lookup_1d


class TestCorr1d:
    def test_pyramid_shapes(self, rng):
        f1 = jnp.asarray(rng.random((2, 4, 16, 8), dtype=np.float32))
        f2 = jnp.asarray(rng.random((2, 4, 16, 8), dtype=np.float32))
        pyr = _corr_pyramid_1d(f1, f2, 3)
        assert [p.shape for p in pyr] == [(2, 4, 16, 16), (2, 4, 16, 8), (2, 4, 16, 4)]

    def test_corr_is_rowwise_dot(self, rng):
        f1 = jnp.asarray(rng.random((1, 2, 5, 4), dtype=np.float32))
        f2 = jnp.asarray(rng.random((1, 2, 5, 4), dtype=np.float32))
        corr = _corr_pyramid_1d(f1, f2, 1)[0]
        ref = np.einsum("nhic,nhjc->nhij", f1, f2) / np.sqrt(4.0)
        np.testing.assert_allclose(np.asarray(corr), ref, rtol=1e-5)

    def test_lookup_integer_coords(self, rng):
        corr = jnp.asarray(rng.random((1, 2, 3, 8), dtype=np.float32))
        x = jnp.asarray([[[2.0, 4.0, 6.0], [1.0, 3.0, 5.0]]])
        out = _lookup_1d(corr, x, radius=1)
        assert out.shape == (1, 2, 3, 3)
        # center tap at integer coords equals the direct value
        np.testing.assert_allclose(out[0, 0, 0, 1], corr[0, 0, 0, 2], rtol=1e-6)
        # interpolation midpoint
        out2 = _lookup_1d(corr, jnp.asarray([[[2.5, 2.5, 2.5], [2.5, 2.5, 2.5]]]), 0)
        np.testing.assert_allclose(
            np.asarray(out2[0, 0, 0, 0]),
            0.5 * (np.asarray(corr[0, 0, 0, 2]) + np.asarray(corr[0, 0, 0, 3])),
            rtol=1e-5,
        )


class TestRaftStereo:
    @pytest.mark.parametrize("name,levels", [("raft_stereo_base", 3),
                                             ("raft_stereo_realtime", 2)])
    def test_forward_shapes(self, rng, name, levels):
        m = models.get_model(name, iters=2)
        l = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
        r = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), l, r)
        outs = m.apply(v, l, r)
        assert len(outs) == 2
        assert outs[-1].shape == (1, 64, 96, 1)

    def test_registry(self):
        assert "raft_stereo_base" in models.list_models()
        assert "raft_stereo_realtime" in models.list_models()

    def test_grad_flows(self, rng):
        m = models.get_model("raft_stereo_realtime", iters=1)
        l = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        r = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        v = m.init(jax.random.PRNGKey(0), l, r)

        def loss(p):
            return sum(jnp.abs(o).mean() for o in m.apply({"params": p}, l, r))

        g = jax.grad(loss)(v["params"])
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestDepthReference:
    def test_train_smoke(self, capsys):
        from references.depth.stereo.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--image-size", "64", "--iters", "2", "--batch-size", "1"])
        out = capsys.readouterr().out
        assert "loss" in out and "epe=" in out and "bad1=" in out

    def test_sequence_loss_weights(self):
        from references.depth.stereo.train import sequence_loss

        gt = jnp.zeros((1, 4, 4, 1))
        preds = jnp.ones((3, 1, 4, 4, 1))
        valid = jnp.ones((1, 4, 4), bool)
        loss = float(sequence_loss(preds, gt, valid, gamma=0.5))
        # |diff| mean = 1, weights 0.25 + 0.5 + 1.0
        np.testing.assert_allclose(loss, 1.75, rtol=1e-6)

    def test_metrics_match_reference_semantics(self, rng):
        from references.depth.stereo.train import compute_metrics

        pred = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32)) * 4
        gt = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32)) * 4 + 1
        m = compute_metrics(pred, gt)
        diff = np.abs(np.asarray(pred) - np.asarray(gt))[..., 0]
        np.testing.assert_allclose(float(m["mae"]), diff.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(m["rmse"]), np.sqrt((diff**2).mean()), rtol=1e-5)
        np.testing.assert_allclose(float(m["bad2"]), (diff > 2).mean(), rtol=1e-5)
        assert float(m["epe"]) == float(m["mae"])
