"""Smoke tests for the optical-flow and similarity training references
(counterparts of the reference's ``references/optical_flow`` and
``references/similarity``), plus unit checks of their loss math against
hand/torch-style oracles."""

import numpy as np
import jax.numpy as jnp
import pytest


class TestOpticalFlowReference:
    def test_train_smoke(self, capsys):
        from references.optical_flow.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--image-size", "64", "--iters", "2", "--batch-size", "1"])
        out = capsys.readouterr().out
        assert "loss" in out and "epe=" in out

    def test_sequence_loss_weights(self):
        from references.optical_flow.train import sequence_loss

        # constant error of 1 px in x on every prediction: loss = sum of
        # gamma weights * mean|diff| where mean is over N*H*W*2 (mask on x only)
        gt = jnp.zeros((1, 4, 4, 2))
        preds = jnp.ones((3, 1, 4, 4, 2)) * jnp.asarray([1.0, 0.0])
        valid = jnp.ones((1, 4, 4), bool)
        loss = float(sequence_loss(preds, gt, valid, gamma=0.5))
        # |diff| mean = 0.5 (half the channels), weights 0.25+0.5+1.0
        np.testing.assert_allclose(loss, 0.5 * 1.75, rtol=1e-6)

    def test_metrics_perfect(self):
        from references.optical_flow.train import compute_metrics

        gt = jnp.ones((1, 8, 8, 2)) * 2.0
        m = compute_metrics(gt, gt)
        assert float(m["epe"]) == 0.0
        assert float(m["1px"]) == 1.0
        assert float(m["f1"]) == 0.0


class TestSimilarityReference:
    def test_train_smoke(self, capsys):
        from references.similarity.train import main

        main(["--fake-data", "--epochs", "1", "--steps-per-epoch", "2",
              "--labels-per-batch", "3", "--samples-per-label", "2",
              "--model", "resnet18", "--image-size", "32"])
        out = capsys.readouterr().out
        assert "pair-accuracy" in out

    def test_batch_all_matches_bruteforce(self, rng):
        from references.similarity.train import batch_all_triplet_loss

        emb = rng.random((8, 4), dtype=np.float32)
        labels = np.array([0, 0, 1, 1, 2, 2, 0, 1])
        loss, frac = batch_all_triplet_loss(jnp.asarray(labels), jnp.asarray(emb),
                                            margin=1.0)
        # brute-force oracle over all (a, p, n) triplets
        d = np.sqrt(((emb[:, None] - emb[None]) ** 2).sum(-1) + 1e-12)
        vals = []
        for a in range(8):
            for p in range(8):
                for n in range(8):
                    if a != p and labels[a] == labels[p] and labels[a] != labels[n]:
                        vals.append(max(d[a, p] - d[a, n] + 1.0, 0.0))
        vals = np.asarray(vals)
        pos = vals[vals > 1e-16]
        np.testing.assert_allclose(float(loss), pos.sum() / max(len(pos), 1), rtol=1e-4)

    def test_batch_hard_nonnegative(self, rng):
        from references.similarity.train import batch_hard_triplet_loss

        emb = rng.random((6, 4), dtype=np.float32)
        labels = jnp.asarray([0, 0, 1, 1, 2, 2])
        assert float(batch_hard_triplet_loss(labels, jnp.asarray(emb))) >= 0.0

    def test_pk_sampler_structure(self):
        from references.similarity.train import PKSampler

        groups = [0] * 5 + [1] * 5 + [2] * 2 + [3] * 5  # label 2 dropped (<k)
        s = PKSampler(groups, p=2, k=3, seed=1)
        assert 2 not in s.bins
        batch = next(iter(s))
        assert len(batch) == 6
        labs = [groups[i] for i in batch]
        assert len(set(labs)) == 2
        for l in set(labs):
            assert labs.count(l) == 3
