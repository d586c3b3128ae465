"""Detection end-to-end glue, EMA, DistributedSampler, contrast parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cpu_vision_tpu import datasets, ops
from cpu_vision_tpu.models import detection as det
from cpu_vision_tpu.train import ExponentialMovingAverage


class TestDetectGlue:
    def test_variable_size_images_through_retinanet(self, rng):
        model = det.RetinaNet(
            num_classes=3,
            anchor_sizes=((16,), (32,), (64,), (128,), (256,)),
            aspect_ratios=((1.0,),) * 5,
            topk_candidates=100,
            max_detections=5,
        )
        t = det.GeneralizedRCNNTransform(min_size=64, max_size=128, size_divisible=32)
        x0 = jnp.ones((1, 128, 128, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x0, train=False)
        images = [
            jnp.asarray(rng.random((100, 60, 3), dtype=np.float32)),
            jnp.asarray(rng.random((80, 120, 3), dtype=np.float32)),
        ]
        results = det.detect(model, v, images, t)
        assert len(results) == 2
        for r, img in zip(results, images):
            assert r["boxes"].shape == (5, 4)
            # boxes mapped back to original coordinates stay in range
            valid = np.asarray(r["valid"])
            b = np.asarray(r["boxes"])[valid]
            if len(b):
                assert b[:, 2].max() <= img.shape[1] + 1
                assert b[:, 3].max() <= img.shape[0] + 1


class TestEMA:
    def test_decay_math(self):
        params = {"w": jnp.zeros((3,))}
        ema = ExponentialMovingAverage(params, decay=0.9)
        ema.update({"w": jnp.ones((3,))})
        np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.1, atol=1e-6)
        ema.update({"w": jnp.ones((3,))})
        np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.19, atol=1e-6)


class TestDistributedSampler:
    def test_disjoint_and_complete(self):
        ds = list(range(10))
        idx_all = []
        for rank in range(4):
            s = datasets.DistributedSampler(ds, num_replicas=4, rank=rank, shuffle=False)
            idx = list(s)
            assert len(idx) == 3  # ceil(10/4)
            idx_all.extend(idx)
        assert set(idx_all) == set(range(10))  # covers everything (with wrap)

    def test_epoch_reshuffles(self):
        ds = list(range(32))
        s = datasets.DistributedSampler(ds, num_replicas=2, rank=0, shuffle=True)
        s.set_epoch(0)
        a = list(s)
        s.set_epoch(1)
        b = list(s)
        assert a != b


class TestContrastParity:
    @pytest.mark.parametrize("factor", [0.4, 1.0, 1.7])
    def test_uint8_matches_torch_chain(self, rng, factor):
        """adjust_contrast uint8 vs the reference's exact call chain."""
        img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
        t = torch.from_numpy(img.transpose(2, 0, 1))
        r, g, b = t.unbind(0)
        gray = (0.2989 * r + 0.587 * g + 0.114 * b).to(torch.uint8)  # rgb_to_grayscale
        mean = torch.mean(gray.to(torch.float32))
        ref = (factor * t.to(torch.float32) + (1 - factor) * mean).clamp(0, 255)
        ref = ref.to(torch.uint8).numpy().transpose(1, 2, 0)  # truncating cast
        ours = np.asarray(ops.adjust_contrast(jnp.asarray(img), factor))
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
