"""Weight-linked eval presets vs the LIVE reference ``_presets.py`` —
deterministic pipelines (resize/crop/rescale/normalize), compared end to end
on the same uint8 input."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rpresets():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import torchvision.transforms._presets as _rp

        yield _rp
    finally:
        cleanup_reference_path(added)


class TestPresetsVsReference:
    def test_image_classification_eval(self, rpresets, rng):
        import torch

        from cpu_vision_tpu.train.presets import ImageClassificationEval

        img = rng.integers(0, 256, (300, 280, 3)).astype(np.uint8)
        want = rpresets.ImageClassification(crop_size=224)(
            torch.from_numpy(img.transpose(2, 0, 1))).numpy().transpose(1, 2, 0)
        got = np.asarray(ImageClassificationEval(224, 256)(jnp.asarray(img)))
        assert got.shape == want.shape
        # 1 uint8 LSB after normalize is 1/255/std ~= 0.0175 -- allow exactly
        # that much on the antialias-boundary pixels, tight float elsewhere
        diff = np.abs(got - want)
        assert (diff > 2e-3).mean() < 1e-3 and diff.max() < 0.02

    def test_semantic_segmentation_eval(self, rpresets, rng):
        import torch

        from cpu_vision_tpu.train.presets import SemanticSegmentationEval

        img = rng.integers(0, 256, (300, 280, 3)).astype(np.uint8)
        want = rpresets.SemanticSegmentation(resize_size=520)(
            torch.from_numpy(img.transpose(2, 0, 1))).numpy().transpose(1, 2, 0)
        got = np.asarray(SemanticSegmentationEval(520)(jnp.asarray(img)))
        assert got.shape == want.shape
        diff = np.abs(got - want)
        assert (diff > 2e-3).mean() < 1e-3 and diff.max() < 0.02

    def test_video_classification_eval(self, rpresets, rng):
        import torch

        from cpu_vision_tpu.train.presets import VideoClassificationEval

        vid = rng.integers(0, 256, (4, 128, 171, 3)).astype(np.uint8)
        # reference expects (..., T, C, H, W)
        want = rpresets.VideoClassification(crop_size=(112, 112), resize_size=(128, 171))(
            torch.from_numpy(vid.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(VideoClassificationEval((112, 112), (128, 171))(jnp.asarray(vid)))
        # reference emits (C, T, H, W); ours (T, H, W, C)
        np.testing.assert_allclose(got.transpose(3, 0, 1, 2), want, atol=2e-3)

    def test_optical_flow_eval(self, rpresets, rng):
        import torch

        from cpu_vision_tpu.train.presets import OpticalFlowEval

        i1 = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
        i2 = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
        w1, w2 = rpresets.OpticalFlow()(torch.from_numpy(i1.transpose(2, 0, 1)),
                                        torch.from_numpy(i2.transpose(2, 0, 1)))
        g1, g2 = OpticalFlowEval()(jnp.asarray(i1), jnp.asarray(i2))
        np.testing.assert_allclose(np.asarray(g1), w1.numpy().transpose(1, 2, 0), atol=2e-3)
        np.testing.assert_allclose(np.asarray(g2), w2.numpy().transpose(1, 2, 0), atol=2e-3)
