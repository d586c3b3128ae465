"""Anchor/default-box generators vs the LIVE reference (pure torch, no C
ops): exact coordinate equality level by level."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rdet():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        from torchvision.models.detection import anchor_utils as _au
        from torchvision.models.detection.image_list import ImageList

        yield _au, ImageList
    finally:
        cleanup_reference_path(added)


class TestAnchorsVsReference:
    def test_rpn_anchor_generator_exact(self, rdet):
        import torch

        from cpu_vision_tpu.models.detection.anchor_utils import AnchorGenerator

        au, ImageList = rdet
        sizes = ((32,), (64,), (128,), (256,), (512,))
        ratios = ((0.5, 1.0, 2.0),) * 5
        fshapes = [(64, 80), (32, 40), (16, 20), (8, 10), (4, 5)]
        img_size = (512, 640)

        theirs = au.AnchorGenerator(sizes, ratios)
        feats = [torch.zeros(1, 8, fh, fw) for fh, fw in fshapes]
        ilist = ImageList(torch.zeros(1, 3, *img_size), [img_size])
        want = theirs(ilist, feats)[0].numpy()  # all levels concatenated

        ours = AnchorGenerator(sizes, ratios)(img_size, fshapes)
        got = np.concatenate([np.asarray(a) for a in ours])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_ssd_default_boxes_exact(self, rdet):
        import torch

        from cpu_vision_tpu.models.detection.ssd import DefaultBoxGenerator

        au, ImageList = rdet
        aspect_ratios = [[2], [2, 3], [2, 3], [2, 3], [2], [2]]
        fshapes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]

        theirs = au.DefaultBoxGenerator(aspect_ratios, scales=None,
                                        steps=[8, 16, 32, 64, 100, 300])
        feats = [torch.zeros(1, 8, fh, fw) for fh, fw in fshapes]
        ilist = ImageList(torch.zeros(1, 3, 300, 300), [(300, 300)])
        want = theirs(ilist, feats)[0].numpy()

        ours = DefaultBoxGenerator(aspect_ratios=aspect_ratios,
                                   steps=(8, 16, 32, 64, 100, 300))
        got = np.asarray(ours(300, [f[0] for f in fshapes]))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)
