"""Viz utils vs the LIVE reference ``torchvision/utils.py`` — make_grid,
flow_to_image and draw_segmentation_masks are pure tensor math there, so
exact comparison is possible."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rutils():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import torchvision.utils as _ru

        yield _ru
    finally:
        cleanup_reference_path(added)


class TestUtilsVsReference:
    def test_make_grid(self, rutils, rng):
        import torch

        from cpu_vision_tpu import utils

        imgs = rng.random((7, 10, 12, 3)).astype(np.float32)
        got = np.asarray(utils.make_grid(jnp.asarray(imgs), nrow=3, padding=2,
                                         pad_value=0.5))
        want = rutils.make_grid(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                                nrow=3, padding=2,
                                pad_value=0.5).numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_make_grid_normalize(self, rutils, rng):
        import torch

        from cpu_vision_tpu import utils

        imgs = rng.normal(0, 3, (4, 8, 9, 3)).astype(np.float32)
        got = np.asarray(utils.make_grid(jnp.asarray(imgs), nrow=2, normalize=True))
        want = rutils.make_grid(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                                nrow=2, normalize=True).numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_flow_to_image(self, rutils, rng):
        import torch

        from cpu_vision_tpu import utils

        flow = rng.normal(0, 4, (2, 16, 20)).astype(np.float32)
        got = np.asarray(utils.flow_to_image(jnp.asarray(flow.transpose(1, 2, 0))))
        want = rutils.flow_to_image(torch.from_numpy(flow)).numpy().transpose(1, 2, 0)
        # uint8 color wheel: allow 1 LSB of rounding
        assert got.dtype == want.dtype == np.uint8
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_draw_segmentation_masks(self, rutils, rng):
        import torch

        from cpu_vision_tpu import utils

        img = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
        masks = np.zeros((2, 16, 20), bool)
        masks[0, 2:8, 3:10] = True
        masks[1, 9:14, 11:18] = True
        colors = [(255, 0, 0), (0, 255, 0)]
        got = np.asarray(utils.draw_segmentation_masks(
            jnp.asarray(img), jnp.asarray(masks), alpha=0.6, colors=colors))
        want = rutils.draw_segmentation_masks(
            torch.from_numpy(img.transpose(2, 0, 1)), torch.from_numpy(masks),
            alpha=0.6, colors=colors).numpy().transpose(1, 2, 0)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
