"""roi_align vs the LIVE reference's pure-torch fallback
(``ops/roi_align.py:115-200``, `_roi_align_fallback`) — the same math the
C++ kernel implements, exact to float tolerance."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def r_roi():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import importlib

        yield importlib.import_module("torchvision.ops.roi_align")
    finally:
        cleanup_reference_path(added)


class TestRoiAlignVsReference:
    @pytest.mark.parametrize("aligned", [False, True])
    @pytest.mark.parametrize("sampling_ratio", [-1, 2])
    def test_matches_fallback(self, r_roi, rng, aligned, sampling_ratio):
        import torch

        from cpu_vision_tpu import ops

        x = rng.random((2, 5, 18, 22)).astype(np.float32)  # NCHW for torch
        rois = np.array([
            [0, 1.5, 2.0, 14.0, 12.0],
            [1, 0.0, 0.0, 21.0, 17.0],
            [0, 5.2, 3.3, 9.9, 8.8],
        ], np.float32)
        want = r_roi._roi_align(torch.from_numpy(x), torch.from_numpy(rois),
                                spatial_scale=0.5, pooled_height=5,
                                pooled_width=4, sampling_ratio=sampling_ratio,
                                aligned=aligned).numpy()
        got = np.asarray(ops.roi_align(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(rois),
            output_size=(5, 4), spatial_scale=0.5,
            sampling_ratio=sampling_ratio, aligned=aligned))
        # ours is NHWC
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)
