"""Mask kernels vs the LIVE reference (``transforms/v2/functional``) on a
categorical label map — nearest-neighbour geometry must agree exactly."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")

H, W = 24, 32


@pytest.fixture(scope="module")
def ref():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import torchvision.transforms.v2.functional as RF
        from torchvision import tv_tensors as rtt

        yield RF, rtt
    finally:
        cleanup_reference_path(added)


CASES = [
    ("horizontal_flip", {}, True),
    ("vertical_flip", {}, True),
    ("crop", dict(top=3, left=5, height=15, width=20), True),
    ("center_crop", dict(output_size=(16, 22)), True),
    ("pad", dict(padding=(2, 4)), True),
    ("resize", dict(size=(12, 16)), True),
    # warped nearest grids: allow a sliver of boundary-pixel disagreement
    ("affine", dict(angle=20.0, translate=(2, -3), scale=1.1, shear=(4.0, 0.0)), False),
    ("rotate", dict(angle=33.0), False),
    ("rotate", dict(angle=33.0, expand=True), False),
]


class TestMaskKernelsVsReference:
    @pytest.mark.parametrize("name,kwargs,exact", CASES,
                             ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(CASES)])
    def test_matches_reference(self, ref, rng, name, kwargs, exact):
        import torch

        from cpu_vision_tpu.transforms import functional as F
        from cpu_vision_tpu.tv_arrays import Mask

        RF, rtt = ref
        m_np = rng.integers(0, 5, (H, W)).astype(np.uint8)
        got = np.asarray(getattr(F, name)(Mask(jnp.asarray(m_np)), **kwargs).data)
        want = getattr(RF, name)(rtt.Mask(torch.from_numpy(m_np)), **kwargs).numpy()
        assert got.shape == want.shape
        if exact:
            np.testing.assert_array_equal(got, want)
        else:
            frac = (got != want).mean()
            assert frac < 0.03, f"{name}: {frac:.3%} pixels differ"
