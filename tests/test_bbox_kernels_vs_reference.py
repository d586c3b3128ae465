"""Bounding-box kernels vs the LIVE reference implementation
(``torchvision/transforms/v2/functional/_geometry.py``) on random boxes —
the strongest form of the reference's own box-kernel correctness tests
(``test/test_transforms_v2.py:566-700``, which assert against the same
affine helpers)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")

H, W = 33, 47


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


def _boxes_np(rng, n=7):
    x1 = rng.uniform(0, W - 5, n)
    y1 = rng.uniform(0, H - 5, n)
    x2 = x1 + rng.uniform(1, W - x1)
    y2 = y1 + rng.uniform(1, H - y1)
    return np.stack([x1, y1, x2, y2], 1).astype(np.float32)


def _pair(ref, rng):
    import torch

    from cpu_vision_tpu.tv_arrays import BoundingBoxes

    RF, rtt = ref
    b_np = _boxes_np(rng)
    ours = BoundingBoxes(jnp.asarray(b_np), format="XYXY", canvas_size=(H, W))
    theirs = rtt.BoundingBoxes(torch.from_numpy(b_np), format="XYXY",
                               canvas_size=(H, W))
    return ours, theirs


CASES = [
    ("horizontal_flip", {}),
    ("vertical_flip", {}),
    ("resize", dict(size=(17, 29))),
    ("crop", dict(top=4, left=6, height=20, width=30)),
    ("center_crop", dict(output_size=(21, 31))),
    ("pad", dict(padding=(3, 5))),
    ("affine", dict(angle=23.0, translate=(5, -4), scale=1.3, shear=(7.0, 0.0))),
    ("rotate", dict(angle=37.0)),
    ("rotate", dict(angle=37.0, expand=True)),
    ("perspective", dict(startpoints=None, endpoints=None,
                         coefficients=[1.05, 0.02, -1.0, 0.01, 1.03, -0.5, 1e-4, 2e-4])),
]


class TestBoxKernelsVsReference:
    @pytest.mark.parametrize("name,kwargs", CASES,
                             ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
    def test_matches_reference(self, ref, rng, name, kwargs):
        from cpu_vision_tpu.transforms import functional as F

        RF, _ = ref
        ours, theirs = _pair(ref, rng)
        okw = dict(kwargs)
        if name == "perspective":
            okw = dict(coeffs=kwargs["coefficients"])
        got = np.asarray(getattr(F, name)(ours, **okw).data)
        want = getattr(RF, name)(theirs, **kwargs).numpy()
        np.testing.assert_allclose(got, want, atol=1e-2), name
