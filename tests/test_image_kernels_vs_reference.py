"""v2 image kernels vs the LIVE reference implementation on uint8 images.

``tests/torch_oracle.py`` re-creates selected reference call chains; this
file goes further and calls the reference's own ``transforms.v2.functional``
directly (CHW torch) against ours (HWC jax). uint8-in/uint8-out ops must
match within 1 LSB (the documented parity protocol)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")

H, W = 26, 34


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

        yield RF
    finally:
        cleanup_reference_path(added)


# (name, kwargs, max LSB error on uint8)
CASES = [
    ("horizontal_flip", {}, 0),
    ("vertical_flip", {}, 0),
    ("crop", dict(top=3, left=5, height=16, width=22), 0),
    ("center_crop", dict(output_size=(16, 22)), 0),
    ("pad", dict(padding=(2, 4)), 0),
    ("resize", dict(size=(13, 17), antialias=True), 1),
    ("resize", dict(size=(52, 68), antialias=False), 1),
    ("adjust_brightness", dict(brightness_factor=1.4), 1),
    ("adjust_contrast", dict(contrast_factor=0.7), 1),
    ("adjust_saturation", dict(saturation_factor=1.5), 1),
    ("adjust_hue", dict(hue_factor=0.12), 1),
    ("adjust_gamma", dict(gamma=1.3), 1),
    ("adjust_sharpness", dict(sharpness_factor=1.7), 1),
    ("posterize", dict(bits=3), 0),
    ("solarize", dict(threshold=128), 0),
    ("autocontrast", {}, 1),
    ("invert", {}, 0),
    ("equalize", {}, 0),
    ("gaussian_blur", dict(kernel_size=5, sigma=1.2), 1),
    ("rgb_to_grayscale", dict(num_output_channels=3), 1),
    ("affine", dict(angle=15.0, translate=(3, -2), scale=1.2,
                    shear=(5.0, 0.0)), 1),
    ("rotate", dict(angle=25.0), 1),
    ("elastic", None, 1),  # displacement filled in-test
]


class TestImageKernelsVsReference:
    @pytest.mark.parametrize("name,kwargs,lsb", CASES,
                             ids=[f"{n}-{i}" for i, (n, _, _) in enumerate(CASES)])
    def test_uint8_within_lsb(self, ref, rng, name, kwargs, lsb):
        import torch

        from cpu_vision_tpu.transforms import functional as F

        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        t = torch.from_numpy(img.transpose(2, 0, 1))
        if name == "elastic":
            disp = rng.normal(0, 0.01, (1, H, W, 2)).astype(np.float32)
            got = np.asarray(F.elastic(jnp.asarray(img), jnp.asarray(disp)))
            want = ref.elastic(t, displacement=torch.from_numpy(disp)).numpy()
        else:
            got = np.asarray(getattr(F, name)(jnp.asarray(img), **kwargs))
            want = getattr(ref, name)(t, **kwargs).numpy()
        want_hwc = want.transpose(1, 2, 0)
        assert got.shape == want_hwc.shape and got.dtype == want_hwc.dtype
        diff = np.abs(got.astype(np.int32) - want_hwc.astype(np.int32))
        if name in ("affine", "rotate", "elastic"):
            # warped grids: identical mapping up to boundary-pixel rounding
            assert (diff > lsb).mean() < 0.02, f"{name}: {(diff > lsb).mean():.3%} off"
        else:
            assert diff.max() <= lsb, f"{name}: max {diff.max()} LSB (allowed {lsb})"
