"""AutoAugment policy tables + magnitude spaces vs the LIVE reference
(``transforms/autoaugment.py``): these are large hand-typed tables, so the
only trustworthy check is against the source itself."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def raa():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        import torchvision.transforms.autoaugment as _m

        yield _m
    finally:
        cleanup_reference_path(added)


class TestAutoAugmentTablesVsReference:
    @pytest.mark.parametrize("policy", ["imagenet", "cifar10", "svhn"])
    def test_policy_tables_identical(self, raa, policy):
        from cpu_vision_tpu.transforms._auto_augment import _POLICIES

        tref = raa.AutoAugment(raa.AutoAugmentPolicy(policy))
        want = tref.policies
        got = _POLICIES[policy]
        assert len(got) == len(want)
        for (o1, o2), (w1, w2) in zip(got, want):
            assert o1 == tuple(w1), (o1, w1)
            assert o2 == tuple(w2), (o2, w2)

    def test_magnitude_space_matches(self, raa):
        import torch

        from cpu_vision_tpu.transforms._auto_augment import _space_autoaugment

        tref = raa.AutoAugment()
        want = tref._augmentation_space(10, (32, 48))  # (H, W)
        got = _space_autoaugment(10, (32, 48))
        assert set(got) == set(want)
        for name, (wm, ws) in want.items():
            gm, gs = got[name]
            assert bool(gs) == bool(ws), name
            np.testing.assert_allclose(np.asarray(gm, np.float64).ravel(),
                                       wm.to(torch.float64).numpy().ravel(),
                                       atol=1e-6, err_msg=name)

    def test_randaugment_trivialwide_spaces(self, raa):
        import torch

        from cpu_vision_tpu.transforms._auto_augment import RandAugment, TrivialAugmentWide

        want = raa.RandAugment()._augmentation_space(31, (32, 48))
        got = RandAugment(num_magnitude_bins=31)._space((32, 48))
        assert set(got) == set(want)
        for name, (wm, _) in want.items():
            np.testing.assert_allclose(np.asarray(got[name][0], np.float64).ravel(),
                                       wm.to(torch.float64).numpy().ravel(),
                                       atol=1e-6, err_msg=name)

        want = raa.TrivialAugmentWide(num_magnitude_bins=31)._augmentation_space(31)
        got = TrivialAugmentWide(num_magnitude_bins=31)._space()
        assert set(got) == set(want)
        for name, (wm, _) in want.items():
            np.testing.assert_allclose(np.asarray(got[name][0], np.float64).ravel(),
                                       wm.to(torch.float64).numpy().ravel(),
                                       atol=1e-6, err_msg=name)
