"""Detection training machinery vs the LIVE reference ``det_utils``:
Matcher (thresholds, low-quality force-matching, ties) and BoxCoder
(encode/decode round trip, xform clip) are pure torch there — exact
comparison on random inputs."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def rdu():
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    added = reference_path_added()
    try:
        from torchvision.models.detection import _utils as _du

        yield _du
    finally:
        cleanup_reference_path(added)


class TestMatcherVsReference:
    @pytest.mark.parametrize("allow_low", [False, True])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_iou_matrices(self, rdu, allow_low, seed):
        import torch

        from cpu_vision_tpu.models.detection._utils import Matcher

        rng = np.random.default_rng(seed)
        iou = rng.random((5, 40)).astype(np.float32)
        # quantize to force ties like real IoU grids produce
        iou = np.round(iou * 8) / 8
        theirs = rdu.Matcher(0.7, 0.3, allow_low_quality_matches=allow_low)
        want = theirs(torch.from_numpy(iou)).numpy()
        ours = Matcher(0.7, 0.3, allow_low_quality_matches=allow_low)
        got = np.asarray(ours(jnp.asarray(iou)))
        np.testing.assert_array_equal(got, want)

    def test_all_below(self, rdu):
        import torch

        from cpu_vision_tpu.models.detection._utils import Matcher

        iou = np.full((3, 10), 0.05, np.float32)
        want = rdu.Matcher(0.7, 0.3, False)(torch.from_numpy(iou)).numpy()
        got = np.asarray(Matcher(0.7, 0.3, False)(jnp.asarray(iou)))
        np.testing.assert_array_equal(got, want)


class TestBoxCoderVsReference:
    def test_encode_decode_match(self, rdu, rng):
        import torch

        from cpu_vision_tpu.models.detection._utils import BoxCoder

        def boxes(n):
            x1 = rng.uniform(0, 40, n)
            y1 = rng.uniform(0, 40, n)
            return np.stack([x1, y1, x1 + rng.uniform(2, 20, n),
                             y1 + rng.uniform(2, 20, n)], 1).astype(np.float32)

        gt, pr = boxes(12), boxes(12)
        w = (1.0, 1.0, 1.0, 1.0)
        theirs = rdu.BoxCoder(w)
        want_enc = theirs.encode_single(torch.from_numpy(gt), torch.from_numpy(pr)).numpy()
        ours = BoxCoder(w)
        got_enc = np.asarray(ours.encode(jnp.asarray(gt), jnp.asarray(pr)))
        np.testing.assert_allclose(got_enc, want_enc, atol=1e-4)

        deltas = rng.normal(0, 1, (12, 4)).astype(np.float32)
        want_dec = theirs.decode_single(torch.from_numpy(deltas),
                                        torch.from_numpy(pr)).numpy()
        got_dec = np.asarray(ours.decode(jnp.asarray(deltas), jnp.asarray(pr)))
        np.testing.assert_allclose(got_dec, want_dec.reshape(got_dec.shape), atol=1e-3)

    def test_decode_clips_large_deltas(self, rdu, rng):
        import torch

        from cpu_vision_tpu.models.detection._utils import BoxCoder

        pr = np.array([[5.0, 5.0, 15.0, 20.0]], np.float32)
        deltas = np.array([[0.0, 0.0, 30.0, 30.0]], np.float32)  # explodes w/o clip
        theirs = rdu.BoxCoder((1.0, 1.0, 1.0, 1.0))
        want = theirs.decode_single(torch.from_numpy(deltas), torch.from_numpy(pr)).numpy()
        got = np.asarray(BoxCoder((1.0, 1.0, 1.0, 1.0)).decode(jnp.asarray(deltas), jnp.asarray(pr)))
        np.testing.assert_allclose(got, want.reshape(got.shape), rtol=1e-5)
