"""Fused Pallas stencil kernels vs their XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import ops
from cpu_vision_tpu.ops.pallas import (
    canny_stage1,
    fused_blur_sobel,
    fused_canny,
    harris_response_fused,
)


def _img(rng, h, w):
    return rng.random((h, w), dtype=np.float32)


class TestFusedBlurSobel:
    @pytest.mark.parametrize("shape", [(64, 96), (72, 130), (33, 257)])
    def test_matches_xla(self, rng, shape):
        img = _img(rng, *shape)
        ref = np.asarray(ops.sobel(ops.gaussian_blur(jnp.asarray(img), 5, 1.5)))
        out = np.asarray(fused_blur_sobel(jnp.asarray(img), 5, 1.5, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_batched_rgb(self, rng):
        imgs = rng.random((2, 40, 48, 3), dtype=np.float32)
        ref = np.asarray(ops.sobel(ops.gaussian_blur(jnp.asarray(imgs), 5, 1.5)))
        out = np.asarray(fused_blur_sobel(jnp.asarray(imgs), 5, 1.5, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_kernel7(self, rng):
        img = _img(rng, 48, 64)
        ref = np.asarray(ops.sobel(ops.gaussian_blur(jnp.asarray(img), 7, 2.0)))
        out = np.asarray(fused_blur_sobel(jnp.asarray(img), 7, 2.0, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestFusedCanny:
    def test_matches_xla_on_shapes(self, rng):
        # An axis-aligned step edge has analytically TIED magnitudes on the
        # two columns flanking the edge; 1-ULP noise decides which survives
        # NMS, so binary equality can differ at tie pixels.  Require the
        # mismatch to be confined to that (<1% of pixels) and edge counts to
        # agree.
        img = np.full((64, 80), 0.1, np.float32)
        img[20:44, 24:60] = 0.9
        ref = np.asarray(ops.canny(jnp.asarray(img), 0.1, 0.3, backend="xla"))
        out = np.asarray(fused_canny(jnp.asarray(img), 0.1, 0.3, interpret=True))
        mismatch = ref != out
        assert mismatch.mean() < 0.02, f"mismatch fraction {mismatch.mean()}"
        # every mismatch must be adjacent to a reference edge (the flipped
        # side of a tied pair), never a spurious edge in flat regions
        ref_dil = np.zeros_like(ref, bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ref_dil |= np.roll(np.roll(ref > 0, dy, 0), dx, 1)
        assert (mismatch <= ref_dil).all(), "mismatch away from reference edges"
        assert abs(ref.sum() - out.sum()) / max(ref.sum(), 1) < 0.05

    def test_matches_xla_on_noise(self, rng):
        img = _img(rng, 56, 72)
        ref = np.asarray(ops.canny(jnp.asarray(img), 0.3, 0.6, backend="xla"))
        out = np.asarray(fused_canny(jnp.asarray(img), 0.3, 0.6, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_stage1_classes(self, rng):
        maps = jnp.asarray(_img(rng, 40, 40))[None]
        cls = np.asarray(canny_stage1(maps, 0.2, 0.5, interpret=True))
        assert cls.dtype == np.uint8
        assert set(np.unique(cls)).issubset({0, 1, 2})


class TestFusedHarris:
    @pytest.mark.parametrize("shape", [(64, 96), (50, 70)])
    def test_matches_xla(self, rng, shape):
        img = _img(rng, *shape)
        ref = np.asarray(ops.harris_response(jnp.asarray(img)))
        out = np.asarray(harris_response_fused(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestInTileHysteresis:
    def test_option_matches_xla_exactly(self, rng):
        # correct but slower on v5e (see stencil.py note); verify the option
        img = rng.random((1, 96, 120), dtype=np.float32)
        from cpu_vision_tpu.ops.edges import hysteresis

        cls = canny_stage1(jnp.asarray(img), 0.3, 0.6, interpret=True, in_tile_hysteresis=True)
        edges = hysteresis(np.asarray(cls) == 2, np.asarray(cls) >= 1)
        ref = np.asarray(ops.canny(jnp.asarray(img)[..., None], 0.3, 0.6, backend="xla"))[..., 0]
        np.testing.assert_array_equal(np.asarray(edges).astype(np.float32), ref)


class TestHaloStencilRowFused:
    """The row-fused halo path (`_halo_stencil_call_rowfused`) must be
    bit-identical to the reflect-pad oracle on every tile class: first /
    middle / last, divisible and non-divisible heights, and the shapes
    where a middle tile *would* clamp (routed back to the slow path)."""

    @staticmethod
    def _run(img, halo, tile_h):
        from cpu_vision_tpu.ops.pallas.stencil import _halo_stencil_call

        k = 2 * halo + 1

        def compute(tile, th_eff, ti=0):
            w_out = tile.shape[1] - 2 * halo
            acc = jnp.zeros((th_eff, w_out), tile.dtype)
            for dr in range(k):
                for dc in range(k):
                    acc = acc + tile[dr:dr + th_eff, dc:dc + w_out]
            return (acc,)

        (out,) = _halo_stencil_call(
            jnp.asarray(img)[None], halo, compute, [jnp.float32],
            tile_h=tile_h, interpret=True)
        return np.asarray(out)[0]

    def _oracle(self, img, halo):
        k = 2 * halo + 1
        h, w = img.shape
        p = np.pad(img, ((halo, halo), (halo, halo)), mode="reflect")
        out = np.zeros_like(img)
        for dr in range(k):
            for dc in range(k):
                out = out + p[dr:dr + h, dc:dc + w]
        return out

    @pytest.mark.parametrize(
        "h,w,halo,tile_h",
        [
            (96, 130, 1, 32),    # divisible: first/mid/last tiles
            (104, 64, 2, 32),    # non-divisible height, h % 8 == 0
            (96, 40, 7, 32),     # max fusable halo
            (100, 64, 1, 32),    # h % 8 != 0 -> slow path (parity anyway)
            (1024, 48, 7, 256),  # deep mid tiles, halo 7
        ],
    )
    def test_matches_reflect_pad_oracle(self, rng, h, w, halo, tile_h):
        img = rng.random((h, w), dtype=np.float32)
        np.testing.assert_allclose(
            self._run(img, halo, tile_h), self._oracle(img, halo),
            rtol=1e-6, atol=1e-5)

    def test_mid_tile_clamp_shape(self, rng):
        # h=520, th=256, halo=7: the middle tile's desired slab start
        # (248) exceeds h - slab (240); the gate must route this to the
        # slow path -- pre-fix the fast path read the wrong rows here.
        img = rng.random((520, 64), dtype=np.float32)
        np.testing.assert_allclose(
            self._run(img, 7, 256), self._oracle(img, 7),
            rtol=1e-6, atol=1e-5)


class TestHysteresisSweeps:
    def test_fixpoint_matches_xla_oracle(self, rng):
        from cpu_vision_tpu.ops import edges
        from cpu_vision_tpu.ops.pallas.stencil import canny_stage1, hysteresis_sweeps

        img = rng.random((2, 96, 160), dtype=np.float32)
        cls = canny_stage1(jnp.asarray(img), 0.1, 0.2, 5, 1.4, interpret=True)
        oracle = edges.hysteresis(cls == 2, cls >= 1)
        c = cls.astype(jnp.float32)
        for _ in range(50):
            n = hysteresis_sweeps(c, 4, interpret=True)
            if bool(jnp.all(n == c)):
                break
            c = n
        assert bool(jnp.all((c == 2.0) == oracle))

    def test_odd_shape_fallback_path(self, rng):
        from cpu_vision_tpu.ops import edges
        from cpu_vision_tpu.ops.pallas.stencil import canny_stage1, hysteresis_sweeps

        img = rng.random((1, 67, 131), dtype=np.float32)
        cls = canny_stage1(jnp.asarray(img), 0.08, 0.15, 5, 1.4, interpret=True)
        c = cls.astype(jnp.float32)
        for _ in range(80):
            n = hysteresis_sweeps(c, 3, interpret=True)
            if bool(jnp.all(n == c)):
                break
            c = n
        assert bool(jnp.all((c == 2.0) == edges.hysteresis(cls == 2, cls >= 1)))
