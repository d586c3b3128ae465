"""Color op parity vs the reference's tensor-kernel semantics (torch oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from cpu_vision_tpu import ops
from cpu_vision_tpu._dtype import to_dtype


def _img(rng, h, w, c, dtype=np.float32):
    if dtype == np.uint8:
        return rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return rng.random((h, w, c), dtype=np.float32)


def _chw(img):
    return torch.from_numpy(img.transpose(2, 0, 1))


def _hwc(t):
    return t.numpy().transpose(1, 2, 0)


class TestGrayscale:
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    def test_luma_weights(self, rng, dtype):
        img = _img(rng, 10, 10, 3, dtype)
        t = _chw(img)
        r, g, b = t.unbind(0)
        ref = (0.2989 * r + 0.587 * g + 0.114 * b).to(t.dtype).numpy()
        ours = np.asarray(ops.rgb_to_grayscale(jnp.asarray(img)))[:, :, 0]
        if dtype == np.uint8:
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_three_channel_output(self, rng):
        img = _img(rng, 6, 6, 3)
        out = ops.rgb_to_grayscale(jnp.asarray(img), num_output_channels=3)
        assert out.shape == (6, 6, 3)
        np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(out[..., 2]))


class TestHSV:
    def test_roundtrip(self, rng):
        img = jnp.asarray(_img(rng, 16, 16, 3))
        back = ops.hsv_to_rgb(ops.rgb_to_hsv(img))
        np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)

    def test_adjust_hue_matches_reference(self, rng):
        img = _img(rng, 12, 12, 3, np.uint8)
        # reference chain: convert to f32 scale, rgb2hsv, shift h, hsv2rgb
        t = _chw(img).float() / 255.0
        r, g, b = t.unbind(0)
        maxc, minc = t.max(0).values, t.min(0).values
        eqc = maxc == minc
        cr = maxc - minc
        ones = torch.ones_like(maxc)
        s = cr / torch.where(eqc, ones, maxc)
        cr_div = torch.where(eqc, ones, cr)
        rc, gc, bc = (maxc - r) / cr_div, (maxc - g) / cr_div, (maxc - b) / cr_div
        hr = (maxc == r) * (bc - gc)
        hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
        hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
        h = torch.fmod((hr + hg + hb) / 6.0 + 1.0, 1.0)
        h = (h + 0.25) % 1.0
        i = torch.floor(h * 6.0)
        f = h * 6.0 - i
        i = (i.to(torch.int32) % 6).long()
        p = (maxc * (1 - s)).clamp(0, 1)
        q = (maxc * (1 - s * f)).clamp(0, 1)
        tt = (maxc * (1 - s * (1 - f))).clamp(0, 1)
        a1 = torch.stack((maxc, q, p, p, tt, maxc))
        a2 = torch.stack((tt, maxc, maxc, q, p, p))
        a3 = torch.stack((p, p, tt, maxc, maxc, q))
        sel = torch.nn.functional.one_hot(i, 6).permute(2, 0, 1).float()
        rgb = torch.stack([(a1 * sel).sum(0), (a2 * sel).sum(0), (a3 * sel).sum(0)])
        # convert_image_dtype float->uint8: img * (256 - eps), truncating cast
        ref = (rgb * (256.0 - 1e-3)).to(torch.uint8).numpy().transpose(1, 2, 0)
        ours = np.asarray(ops.adjust_hue(jnp.asarray(img), 0.25))
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


class TestAdjust:
    @pytest.mark.parametrize("factor", [0.0, 0.5, 1.3])
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    def test_brightness(self, rng, factor, dtype):
        img = _img(rng, 9, 9, 3, dtype)
        bound = 255.0 if dtype == np.uint8 else 1.0
        ref = np.clip(factor * img.astype(np.float64), 0, bound)
        ours = np.asarray(ops.adjust_brightness(jnp.asarray(img), factor))
        if dtype == np.uint8:
            assert np.abs(ours.astype(int) - ref.round().astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-5)

    def test_contrast_float(self, rng):
        img = _img(rng, 9, 9, 3)
        gray = 0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        mean = gray.mean()
        ref = np.clip(0.7 * img + 0.3 * mean, 0, 1)
        ours = np.asarray(ops.adjust_contrast(jnp.asarray(img), 0.7))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_saturation_zero_is_gray(self, rng):
        img = _img(rng, 8, 8, 3)
        out = np.asarray(ops.adjust_saturation(jnp.asarray(img), 0.0))
        assert np.abs(out[..., 0] - out[..., 1]).max() < 1e-5

    def test_gamma(self, rng):
        img = _img(rng, 8, 8, 3)
        ref = np.clip(img**2.0, 0, 1)
        ours = np.asarray(ops.adjust_gamma(jnp.asarray(img), 2.0))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestPointOps:
    def test_invert(self, rng):
        img = _img(rng, 6, 6, 3, np.uint8)
        np.testing.assert_array_equal(np.asarray(ops.invert(jnp.asarray(img))), 255 - img)

    @pytest.mark.parametrize("bits", [1, 4, 7, 8])
    def test_posterize(self, rng, bits):
        img = _img(rng, 6, 6, 3, np.uint8)
        mask = np.uint8(256 - 2 ** (8 - bits)) if bits < 8 else np.uint8(255)
        np.testing.assert_array_equal(np.asarray(ops.posterize(jnp.asarray(img), bits)), img & mask)

    def test_solarize(self, rng):
        img = _img(rng, 6, 6, 3, np.uint8)
        ref = np.where(img >= 128, 255 - img, img)
        np.testing.assert_array_equal(np.asarray(ops.solarize(jnp.asarray(img), 128)), ref)

    def test_autocontrast_stretches(self, rng):
        img = (rng.integers(50, 200, (16, 16, 1))).astype(np.uint8)
        out = np.asarray(ops.autocontrast(jnp.asarray(img)))
        assert out.min() == 0 and out.max() == 255

    def test_equalize_matches_reference(self, rng):
        img = _img(rng, 16, 16, 3, np.uint8)
        # reference _scale_channel
        t = _chw(img)
        chans = []
        for c in range(3):
            chan = t[c]
            hist = torch.bincount(chan.reshape(-1), minlength=256)
            nonzero = hist[hist != 0]
            step = torch.div(nonzero[:-1].sum(), 255, rounding_mode="floor")
            if step == 0:
                chans.append(chan)
                continue
            lut = torch.div(torch.cumsum(hist, 0) + torch.div(step, 2, rounding_mode="floor"), step, rounding_mode="floor")
            lut = torch.nn.functional.pad(lut, [1, 0])[:-1].clamp(0, 255)
            chans.append(lut[chan.long()].to(torch.uint8))
        ref = torch.stack(chans).numpy().transpose(1, 2, 0)
        ours = np.asarray(ops.equalize(jnp.asarray(img)))
        np.testing.assert_array_equal(ours, ref)

    def test_normalize(self, rng):
        img = _img(rng, 8, 8, 3)
        out = np.asarray(ops.normalize(jnp.asarray(img), [0.5, 0.5, 0.5], [0.25, 0.25, 0.25]))
        np.testing.assert_allclose(out, (img - 0.5) / 0.25, atol=1e-5)

    def test_to_dtype_scale_rules(self):
        u8 = jnp.asarray(np.array([0, 128, 255], np.uint8).reshape(1, 3, 1))
        f = to_dtype(u8, jnp.float32, scale=True)
        np.testing.assert_allclose(np.asarray(f).ravel(), [0, 128 / 255, 1.0], atol=1e-6)
        back = to_dtype(f, jnp.uint8, scale=True)
        np.testing.assert_array_equal(np.asarray(back).ravel(), [0, 128, 255])
