"""Typed transform API: dispatch, consistency of image/bbox/mask geometry,
class transforms, containers, autoaugment, mixup/cutmix."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import transforms as T
from cpu_vision_tpu.transforms import functional as F
from cpu_vision_tpu.tv_arrays import BoundingBoxes, Image, Mask, Video


def _sample(rng, h=32, w=48):
    img = Image(jnp.asarray(rng.random((h, w, 3), dtype=np.float32)))
    boxes = BoundingBoxes(
        jnp.asarray([[4.0, 6.0, 20.0, 18.0], [10.0, 10.0, 40.0, 30.0]]),
        "xyxy",
        (h, w),
    )
    mask = np.zeros((h, w), np.int32)
    mask[6:18, 4:20] = 1
    return {"image": img, "boxes": boxes, "mask": Mask(jnp.asarray(mask))}


class TestDispatch:
    def test_plain_array_is_image(self, rng):
        img = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
        out = F.horizontal_flip(img)
        assert isinstance(out, jax.Array)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img)[:, ::-1])

    def test_bbox_passthrough_for_color(self, rng):
        s = _sample(rng)
        out = F.adjust_brightness(s["boxes"], 2.0)
        assert out is s["boxes"]

    def test_video_folds_time(self, rng):
        v = Video(jnp.asarray(rng.random((2, 4, 8, 8, 3), dtype=np.float32)))
        out = F.resize(v, (4, 4))
        assert isinstance(out, Video) and out.shape == (2, 4, 4, 4, 3)


class TestGeometryConsistency:
    """Flip/resize/crop must move boxes and masks with the image."""

    def test_hflip_box_tracks_mask(self, rng):
        s = _sample(rng)
        img = F.horizontal_flip(s["image"])
        boxes = F.horizontal_flip(s["boxes"])
        mask = F.horizontal_flip(s["mask"])
        mb = np.asarray(__import__("cpu_vision_tpu").ops.masks_to_boxes(np.asarray(mask.data)[None]))[0]
        b0 = np.asarray(boxes.data)[0]
        np.testing.assert_allclose(mb[0], b0[0] - 0, atol=1.0)  # x1
        np.testing.assert_allclose(mb[2], b0[2] - 1, atol=1.0)  # x2 (mask is inclusive)

    def test_resize_scales_boxes(self, rng):
        s = _sample(rng)
        out = F.resize(s["boxes"], (16, 24))  # half size
        np.testing.assert_allclose(np.asarray(out.data), np.asarray(s["boxes"].data) * 0.5, atol=1e-5)
        assert out.canvas_size == (16, 24)

    def test_crop_shifts_boxes(self, rng):
        s = _sample(rng)
        out = F.crop(s["boxes"], 5, 3, 20, 30)
        np.testing.assert_allclose(
            np.asarray(out.data)[0], [4 - 3, 6 - 5, 20 - 3, 18 - 5], atol=1e-5
        )
        assert out.canvas_size == (20, 30)

    def test_pad_shifts_boxes(self, rng):
        s = _sample(rng)
        out = F.pad(s["boxes"], [2, 3, 4, 5])  # l,t,r,b
        np.testing.assert_allclose(np.asarray(out.data)[0], [6, 9, 22, 21], atol=1e-5)
        assert out.canvas_size == (32 + 3 + 5, 48 + 2 + 4)

    def test_affine_identity_preserves_boxes(self, rng):
        s = _sample(rng)
        out = F.affine(s["boxes"], angle=0.0)
        np.testing.assert_allclose(np.asarray(out.data), np.asarray(s["boxes"].data), atol=1e-3)

    def test_rotate90_box(self, rng):
        # square canvas so a 90° rotation maps onto itself
        b = BoundingBoxes(jnp.asarray([[10.0, 20.0, 30.0, 25.0]]), "xyxy", (100, 100))
        out = F.rotate(b, 90.0)
        x1, y1, x2, y2 = np.asarray(out.data)[0]
        # rotating CCW by 90: (x,y) -> (y, W-x)
        np.testing.assert_allclose([x1, y1, x2, y2], [20, 70, 25, 90], atol=0.6)

    def test_mask_geometry_stays_binary(self, rng):
        s = _sample(rng)
        out = F.rotate(s["mask"], 33.0)
        vals = set(np.unique(np.asarray(out.data)))
        assert vals.issubset({0, 1})

    def test_transform_walks_dict(self, rng):
        s = _sample(rng)
        t = T.RandomHorizontalFlip(p=1.0)
        out = t(s, key=jax.random.PRNGKey(0))
        assert set(out.keys()) == {"image", "boxes", "mask"}
        np.testing.assert_allclose(
            np.asarray(out["image"].data), np.asarray(s["image"].data)[:, ::-1], atol=1e-6
        )
        assert isinstance(out["boxes"], BoundingBoxes)


class TestClassTransforms:
    def test_compose_key_split(self, rng):
        s = _sample(rng)
        t = T.Compose([T.RandomHorizontalFlip(0.5), T.Resize((16, 16)), T.CenterCrop(8)])
        out = t(s, key=jax.random.PRNGKey(1))
        assert out["image"].shape == (8, 8, 3)
        assert out["boxes"].canvas_size == (8, 8)

    def test_random_transform_requires_key(self, rng):
        s = _sample(rng)
        with pytest.raises(ValueError, match="PRNG key"):
            T.RandomHorizontalFlip()(s)

    def test_random_resized_crop(self, rng):
        s = _sample(rng)
        t = T.RandomResizedCrop(20)
        out = t(s, key=jax.random.PRNGKey(2))
        assert out["image"].shape == (20, 20, 3)
        assert out["mask"].shape == (20, 20)

    def test_color_jitter(self, rng):
        img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
        t = T.ColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1)
        out = t(img, key=jax.random.PRNGKey(3))
        assert out.shape == img.shape
        assert not np.allclose(np.asarray(out), np.asarray(img))

    def test_normalize_and_todtype(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
        t = T.Compose([T.ToDtype(jnp.float32, scale=True), T.Normalize([0.5] * 3, [0.5] * 3)])
        out = t(img)
        assert out.dtype == jnp.float32
        assert -1.01 <= float(out.min()) and float(out.max()) <= 1.01

    def test_sanitize_bounding_boxes(self):
        b = BoundingBoxes(
            jnp.asarray([[0.0, 0, 10, 10], [5.0, 5, 5.5, 5.2], [-10.0, -10, -1, -1]]),
            "xyxy",
            (20, 20),
        )
        out = T.SanitizeBoundingBoxes()(b)
        arr = np.asarray(out.data)
        np.testing.assert_allclose(arr[1], 0.0)
        np.testing.assert_allclose(arr[2], 0.0)
        assert arr[0].sum() > 0

    def test_random_erasing(self, rng):
        img = jnp.ones((16, 16, 3), jnp.float32)
        t = T.RandomErasing(p=1.0, value=0.0)
        out = np.asarray(t(img, key=jax.random.PRNGKey(4)))
        assert (out == 0).any()

    def test_five_ten_crop(self, rng):
        img = jnp.asarray(rng.random((20, 20, 3), dtype=np.float32))
        five = T.FiveCrop(8)(img)
        assert len(five) == 5 and all(c.shape == (8, 8, 3) for c in five)
        ten = T.TenCrop(8)(img)
        assert len(ten) == 10


class TestAutoAugment:
    @pytest.mark.parametrize("cls", [T.AutoAugment, T.RandAugment, T.TrivialAugmentWide])
    def test_runs_uint8(self, rng, cls):
        img = jnp.asarray(rng.integers(0, 256, (24, 24, 3)).astype(np.uint8))
        t = cls()
        for seed in range(4):
            out = t(img, key=jax.random.PRNGKey(seed))
            assert out.shape == img.shape and out.dtype == jnp.uint8

    def test_augmix(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (24, 24, 3)).astype(np.uint8))
        out = T.AugMix()(img, key=jax.random.PRNGKey(0))
        assert out.shape == img.shape and out.dtype == jnp.uint8

    def test_policies(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (24, 24, 3)).astype(np.uint8))
        for policy in ("imagenet", "cifar10", "svhn"):
            out = T.AutoAugment(policy)(img, key=jax.random.PRNGKey(1))
            assert out.shape == img.shape


class TestBatchAugment:
    def test_mixup(self, rng):
        imgs = jnp.asarray(rng.random((4, 8, 8, 3), dtype=np.float32))
        labels = jnp.asarray([0, 1, 2, 3])
        mixed, ml = T.MixUp(alpha=1.0, num_classes=4)(imgs, labels, key=jax.random.PRNGKey(0))
        assert mixed.shape == imgs.shape and ml.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(ml.sum(axis=1)), 1.0, atol=1e-5)

    def test_cutmix(self, rng):
        imgs = jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32))
        labels = jnp.asarray([0, 1, 2, 3])
        mixed, ml = T.CutMix(alpha=1.0, num_classes=4)(imgs, labels, key=jax.random.PRNGKey(1))
        assert mixed.shape == imgs.shape
        np.testing.assert_allclose(np.asarray(ml.sum(axis=1)), 1.0, atol=1e-5)

    def test_containers(self, rng):
        img = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
        t = T.RandomApply([T.GaussianBlur(3)], p=1.0)
        out = t(img, key=jax.random.PRNGKey(0))
        assert out.shape == img.shape
        t2 = T.RandomChoice([T.Identity(), T.Identity()])
        out2 = t2(img, key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(img))
        t3 = T.RandomOrder([T.Identity(), T.GaussianBlur(3)])
        assert t3(img, key=jax.random.PRNGKey(2)).shape == img.shape
