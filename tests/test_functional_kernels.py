"""Reference per-type kernel names + remaining v2 functionals
(``transforms/v2/functional/__init__.py`` export parity and behavior)."""

import re

import numpy as np
import jax.numpy as jnp
import pytest

import cpu_vision_tpu.transforms.functional as F
from cpu_vision_tpu.tv_arrays import BoundingBoxes, Mask, Video


class TestNamespaceParity:
    def test_every_reference_functional_name_present(self):
        src = open(
            "/root/reference/torchvision/transforms/v2/functional/__init__.py").read()
        src = re.sub(r"#.*", "", src)
        names = set()
        for m in re.finditer(r"from \.[\w.]* import (.+?)(?=\nfrom|\nimport|\Z)",
                             src, re.S):
            chunk = m.group(1).replace("(", " ").replace(")", " ")
            names.update(t.strip() for t in re.split(r"[,\s]+", chunk)
                         if t.strip().isidentifier())
        assert sorted(n for n in names if not hasattr(F, n)) == []


class TestPerTypeKernels:
    @pytest.fixture()
    def img(self, rng):
        return jnp.asarray(rng.random((16, 20, 3), dtype=np.float32))

    def test_image_alias_matches_dispatch(self, img):
        np.testing.assert_array_equal(
            np.asarray(F.resize_image(img, (8, 10))),
            np.asarray(F.resize(img, (8, 10))))

    def test_bbox_kernel_returns_tuple_for_geometry(self):
        bb = jnp.asarray([[2.0, 2.0, 10.0, 12.0]])
        data, canvas = F.resize_bounding_boxes(bb, "xyxy", (16, 20), (8, 10))
        assert canvas == (8, 10)
        np.testing.assert_allclose(np.asarray(data), [[1.0, 1.0, 5.0, 6.0]])

    def test_bbox_kernel_tensor_only_for_flips(self):
        bb = jnp.asarray([[2.0, 2.0, 10.0, 12.0]])
        out = F.horizontal_flip_bounding_boxes(bb, "xyxy", (16, 20))
        np.testing.assert_allclose(np.asarray(out), [[10.0, 2.0, 18.0, 12.0]])

    def test_mask_kernel_nearest_semantics(self):
        m = jnp.zeros((16, 20), jnp.int32).at[:, 10:].set(3)
        out = F.resize_mask(m, (8, 10))
        assert out.shape == (8, 10)
        assert set(np.unique(np.asarray(out))) <= {0, 3}  # nearest: no blends

    def test_elastic_bounding_boxes_zero_displacement_identity(self):
        bb = jnp.asarray([[2.0, 2.0, 10.0, 12.0]])
        out = F.elastic_bounding_boxes(bb, "xyxy", (16, 20),
                                       jnp.zeros((1, 16, 20, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(bb), atol=1e-5)

    def test_elastic_bounding_boxes_constant_shift(self):
        # displacement of +2px in x (normalised: 2 * 2/w) moves the sampled
        # source left, so boxes shift left by ~2
        bb = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
        disp = jnp.zeros((1, 16, 20, 2)).at[..., 0].set(2 * 2.0 / 20)
        out = np.asarray(F.elastic_bounding_boxes(bb, "xyxy", (16, 20), disp))
        np.testing.assert_allclose(out, [[2.0, 4.0, 10.0, 12.0]], atol=1e-4)


class TestRemainingFunctionals:
    @pytest.fixture()
    def img(self, rng):
        return jnp.asarray(rng.random((16, 20, 3), dtype=np.float32))

    def test_five_and_ten_crop(self, img):
        fc = F.five_crop(img, 8)
        assert len(fc) == 5 and all(c.shape == (8, 8, 3) for c in fc)
        np.testing.assert_array_equal(np.asarray(fc[0]),
                                      np.asarray(img[:8, :8]))
        tc = F.ten_crop(img, (8, 8))
        assert len(tc) == 10
        np.testing.assert_array_equal(
            np.asarray(tc[5]), np.asarray(F.hflip(img)[:8, :8]))
        with pytest.raises(ValueError):
            F.five_crop(img, 32)

    def test_meta_getters(self, img):
        assert F.get_dimensions(img) == [3, 16, 20]
        assert F.get_image_size(img) == [20, 16]
        assert F.get_num_channels(img) == 3
        assert F.get_image_num_channels(img) == 3
        v = jnp.zeros((7, 4, 4, 3))
        assert F.get_num_frames(v) == 7 and F.get_num_frames_video(v) == 7
        assert F.get_size_bounding_boxes(None, "xyxy", (16, 20)) == [16, 20]

    def test_is_pure_tensor(self, img):
        assert F.is_pure_tensor(img)
        assert not F.is_pure_tensor(Video(jnp.zeros((2, 4, 4, 3))))
        assert not F.is_pure_tensor([1, 2])

    def test_permute_channels(self, img):
        out = F.permute_channels(img, [2, 0, 1])
        np.testing.assert_array_equal(np.asarray(out[..., 1]),
                                      np.asarray(img[..., 0]))

    def test_grayscale_to_rgb(self):
        g = jnp.full((4, 4, 1), 0.5)
        out = F.grayscale_to_rgb(g)
        assert out.shape == (4, 4, 3)
        rgb = jnp.ones((4, 4, 3))
        np.testing.assert_array_equal(np.asarray(F.grayscale_to_rgb(rgb)),
                                      np.asarray(rgb))

    def test_uniform_temporal_subsample(self):
        v = jnp.arange(10.0)[:, None, None, None] * jnp.ones((1, 2, 2, 3))
        out = F.uniform_temporal_subsample(v, 5)
        np.testing.assert_array_equal(np.asarray(out[:, 0, 0, 0]),
                                      [0, 2, 4, 7, 9])

    def test_jpeg_roundtrip(self, rng):
        u8 = jnp.asarray((rng.random((16, 16, 3)) * 50 + 100).astype(np.uint8))
        out = F.jpeg(u8, 90)
        assert out.shape == u8.shape and out.dtype == jnp.uint8
        with pytest.raises(TypeError):
            F.jpeg(u8.astype(jnp.float32), 90)

    def test_sanitize_bounding_boxes(self):
        boxes = jnp.asarray([[2.0, 2.0, 10.0, 12.0], [5.0, 5.0, 5.0, 5.0]])
        out, ok = F.sanitize_bounding_boxes(boxes, "xyxy", (16, 20))
        np.testing.assert_array_equal(np.asarray(ok), [True, False])
        np.testing.assert_array_equal(np.asarray(out.data[1]), [0, 0, 0, 0])

    def test_to_grayscale_and_pil(self, img):
        g = F.to_grayscale(img)
        assert g.shape == (16, 20, 1)
        from PIL import Image as PILImage

        assert isinstance(F.to_pil_image(img), PILImage.Image)


class TestToDtypeMask:
    def test_mask_dtype_converts_without_scaling(self):
        from cpu_vision_tpu.tv_arrays import Mask

        m = Mask(jnp.asarray([[1.0, 2.0], [3.0, 0.0]], jnp.float32))
        out = F.to_dtype(m, jnp.uint8)
        assert isinstance(out, Mask) and out.data.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(out.data), [[1, 2], [3, 0]])

    def test_dict_todtype_converts_mask(self):
        from cpu_vision_tpu import transforms as T
        from cpu_vision_tpu.tv_arrays import Image, Mask

        t = T.ToDtype({Image: jnp.float32, Mask: jnp.int32})
        sample = {"image": Image(jnp.zeros((4, 4, 3), jnp.uint8)),
                  "mask": Mask(jnp.ones((4, 4), jnp.uint8))}
        out = t(sample)
        assert out["image"].data.dtype == jnp.float32
        assert out["mask"].data.dtype == jnp.int32
