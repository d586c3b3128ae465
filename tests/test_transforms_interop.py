"""Legacy/interop v2 transforms (reference ``transforms/v2/_deprecated.py``,
``_temporal.py``, ``_misc.py:LinearTransformation``, ``_color.py:RGB``) +
v2 class-namespace parity with the reference."""

import os
import re

import numpy as np
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import transforms as T


class TestNamespaceParity:
    def test_all_v2_classes_present(self):
        src = open("/root/reference/torchvision/transforms/v2/__init__.py").read()
        names = set()
        for m in re.finditer(r"from \.[\w.]* import (.+?)(?=\nfrom|\nimport|\Z)",
                             src, re.S):
            chunk = m.group(1).replace("(", " ").replace(")", " ")
            names.update(t for t in re.split(r"[,\s]+", chunk)
                         if t and t[0].isupper())
        assert sorted(n for n in names if not hasattr(T, n)) == []

    def test_v2_submodule_alias(self):
        """``from <pkg>.transforms import v2`` drop-in import parity
        (reference ``torchvision/transforms/v2/__init__.py``)."""
        from cpu_vision_tpu.transforms import v2
        import cpu_vision_tpu.transforms.v2.functional as v2F

        assert v2.Resize is T.Resize
        assert v2.Compose is T.Compose
        assert v2.InterpolationMode is T.InterpolationMode
        assert v2F is T.functional
        # every flat-namespace class is reachable through v2 too
        src = open("/root/reference/torchvision/transforms/v2/__init__.py").read()
        names = set()
        for m in re.finditer(r"from \.[\w.]* import (.+?)(?=\nfrom|\nimport|\Z)",
                             src, re.S):
            chunk = m.group(1).replace("(", " ").replace(")", " ")
            names.update(t for t in re.split(r"[,\s]+", chunk)
                         if t and t[0].isupper())
        assert sorted(n for n in names if not hasattr(v2, n)) == []

    def test_v1_class_namespace_closure(self):
        """Every public v1 transform class name resolves (reference
        ``torchvision/transforms/transforms.py`` __all__)."""
        src = open("/root/reference/torchvision/transforms/transforms.py").read()
        m = re.search(r"__all__ = \[(.*?)\]", src, re.S)
        names = re.findall(r'"(\w+)"', m.group(1))
        missing = [n for n in names if not hasattr(T, n)]
        assert missing == [], missing


class TestInterop:
    @pytest.fixture()
    def img_u8(self, rng):
        return jnp.asarray((rng.random((8, 8, 3)) * 255).astype(np.uint8))

    def test_convert_image_dtype(self, img_u8):
        out = T.ConvertImageDtype(jnp.float32)(img_u8)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(img_u8) / 255.0,
                                   atol=1e-6)

    def test_pil_roundtrip(self, img_u8):
        from PIL import Image as PILImage

        pil = T.ToPILImage()(img_u8)
        assert isinstance(pil, PILImage.Image)
        back = T.PILToTensor()(pil)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img_u8))
        scaled = T.ToTensor()(pil)
        assert scaled.dtype == jnp.float32 and float(scaled.max()) <= 1.0

    def test_to_pil_from_float(self, rng):
        from PIL import Image as PILImage

        f = jnp.asarray(rng.random((6, 6, 3), dtype=np.float32))
        pil = T.ToPILImage()(f)
        assert isinstance(pil, PILImage.Image) and pil.size == (6, 6)

    def test_rgb(self):
        g = jnp.ones((8, 8, 1), jnp.uint8) * 7
        out = T.RGB()(g)
        assert out.shape == (8, 8, 3)
        np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(out[..., 2]))
        c3 = jnp.ones((8, 8, 3), jnp.uint8)
        assert T.RGB()(c3) is c3

    def test_uniform_temporal_subsample(self):
        v = jnp.arange(10)[:, None, None, None] * jnp.ones((1, 2, 2, 3))
        out = T.UniformTemporalSubsample(5)(v)
        # reference picks evenly spaced indices incl. endpoints
        np.testing.assert_array_equal(np.asarray(out[:, 0, 0, 0]),
                                      [0.0, 2.0, 4.0, 7.0, 9.0])

    def test_linear_transformation(self, rng):
        x = jnp.asarray(rng.random((4, 4, 3), dtype=np.float32))
        d = 4 * 4 * 3
        # identity whitening is a no-op
        lt = T.LinearTransformation(np.eye(d, dtype=np.float32),
                                    np.zeros(d, np.float32))
        np.testing.assert_allclose(np.asarray(lt(x)), np.asarray(x), rtol=1e-6)
        # mean subtraction shifts
        lt2 = T.LinearTransformation(np.eye(d, dtype=np.float32),
                                     np.full(d, 0.5, np.float32))
        np.testing.assert_allclose(np.asarray(lt2(x)), np.asarray(x) - 0.5,
                                   atol=1e-6)
        with pytest.raises(ValueError):
            T.LinearTransformation(np.eye(3), np.zeros(2))
        with pytest.raises(ValueError):
            lt(jnp.ones((2, 2, 3)))

    def test_to_pure_tensor_alias(self):
        assert T.ToPureTensor is T.ToPureArray


class TestPackageSurface:
    def test_backend_selectors(self):
        import cpu_vision_tpu as cvt

        assert cvt.get_image_backend() in ("native", "PIL")
        with pytest.raises(ValueError):
            cvt.set_image_backend("nope")
        with pytest.raises(RuntimeError):
            cvt.set_video_backend("pyav")
        assert cvt.get_video_backend() == "mjpeg"
        cvt.disable_beta_transforms_warning()

    def test_is_tracing(self):
        import jax
        import cpu_vision_tpu as cvt

        assert cvt._is_tracing() is False
        seen = []
        jax.jit(lambda x: (seen.append(cvt._is_tracing()), x)[1])(jnp.ones(()))
        assert seen == [True]

    def test_interpolation_mode(self):
        assert T.InterpolationMode.BILINEAR == "bilinear"
        assert T.InterpolationMode.NEAREST == "nearest"

    def test_tv_tensor_names(self):
        import cpu_vision_tpu.tv_arrays as tv

        assert tv.TVTensor is tv.TVArray
        assert tv.BoundingBoxFormat.CXCYWH == "cxcywh"
        with pytest.raises(ValueError):
            tv.set_return_type("bogus")
        tv.set_return_type("Tensor")


def test_tv_tensors_alias_module():
    """`from cpu_vision_tpu import tv_tensors` mirrors the reference import
    path (reference tv_tensors/__init__.py)."""
    from cpu_vision_tpu import tv_arrays, tv_tensors

    for name in ("Image", "Video", "Mask", "BoundingBoxes", "wrap",
                 "BoundingBoxFormat", "TVTensor", "set_return_type"):
        assert getattr(tv_tensors, name) is getattr(tv_arrays, name)
