"""StableHLO export (counterpart of the reference's ONNX glue,
``ops/_register_onnx_ops.py`` + ``torch.onnx``)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import export, models


class TestExport:
    @pytest.fixture(scope="class")
    def exported(self):
        m = models.get_model("squeezenet1_0", num_classes=10)
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v, x, export.export_model(m, v, x)

    def test_stablehlo_contains_convs(self, exported):
        _, _, _, e = exported
        txt = export.stablehlo_text(e)
        assert "stablehlo" in txt and "convolution" in txt

    def test_serialize_roundtrip_exact(self, exported, tmp_path):
        m, v, x, e = exported
        p = str(tmp_path / "model.stablehlo")
        export.save(e, p)
        assert os.path.getsize(p) > 1000
        e2 = export.load_exported(p)
        out = export.call_exported(e2, v, x)
        ref = m.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_exif_option(self, rng):
        # piggyback: exif orientation decode option (reference decode_jpeg
        # apply_exif_orientation) — oracle is PIL's exif_transpose
        import io as _io

        from PIL import Image as PILImage, ImageOps

        from cpu_vision_tpu.io import decode_jpeg

        arr = np.zeros((20, 40, 3), np.uint8)
        arr[:10, :, 0] = 255
        for orientation in (1, 2, 3, 4, 5, 6, 7, 8):
            exif = PILImage.Exif()
            exif[0x0112] = orientation
            buf = _io.BytesIO()
            PILImage.fromarray(arr).save(buf, "JPEG", exif=exif, quality=95)
            ours = decode_jpeg(buf.getvalue(), apply_exif_orientation=True)
            oracle = np.asarray(ImageOps.exif_transpose(
                PILImage.open(_io.BytesIO(buf.getvalue()))))
            assert ours.shape == oracle.shape, orientation
            assert np.abs(ours.astype(int) - oracle.astype(int)).max() <= 2, orientation
