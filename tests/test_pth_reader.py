"""Byte-level ``.pth`` ingestion (VERDICT.md round-2 item 8): the torch-free
zip-format reader (``models/pth.py``) against live ``torch.save`` output, a
committed on-disk fixture, and the full bytes-on-disk → converter → flax →
logits-match pipeline (counterpart of the reference's
``WeightsEnum.get_state_dict``, ``models/_api.py:89``)."""

import os
import pickle

import numpy as np
import pytest
import torch

from cpu_vision_tpu.models.pth import load_pth_state_dict

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class TestDtypeMatrix:
    def test_all_dtypes_and_strides_exact(self, tmp_path):
        sd = {
            "f32": torch.randn(8, 3, 3, 3),
            "transposed": torch.randn(10, 8).t(),       # non-contiguous
            "f64": torch.randn(8, dtype=torch.float64),
            "f16": torch.randn(4, 4, dtype=torch.float16),
            "bf16": torch.randn(4, 4, dtype=torch.bfloat16),
            "i64_scalar": torch.tensor(123, dtype=torch.int64),
            "i32": torch.arange(6, dtype=torch.int32),
            "bool": torch.tensor([True, False, True]),
            "u8_strided": torch.arange(6, dtype=torch.uint8).reshape(2, 3)[:, 1:],
        }
        p = str(tmp_path / "m.pth")
        torch.save(sd, p)
        out = load_pth_state_dict(p)
        assert set(out) == set(sd)
        for k, v in sd.items():
            want = (v.float() if v.dtype == torch.bfloat16 else v).numpy()
            got = out[k]
            if str(got.dtype) == "bfloat16":
                got = got.astype(np.float32)
            np.testing.assert_array_equal(np.asarray(got, np.float64),
                                          np.asarray(want, np.float64), err_msg=k)

    def test_nested_trainer_checkpoint(self, tmp_path):
        m = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 3), torch.nn.BatchNorm2d(4))
        p = str(tmp_path / "ckpt.pth")
        torch.save({"model": m.state_dict(), "epoch": 7, "lr": 0.1}, p)
        ck = load_pth_state_dict(p)
        assert ck["epoch"] == 7 and ck["lr"] == 0.1
        np.testing.assert_array_equal(ck["model"]["0.weight"],
                                      m.state_dict()["0.weight"].numpy())

    def test_bytes_input(self, tmp_path):
        p = str(tmp_path / "m.pth")
        torch.save({"x": torch.ones(3)}, p)
        with open(p, "rb") as f:
            out = load_pth_state_dict(f.read())
        np.testing.assert_array_equal(out["x"], np.ones(3, np.float32))


class TestSafety:
    def test_malicious_global_rejected(self, tmp_path):
        """An arbitrary-code pickle inside the zip must raise, not execute."""
        import zipfile

        class Evil:
            def __reduce__(self):
                return (os.system, ("echo pwned",))

        p = str(tmp_path / "evil.pth")
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("archive/data.pkl", pickle.dumps({"w": Evil()}))
        with pytest.raises(pickle.UnpicklingError, match="not allowed"):
            load_pth_state_dict(p)

    def test_legacy_format_clear_error(self, tmp_path):
        p = str(tmp_path / "legacy.pth")
        torch.save({"x": torch.ones(2)}, p, _use_new_zipfile_serialization=False)
        with pytest.raises(RuntimeError, match="legacy"):
            load_pth_state_dict(p)

    def test_not_a_pth(self, tmp_path):
        p = str(tmp_path / "junk.pth")
        with open(p, "wb") as f:
            f.write(b"JUNKJUNKJUNK")
        with pytest.raises(RuntimeError, match="zip magic"):
            load_pth_state_dict(p)


class TestCommittedFixture:
    """A .pth serialized by torch 2.13 and committed to the repo loads
    bit-exactly — guards against pickle/zip-layout drift in the reader."""

    def test_fixture_exact(self):
        out = load_pth_state_dict(os.path.join(ASSETS, "two_layer.pth"))
        golden = np.load(os.path.join(ASSETS, "two_layer_golden.npz"))
        assert set(out) == set(golden.files)
        for k in golden.files:
            np.testing.assert_array_equal(out[k], golden[k], err_msg=k)


class TestEndToEnd:
    def test_pth_bytes_to_flax_logits(self, tmp_path, rng):
        """Disk bytes → torch-free reader → resnet converter → flax forward
        matches the torch model that produced the checkpoint."""
        import jax.numpy as jnp

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import resnet_from_torch
        from tests.test_torch_weights import TorchResNet18

        torch.manual_seed(3)
        tm = TorchResNet18(num_classes=10).eval()
        with torch.no_grad():
            for mod in tm.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.uniform_(-0.5, 0.5)
                    mod.running_var.uniform_(0.5, 1.5)
        p = str(tmp_path / "resnet18.pth")
        torch.save(tm.state_dict(), p)

        sd = load_pth_state_dict(p)  # no torch in this path
        variables = resnet_from_torch(sd, (2, 2, 2, 2), bottleneck=False)
        ours = models.get_model("resnet18", num_classes=10)

        x = rng.random((2, 64, 64, 3), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, ref, atol=2e-4)
