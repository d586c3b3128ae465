"""Logits-equality against the LIVE reference source: build the reference
torch model (random weights), convert its state_dict, and compare forward
logits.  Stronger than parameter-count parity — it proves layer wiring,
layout conversion, and BN semantics end to end.

Skipped when the reference tree is not importable (these tests exist for
environments where /root/reference is mounted, like this build's CI)."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")


@pytest.fixture(scope="module")
def tvm():
    # shared process-wide schema stub (only one DEF registration per
    # namespace is allowed; test_detection_parity shares it)
    from _reference_stub import (
        cleanup_reference_path,
        reference_path_added,
        stub_torchvision_schemas,
    )

    stub_torchvision_schemas()
    # APPEND (not prepend): /root/reference also contains a `references/`
    # tree that would otherwise shadow this repo's namespace package of the
    # same name for any test that runs later in the session
    added = reference_path_added()
    try:
        from torchvision import models as _tvm

        yield _tvm
    finally:
        cleanup_reference_path(added)


class TestGoogLeNetLogits:
    def test_converted_googlenet_matches_reference_exactly(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import googlenet_from_torch

        torch.manual_seed(0)
        tm = tvm.googlenet(weights=None, init_weights=True).eval()
        variables = googlenet_from_torch(tm.state_dict())
        ours = models.get_model("googlenet", num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_converted_tree_matches_init_structure(self, tvm):
        import jax
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import googlenet_from_torch

        tm = tvm.googlenet(weights=None, init_weights=False)
        variables = googlenet_from_torch(tm.state_dict())
        ours = models.get_model("googlenet", num_classes=1000)
        expected = jax.eval_shape(
            lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
                              train=False))
        got_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
        want_shapes = jax.tree.map(lambda a: a.shape, expected["params"])
        assert got_shapes == want_shapes


class TestMobileNetV3Logits:
    @pytest.mark.parametrize("arch", ["large", "small"])
    def test_converted_matches_reference(self, tvm, arch):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import mobilenet_v3_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, f"mobilenet_v3_{arch}")().eval()
        variables = mobilenet_v3_from_torch(tm.state_dict(), arch)
        ours = models.get_model(f"mobilenet_v3_{arch}", num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestResNetLogits:
    @pytest.mark.parametrize("name,layers,bottleneck", [
        ("resnet18", (2, 2, 2, 2), False),
        ("resnet50", (3, 4, 6, 3), True),
    ])
    def test_converted_matches_reference(self, tvm, name, layers, bottleneck):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import resnet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = resnet_from_torch(tm.state_dict(), layers, bottleneck)
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestSequentialLogits:
    @pytest.mark.parametrize("name", ["alexnet", "vgg11"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import sequential_cnn_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = sequential_cnn_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestViTLogits:
    def test_converted_vit_b_16_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import vit_from_torch

        torch.manual_seed(0)
        tm = tvm.vit_b_16().eval()
        variables = vit_from_torch(tm.state_dict(), num_layers=12, num_heads=12)
        ours = models.get_model("vit_b_16", num_classes=1000)
        x = np.random.default_rng(0).random((2, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestConvNeXtLogits:
    def test_converted_convnext_tiny_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import convnext_from_torch

        torch.manual_seed(0)
        tm = tvm.convnext_tiny().eval()
        variables = convnext_from_torch(tm.state_dict())
        ours = models.get_model("convnext_tiny", num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestEfficientNetLogits:
    @pytest.mark.parametrize("name", ["efficientnet_b0", "efficientnet_b2"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import efficientnet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = efficientnet_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestShuffleNetLogits:
    @pytest.mark.parametrize("name", ["shufflenet_v2_x0_5", "shufflenet_v2_x1_0"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import shufflenet_v2_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = shufflenet_v2_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestDenseNetLogits:
    def test_converted_densenet121_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import densenet_from_torch

        torch.manual_seed(0)
        tm = tvm.densenet121().eval()
        variables = densenet_from_torch(tm.state_dict())
        ours = models.get_model("densenet121", num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestRegNetLogits:
    @pytest.mark.parametrize("name", ["regnet_y_400mf", "regnet_x_400mf"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import regnet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = regnet_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestMNASNetLogits:
    @pytest.mark.parametrize("name", ["mnasnet0_5", "mnasnet1_0"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import mnasnet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = mnasnet_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def _damp_convs(tm, factor=0.25):
    """Scale conv/fc weights down so activations stay O(1); random inits of
    deep nets (inception esp.) otherwise amplify f32 noise exponentially,
    hiding real wiring errors behind loose tolerances."""
    import torch

    with torch.no_grad():
        for n, p in tm.named_parameters():
            if n.endswith(".weight") and p.dim() >= 2:
                p.mul_(factor)
    return tm


class TestSqueezeNetLogits:
    @pytest.mark.parametrize("name,size", [("squeezenet1_0", 96), ("squeezenet1_1", 100)])
    def test_converted_matches_reference(self, tvm, name, size):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import squeezenet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = squeezenet_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((2, size, size, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestInception3Logits:
    def test_converted_matches_reference_bitexact(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import inception3_from_torch

        torch.manual_seed(0)
        tm = _damp_convs(tvm.inception_v3(init_weights=True, transform_input=False).eval())
        variables = inception3_from_torch(tm.state_dict())
        ours = models.get_model("inception_v3", num_classes=1000)
        x = np.random.default_rng(0).random((1, 112, 112, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestVideoResNetLogits:
    @pytest.mark.parametrize("name", ["r3d_18", "mc3_18", "r2plus1d_18"])
    def test_converted_matches_reference(self, tvm, name):
        import torch
        from torchvision.models import video as tvv

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import video_resnet_from_torch

        torch.manual_seed(0)
        tm = _damp_convs(getattr(tvv, name)().eval(), 0.5)
        variables = video_resnet_from_torch(tm.state_dict(), name)
        ours = models.get_model(name, num_classes=400)
        x = np.random.default_rng(0).random((1, 8, 56, 56, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestS3DLogits:
    def test_converted_matches_reference(self, tvm):
        import torch
        from torchvision.models import video as tvv

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import s3d_from_torch

        torch.manual_seed(0)
        tm = _damp_convs(tvv.s3d().eval(), 0.4)
        variables = s3d_from_torch(tm.state_dict())
        ours = models.get_model("s3d", num_classes=400)
        # H=W=224 so the reference's fixed AvgPool3d((2,7,7)) window applies
        x = np.random.default_rng(0).random((1, 16, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestRAFTFlows:
    @pytest.mark.parametrize("name", ["raft_small", "raft_large"])
    def test_converted_matches_reference(self, tvm, name):
        import torch
        from torchvision.models import optical_flow as tvf

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import raft_from_torch

        torch.manual_seed(0)
        tm = getattr(tvf, name)().eval()
        assert (sum(p.numel() for p in tm.parameters())
                == {"raft_small": 990162, "raft_large": 5257536}[name])
        variables = raft_from_torch(tm.state_dict(), name)
        ours = models.get_model(name, iters=3)
        x1 = np.random.default_rng(0).random((1, 128, 128, 3), np.float32) * 2 - 1
        x2 = np.random.default_rng(1).random((1, 128, 128, 3), np.float32) * 2 - 1
        with torch.no_grad():
            ref = tm(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(x2.transpose(0, 3, 1, 2)), num_flow_updates=3)
        out = ours.apply(variables, jnp.asarray(x1), jnp.asarray(x2), train=False)
        for o, r in zip(out, ref):
            np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                                       atol=1e-4)


class TestMaxVitLogits:
    def test_converted_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import maxvit_from_torch

        torch.manual_seed(0)
        tm = tvm.maxvit_t().eval()
        variables = maxvit_from_torch(tm.state_dict())
        ours = models.get_model("maxvit_t", num_classes=1000)
        x = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestMViTLogits:
    @pytest.mark.parametrize("name", ["mvit_v1_b", "mvit_v2_s"])
    def test_converted_matches_reference(self, tvm, name):
        import torch
        from torchvision.models import video as tvv

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import mvit_from_torch

        torch.manual_seed(0)
        tm = getattr(tvv, name)().eval()
        variables = mvit_from_torch(tm.state_dict())
        ours = models.get_model(name, num_classes=400)
        x = np.random.default_rng(0).random((1, 16, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestSegmentationLogits:
    @pytest.mark.parametrize("name", [
        "fcn_resnet50", "deeplabv3_resnet50",
        "deeplabv3_mobilenet_v3_large", "lraspp_mobilenet_v3_large"])
    def test_converted_matches_reference(self, tvm, name):
        import torch
        from torchvision.models import segmentation as tvs

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import segmentation_from_torch

        torch.manual_seed(0)
        kw = {"weights_backbone": None}
        okw = {}
        if not name.startswith("lraspp"):
            kw["aux_loss"] = okw["aux_loss"] = True
        tm = getattr(tvs, name)(**kw).eval()
        variables = segmentation_from_torch(tm.state_dict(), name)
        ours = models.get_model(name, num_classes=21, **okw)
        x = np.random.default_rng(0).random((1, 128, 128, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = ours.apply(variables, jnp.asarray(x), train=False)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), ref[k].numpy().transpose(0, 2, 3, 1), atol=1e-4)


class TestMobileNetV2Logits:
    def test_converted_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import mobilenet_v2_from_torch

        torch.manual_seed(0)
        tm = tvm.mobilenet_v2().eval()
        variables = mobilenet_v2_from_torch(tm.state_dict())
        ours = models.get_model("mobilenet_v2", num_classes=1000)
        x = np.random.default_rng(0).random((2, 96, 96, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestEfficientNetV2Logits:
    def test_converted_matches_reference(self, tvm):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import efficientnet_v2_from_torch

        torch.manual_seed(0)
        tm = tvm.efficientnet_v2_s().eval()
        variables = efficientnet_v2_from_torch(tm.state_dict(), "efficientnet_v2_s")
        ours = models.get_model("efficientnet_v2_s", num_classes=1000)
        x = np.random.default_rng(0).random((1, 128, 128, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestSwinLogits:
    """Live-reference check for the swin converter (the oracle-based tests
    in test_torch_weights_transformers.py cover the math; this locks the
    full torchvision layout incl. stochastic-depth-free eval path)."""

    @pytest.mark.parametrize("name", ["swin_t", "swin_v2_t"])
    def test_converted_matches_reference(self, tvm, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import swin_from_torch

        torch.manual_seed(0)
        tm = getattr(tvm, name)().eval()
        variables = swin_from_torch(tm.state_dict(), depths=(2, 2, 6, 2))
        ours = models.get_model(name, num_classes=1000)
        x = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, ref, atol=2e-5)
