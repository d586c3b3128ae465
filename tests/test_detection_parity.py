"""Box-level numerical parity of the detection stack against the LIVE
reference (reference validates detection with expect-files,
``test/test_models.py:133-155``; here we go further and compare boxes/
scores/labels against the actual torch forward).

The reference's C++ nms op is replaced with a pure-python impl registered
at the CPU dispatch key (the schema stub trick from
``test_reference_logits.py``); roi_align uses the reference's own python
fallback path (``ops/roi_align.py:115-200``).
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchvision")),
    reason="reference torchvision source not mounted")

_KEEP = []  # keep torch.library IMPL registrations alive for the session


@pytest.fixture(scope="module")
def tvd():
    import torch

    # the DEF ("schema") registration is a process-wide singleton shared
    # with test_reference_logits (torch allows one per namespace)
    from _reference_stub import reference_path_added, stub_torchvision_schemas

    stub_torchvision_schemas()
    added = reference_path_added()

    def py_nms(dets, scores, iou):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel():
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.maximum(dets[i, 0], dets[rest, 0])
            yy1 = torch.maximum(dets[i, 1], dets[rest, 1])
            xx2 = torch.minimum(dets[i, 2], dets[rest, 2])
            yy2 = torch.minimum(dets[i, 3], dets[rest, 3])
            inter = (xx2 - xx1).clamp(0) * (yy2 - yy1).clamp(0)
            a1 = (dets[i, 2] - dets[i, 0]) * (dets[i, 3] - dets[i, 1])
            a2 = (dets[rest, 2] - dets[rest, 0]) * (dets[rest, 3] - dets[rest, 1])
            order = rest[(inter / (a1 + a2 - inter)) <= iou]
        return torch.as_tensor(keep, dtype=torch.int64)

    try:
        impl = torch.library.Library("torchvision", "IMPL", "CPU")
        impl.impl("nms", py_nms)
        _KEEP.append(impl)
    except Exception:
        pass
    import torchvision.ops.boxes as tob

    tob._assert_has_ops = lambda: None
    from _reference_stub import cleanup_reference_path

    try:
        from torchvision.models import detection as _tvd

        yield _tvd
    finally:
        cleanup_reference_path(added)


def _identity_transform_kwargs(size):
    return dict(min_size=size, max_size=size,
                image_mean=[0.0, 0.0, 0.0], image_std=[1.0, 1.0, 1.0])


def _compare_rcnn(tvd, name, okw=None, size=256, max_mismatched=10,
                  atol_boxes=0.05, atol_scores=5e-3):
    import torch

    from cpu_vision_tpu import models
    from cpu_vision_tpu.models.torch_weights import faster_rcnn_from_torch

    torch.manual_seed(0)
    tm = getattr(tvd, name)(weights_backbone=None, num_classes=91,
                            **_identity_transform_kwargs(size)).eval()
    variables = faster_rcnn_from_torch(tm.state_dict(), name)
    ours = models.get_model(name, num_classes=91, **(okw or {}))
    x = np.random.default_rng(0).random((1, size, size, 3), np.float32)
    with torch.no_grad():
        ref = tm([torch.from_numpy(x[0].transpose(2, 0, 1))])[0]
    out = ours.apply(variables, jnp.asarray(x), train=False)
    rb, rs, rl = ref["boxes"].numpy(), ref["scores"].numpy(), ref["labels"].numpy()
    n = len(rs)
    assert n > 0, "reference produced no detections — test degenerate"
    ob = np.asarray(out["boxes"][0])[:n]
    os_ = np.asarray(out["scores"][0])[:n]
    ol = np.asarray(out["labels"][0])[:n]
    np.testing.assert_allclose(os_, rs, atol=atol_scores)
    # boxes: allow a handful of score-tied orderings to differ
    mism = (np.abs(ob - rb).max(axis=1) > atol_boxes)
    assert mism.sum() <= max_mismatched, (
        f"{mism.sum()} boxes differ beyond ties; first: ours "
        f"{ob[mism][0]} vs ref {rb[mism][0]}")
    same = ~mism
    np.testing.assert_array_equal(ol[same], rl[same])
    return out, ref


class TestRCNNBoxParity:
    def test_fasterrcnn_resnet50_fpn(self, tvd):
        _compare_rcnn(tvd, "fasterrcnn_resnet50_fpn",
                      {"rpn_post_nms_top_n": 1000})

    def test_fasterrcnn_resnet50_fpn_v2(self, tvd):
        _compare_rcnn(tvd, "fasterrcnn_resnet50_fpn_v2",
                      {"rpn_post_nms_top_n": 1000}, max_mismatched=10)

    def test_maskrcnn_resnet50_fpn(self, tvd):
        out, _ = _compare_rcnn(tvd, "maskrcnn_resnet50_fpn",
                               {"rpn_post_nms_top_n": 1000}, max_mismatched=10)
        assert out["masks"].shape[2:] == (28, 28)

    def test_keypointrcnn_resnet50_fpn(self, tvd):
        _compare_rcnn(tvd, "keypointrcnn_resnet50_fpn",
                      {"rpn_post_nms_top_n": 1000}, max_mismatched=10)

    @pytest.mark.parametrize("name,okw", [
        ("fasterrcnn_mobilenet_v3_large_fpn", {"rpn_post_nms_top_n": 1000}),
        ("fasterrcnn_mobilenet_v3_large_320_fpn", {}),
    ])
    def test_mobilenet_variants(self, tvd, name, okw):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import faster_rcnn_from_torch

        torch.manual_seed(0)
        tm = getattr(tvd, name)(weights_backbone=None, num_classes=91,
                                box_score_thresh=0.001,
                                **_identity_transform_kwargs(256))
        # calibrate BN stats: a random-init mobilenet collapses activations
        # to ~1e-8, making every proposal score a tie
        tm.backbone.train()
        with torch.no_grad():
            for _ in range(5):
                tm.backbone(torch.randn(2, 3, 128, 128))
        tm = tm.eval()
        variables = faster_rcnn_from_torch(tm.state_dict(), name)
        ours = models.get_model(name, num_classes=91, box_score_thresh=0.001, **okw)
        x = np.random.default_rng(0).random((1, 256, 256, 3), np.float32)
        with torch.no_grad():
            ref = tm([torch.from_numpy(x[0].transpose(2, 0, 1))])[0]
        out = ours.apply(variables, jnp.asarray(x), train=False)
        rs = ref["scores"].numpy()
        n = min(len(rs), int(np.asarray(out["valid"][0]).sum()))
        assert n >= 50
        np.testing.assert_allclose(np.asarray(out["scores"][0])[:n], rs[:n], atol=5e-3)
        mism = (np.abs(np.asarray(out["boxes"][0])[:n] - ref["boxes"].numpy()[:n]).max(axis=1) > 5e-3)
        assert mism.sum() <= 10  # uniform-score ties reorder a few boxes


class TestSSDBoxParity:
    def test_ssd300_vgg16(self, tvd):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import ssd300_from_torch

        torch.manual_seed(0)
        tm = tvd.ssd300_vgg16(weights_backbone=None, num_classes=91,
                              image_mean=[0., 0., 0.], image_std=[1., 1., 1.]).eval()
        # variance-preserving reinit: random VGG init vanishes, making every
        # score a softmax-uniform tie
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, torch.nn.Conv2d):
                    torch.nn.init.kaiming_normal_(m.weight, mode="fan_in",
                                                  nonlinearity="relu")
                    if m.bias is not None:
                        m.bias.normal_(0, 0.05)
        variables = ssd300_from_torch(tm.state_dict())
        ours = models.get_model("ssd300_vgg16", num_classes=91)
        x = np.random.default_rng(0).random((1, 300, 300, 3), np.float32)
        with torch.no_grad():
            ref = tm([torch.from_numpy(x[0].transpose(2, 0, 1))])[0]
        cls_logits, deltas, anchors = ours.apply(variables, jnp.asarray(x), train=False)
        dets = ours.postprocess(cls_logits, deltas, anchors, (300, 300))
        rs, rb = ref["scores"].numpy(), ref["boxes"].numpy()
        n = min(len(rs), int(np.asarray(dets["valid"][0]).sum()))
        assert n >= 100
        np.testing.assert_allclose(np.asarray(dets["scores"][0])[:n], rs[:n], atol=5e-3)
        mism = (np.abs(np.asarray(dets["boxes"][0])[:n] - rb[:n]).max(axis=1) > 0.05)
        assert mism.sum() <= 10


class TestSingleStageParity:
    """RetinaNet / FCOS / SSDLite: raw-output equality against the live
    reference, plus postprocess equality on synthetic (tie-free) logits.
    Random-weight end-to-end box comparison is degenerate for these models
    (prior-prob bias makes every score a tie), so the test splits the two
    stages instead."""

    def _head_and_anchors(self, tm, x):
        import torch

        acts = {}
        tm.head.register_forward_hook(lambda m, i, o: acts.update(h=o))
        tm.anchor_generator.register_forward_hook(lambda m, i, o: acts.update(a=o))
        with torch.no_grad():
            tm([torch.from_numpy(x[0].transpose(2, 0, 1))])
        return acts["h"], acts["a"][0].numpy()

    @pytest.mark.parametrize("name", ["retinanet_resnet50_fpn",
                                      "retinanet_resnet50_fpn_v2"])
    def test_retinanet(self, tvd, name):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import retinanet_from_torch

        torch.manual_seed(0)
        tm = getattr(tvd, name)(weights_backbone=None, num_classes=91,
                                **_identity_transform_kwargs(256)).eval()
        variables = retinanet_from_torch(tm.state_dict(), name)
        ours = models.get_model(name, num_classes=91)
        x = np.random.default_rng(0).random((1, 256, 256, 3), np.float32)
        th, tanch = self._head_and_anchors(tm, x)
        cls_logits, deltas, anchors = ours.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(cls_logits),
                                   th["cls_logits"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(deltas),
                                   th["bbox_regression"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(anchors), tanch, atol=1e-4)

        rng = np.random.default_rng(1)
        A = tanch.shape[0]
        syn_cls = rng.normal(-4.0, 1.5, (1, A, 91)).astype(np.float32)
        syn_reg = rng.normal(0.0, 0.3, (1, A, 4)).astype(np.float32)
        level_sizes = [(256 // s) ** 2 * 9 for s in (8, 16, 32, 64, 128)]
        ho = {"cls_logits": torch.from_numpy(syn_cls),
              "bbox_regression": torch.from_numpy(syn_reg)}
        ho_split = {k: list(v.split(level_sizes, dim=1)) for k, v in ho.items()}
        anchors_split = [list(torch.from_numpy(tanch).split(level_sizes))]
        with torch.no_grad():
            tdets = tm.postprocess_detections(ho_split, anchors_split, [(256, 256)])[0]
        dets = ours.postprocess(jnp.asarray(syn_cls), jnp.asarray(syn_reg),
                                jnp.asarray(tanch), (256, 256),
                                level_sizes=level_sizes)
        rs, rb = tdets["scores"].numpy(), tdets["boxes"].numpy()
        n = min(len(rs), int(np.asarray(dets["valid"][0]).sum()))
        assert n >= 100
        np.testing.assert_allclose(np.asarray(dets["scores"][0])[:n], rs[:n], atol=1e-5)
        mism = (np.abs(np.asarray(dets["boxes"][0])[:n] - rb[:n]).max(axis=1) > 0.05)
        assert mism.sum() == 0

    def test_fcos(self, tvd):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import retinanet_from_torch

        torch.manual_seed(0)
        tm = tvd.fcos_resnet50_fpn(weights_backbone=None, num_classes=91,
                                   **_identity_transform_kwargs(256)).eval()
        variables = retinanet_from_torch(tm.state_dict(), "fcos_resnet50_fpn")
        ours = models.get_model("fcos_resnet50_fpn", num_classes=91)
        x = np.random.default_rng(0).random((1, 256, 256, 3), np.float32)
        th, tanch = self._head_and_anchors(tm, x)
        cls_logits, reg, ctr, locs, strides = ours.apply(variables, jnp.asarray(x),
                                                         train=False)
        np.testing.assert_allclose(np.asarray(cls_logits),
                                   th["cls_logits"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(reg),
                                   th["bbox_regression"].numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(ctr),
                                   th["bbox_ctrness"].numpy()[..., 0], atol=2e-3)
        tc = (tanch[:, :2] + tanch[:, 2:]) / 2
        np.testing.assert_allclose(np.asarray(locs), tc, atol=1e-5)

        rng = np.random.default_rng(1)
        P = tanch.shape[0]
        syn_cls = rng.normal(-3.0, 1.0, (1, P, 91)).astype(np.float32)
        syn_reg = np.abs(rng.normal(1.0, 0.5, (1, P, 4))).astype(np.float32)
        syn_ctr = rng.normal(0.0, 1.0, (1, P, 1)).astype(np.float32)
        level_sizes = [(256 // s) ** 2 for s in (8, 16, 32, 64, 128)]
        ho = {"cls_logits": torch.from_numpy(syn_cls),
              "bbox_regression": torch.from_numpy(syn_reg),
              "bbox_ctrness": torch.from_numpy(syn_ctr)}
        ho_split = {k: list(v.split(level_sizes, dim=1)) for k, v in ho.items()}
        anchors_split = [list(torch.from_numpy(tanch).split(level_sizes))]
        with torch.no_grad():
            tdets = tm.postprocess_detections(ho_split, anchors_split, [(256, 256)])[0]
        dets = ours.postprocess(jnp.asarray(syn_cls), jnp.asarray(syn_reg),
                                jnp.asarray(syn_ctr[..., 0]), locs, strides,
                                (256, 256), level_sizes=level_sizes)
        rs, rb = tdets["scores"].numpy(), tdets["boxes"].numpy()
        n = min(len(rs), int(np.asarray(dets["valid"][0]).sum()))
        assert n >= 50
        np.testing.assert_allclose(np.asarray(dets["scores"][0])[:n], rs[:n], atol=1e-5)
        assert (np.abs(np.asarray(dets["boxes"][0])[:n] - rb[:n]).max(axis=1) > 0.05).sum() == 0

    def test_ssdlite(self, tvd):
        import torch

        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.torch_weights import ssdlite_from_torch

        torch.manual_seed(0)
        tm = tvd.ssdlite320_mobilenet_v3_large(
            weights_backbone=None, num_classes=91,
            image_mean=[0., 0., 0.], image_std=[1., 1., 1.])
        tm.backbone.train()
        with torch.no_grad():
            for _ in range(5):
                tm.backbone(torch.randn(2, 3, 320, 320))
        tm = tm.eval()
        variables = ssdlite_from_torch(tm.state_dict())
        ours = models.get_model("ssdlite320_mobilenet_v3_large", num_classes=91)
        x = np.random.default_rng(0).random((1, 320, 320, 3), np.float32)
        th, tanch = self._head_and_anchors(tm, x)
        cls_logits, deltas, anchors = ours.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(cls_logits),
                                   th["cls_logits"].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(deltas),
                                   th["bbox_regression"].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(anchors), tanch, atol=1e-3)

        rng = np.random.default_rng(1)
        A = tanch.shape[0]
        syn_cls = rng.normal(-3.0, 2.0, (1, A, 91)).astype(np.float32)
        syn_reg = rng.normal(0.0, 0.5, (1, A, 4)).astype(np.float32)
        ho = {"cls_logits": torch.from_numpy(syn_cls),
              "bbox_regression": torch.from_numpy(syn_reg)}
        with torch.no_grad():
            tdets = tm.postprocess_detections(ho, [torch.from_numpy(tanch)],
                                              [(320, 320)])[0]
        dets = ours.postprocess(jnp.asarray(syn_cls), jnp.asarray(syn_reg),
                                jnp.asarray(tanch), (320, 320))
        rs, rb = tdets["scores"].numpy(), tdets["boxes"].numpy()
        n = min(len(rs), int(np.asarray(dets["valid"][0]).sum()))
        assert n >= 100
        np.testing.assert_allclose(np.asarray(dets["scores"][0])[:n], rs[:n], atol=1e-5)
        assert (np.abs(np.asarray(dets["boxes"][0])[:n] - rb[:n]).max(axis=1) > 0.05).sum() == 0
