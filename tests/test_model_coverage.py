"""Complete model-registry coverage: every builder name the reference
registers (121 incl. the 12 quantized_*) resolves here, plus smoke checks of
the newly added v2/mobile detection variants, deeplab-mbv3, and the
quantized wrapper."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models

# the reference's registered names (torchvision models/_api registry):
# 109 @register_model builders + 12 quantized_* (models/quantization/)
REFERENCE_MODELS = """
alexnet convnext_base convnext_large convnext_small convnext_tiny
deeplabv3_mobilenet_v3_large deeplabv3_resnet101 deeplabv3_resnet50
densenet121 densenet161 densenet169 densenet201 efficientnet_b0
efficientnet_b1 efficientnet_b2 efficientnet_b3 efficientnet_b4
efficientnet_b5 efficientnet_b6 efficientnet_b7 efficientnet_v2_l
efficientnet_v2_m efficientnet_v2_s fasterrcnn_mobilenet_v3_large_320_fpn
fasterrcnn_mobilenet_v3_large_fpn fasterrcnn_resnet50_fpn
fasterrcnn_resnet50_fpn_v2 fcn_resnet101 fcn_resnet50 fcos_resnet50_fpn
googlenet inception_v3 keypointrcnn_resnet50_fpn lraspp_mobilenet_v3_large
maskrcnn_resnet50_fpn maskrcnn_resnet50_fpn_v2 maxvit_t mc3_18
mnasnet0_5 mnasnet0_75 mnasnet1_0 mnasnet1_3 mobilenet_v2
mobilenet_v3_large mobilenet_v3_small mvit_v1_b mvit_v2_s r2plus1d_18
r3d_18 raft_large raft_small regnet_x_16gf regnet_x_1_6gf regnet_x_32gf
regnet_x_3_2gf regnet_x_400mf regnet_x_800mf regnet_x_8gf regnet_y_128gf
regnet_y_16gf regnet_y_1_6gf regnet_y_32gf regnet_y_3_2gf regnet_y_400mf
regnet_y_800mf regnet_y_8gf resnet101 resnet152 resnet18 resnet34
resnet50 resnext101_32x8d resnext101_64x4d resnext50_32x4d
retinanet_resnet50_fpn retinanet_resnet50_fpn_v2 s3d shufflenet_v2_x0_5
shufflenet_v2_x1_0 shufflenet_v2_x1_5 shufflenet_v2_x2_0 squeezenet1_0
squeezenet1_1 ssd300_vgg16 ssdlite320_mobilenet_v3_large swin3d_b swin3d_s
swin3d_t swin_b swin_s swin_t swin_v2_b swin_v2_s swin_v2_t vgg11 vgg11_bn
vgg13 vgg13_bn vgg16 vgg16_bn vgg19 vgg19_bn vit_b_16 vit_b_32 vit_h_14
vit_l_16 vit_l_32 wide_resnet101_2 wide_resnet50_2
quantized_googlenet quantized_inception_v3 quantized_mobilenet_v2
quantized_mobilenet_v3_large quantized_resnet18 quantized_resnet50
quantized_resnext101_32x8d quantized_resnext101_64x4d
quantized_shufflenet_v2_x0_5 quantized_shufflenet_v2_x1_0
quantized_shufflenet_v2_x1_5 quantized_shufflenet_v2_x2_0
""".split()


class TestCoverage:
    def test_all_reference_names_registered(self):
        ours = set(models.list_models())
        missing = sorted(set(REFERENCE_MODELS) - ours)
        assert not missing, f"missing builders: {missing}"
        assert len(set(REFERENCE_MODELS)) == 121

    def test_list_models_filters(self):
        assert "resnet50" in models.list_models(include="resnet*")
        assert "resnet50" not in models.list_models(exclude="resnet*")


class TestNewDetectors:
    def test_v2_eval_shapes(self):
        for name in ("fasterrcnn_resnet50_fpn_v2", "maskrcnn_resnet50_fpn_v2",
                     "retinanet_resnet50_fpn_v2"):
            kw = {"max_detections": 5}
            if "rcnn" in name:
                kw.update(rpn_pre_nms_top_n=50, rpn_post_nms_top_n=20)
            m = models.get_model(name, num_classes=5, **kw)
            x = jnp.ones((1, 128, 128, 3), jnp.float32)
            v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
            assert "params" in v

    def test_mobilenet_fpn_real_forward(self):
        m = models.get_model("fasterrcnn_mobilenet_v3_large_fpn", num_classes=5,
                             rpn_pre_nms_top_n=50, rpn_post_nms_top_n=20,
                             max_detections=5)
        x = jnp.ones((1, 128, 128, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        dets = m.apply(v, x, train=False)
        assert dets["boxes"].shape == (1, 5, 4)
        assert dets["scores"].shape == (1, 5)


class TestDeepLabMBV3:
    def test_forward_and_stride(self):
        m = models.get_model("deeplabv3_mobilenet_v3_large", num_classes=5,
                             aux_loss=True)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["out"].shape == (1, 64, 64, 5)
        assert out["aux"].shape == (1, 64, 64, 5)


class TestQuantizedBuilders:
    def test_quantized_wrapper_roundtrip(self, rng):
        q = models.get_model("quantized_resnet18", num_classes=7)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        v = q.init(jax.random.PRNGKey(0), x, train=False)
        ref = q.apply(v, x, train=False)
        qv = q.quantize(v)
        out = q.apply_quantized(qv, x, train=False)
        assert out.shape == (1, 7)
        # int8 quantisation keeps logits close
        assert float(jnp.max(jnp.abs(out - ref))) < 0.5

    def test_int8_execution_path(self, rng):
        """apply_int8 runs large convs/denses as int8 contractions with
        int32 accumulation (reference converted int8 modules,
        ``models/quantization/resnet.py``); logits must track f32."""
        q = models.get_model("quantized_resnet18", num_classes=50)
        x = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
        v = q.init(jax.random.PRNGKey(0), x, train=False)
        f32 = np.asarray(q.apply(v, x, train=False))
        i8 = np.asarray(q.apply_int8(v, x, train=False))
        cos = float((f32 * i8).sum() / (np.linalg.norm(f32) * np.linalg.norm(i8) + 1e-12))
        assert cos > 0.999
        assert (f32.argmax(-1) == i8.argmax(-1)).mean() >= 0.75
        # and the int8 graph really contracts in integers
        import jax as _jax
        hlo = _jax.jit(lambda xx: q.apply_int8(v, xx, train=False)).lower(x).as_text()
        assert "xi8" in hlo and "i32" in hlo  # int8 operands, int32 accum

    def test_quantized_size_reduction(self):
        from cpu_vision_tpu.models.quantization import param_bytes

        q = models.get_model("quantized_resnet18", num_classes=10)
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x, train=False)
        qv = q.quantize(v)
        assert param_bytes(qv["params"]) < 0.3 * param_bytes(v["params"])


class TestModelsAttributeSurface:
    def test_every_builder_is_a_models_attribute(self):
        from cpu_vision_tpu import models

        assert [n for n in models.list_models() if not hasattr(models, n)] == []

    def test_weights_enums_exported(self):
        from cpu_vision_tpu import models

        for enum in ("ResNet18_Weights", "ResNet50_Weights", "ViT_B_16_Weights"):
            assert hasattr(models, enum), enum

    def test_detection_subnamespace(self):
        from cpu_vision_tpu import models

        for n in ("fasterrcnn_resnet50_fpn_v2", "maskrcnn_resnet50_fpn_v2",
                  "retinanet_resnet50_fpn_v2", "fasterrcnn_mobilenet_v3_large_fpn"):
            assert hasattr(models.detection, n), n

    def test_get_graph_node_names(self):
        import jax
        import jax.numpy as jnp
        from cpu_vision_tpu import models
        from cpu_vision_tpu.models.feature_extraction import get_graph_node_names

        m = models.get_model("squeezenet1_0", num_classes=10)
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        train_nodes, eval_nodes = get_graph_node_names(m, v, x, train=False)
        assert train_nodes == eval_nodes and len(train_nodes) > 5


class TestFeatureExtractionFX:
    """Exact node addressing at the reference's FX contract
    (``models/feature_extraction.py:334-480``): deterministic node list,
    dict renaming, no substring over-match, loud unknown-node errors."""

    def _setup(self):
        import jax
        from cpu_vision_tpu import models

        m = models.get_model("resnet18", num_classes=10)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v, x

    def test_node_names_are_exact_paths(self):
        from cpu_vision_tpu.models.feature_extraction import get_graph_node_names

        m, v, x = self._setup()
        nodes, _ = get_graph_node_names(m, v, x, train=False)
        assert "layer2_0" in nodes and "layer2_0/Conv_0" in nodes

    def test_no_substring_overmatch(self):
        """'layer1_0' must not match 'layer1_0...' prefixes of other blocks,
        and a nonexistent 'layer1' must raise, never silently match
        'layer1_0' AND 'layer1_1' at once like substring matching did."""
        from cpu_vision_tpu.models.feature_extraction import extract_features

        m, v, x = self._setup()
        feats = extract_features(m, v, x, ["layer1_1"], train=False)
        assert set(feats) == {"layer1_1"}

    def test_unknown_node_raises_with_suggestions(self):
        from cpu_vision_tpu.models.feature_extraction import extract_features

        m, v, x = self._setup()
        with pytest.raises(ValueError, match="not in the model graph"):
            extract_features(m, v, x, ["layer9_0"], train=False)

    def test_dict_renaming_and_order(self):
        from cpu_vision_tpu.models.feature_extraction import extract_features

        m, v, x = self._setup()
        feats = extract_features(
            m, v, x, {"layer1_1": "c2", "layer2_1": "c3", "layer3_1": "c4"},
            train=False)
        assert set(feats) == {"c2", "c3", "c4"}
        assert feats["c2"].shape[-1] == 64 and feats["c4"].shape[-1] == 256

    def test_inner_node_addressing(self):
        """A specific call site inside a block resolves uniquely (the FX
        'layer1.0.conv1' analog)."""
        from cpu_vision_tpu.models.feature_extraction import extract_features

        m, v, x = self._setup()
        feats = extract_features(m, v, x, ["layer2_0/Conv_0"], train=False)
        assert set(feats) == {"layer2_0/Conv_0"}
