"""Weights-registry parity sweep (VERDICT r4 missing #1): every reference
``WeightsEnum`` member must resolve via ``get_weight`` with a working
eval-preset factory and its published metadata.  Reference surface:
``torchvision/models/_api.py:108-283`` + the per-family weight tables."""

import pytest

from cpu_vision_tpu import models
from cpu_vision_tpu.models import _weights_data as d
from cpu_vision_tpu.models._api import ENUM_REGISTRY, Weights, get_weight

ALL_MEMBERS = [f"{ename}.{mname}"
               for ename, spec in sorted(d.WEIGHTS.items())
               for mname in spec["members"]]


def test_reference_enum_count():
    # 109 *_Weights + 12 *_QuantizedWeights in the reference tree
    assert len(d.WEIGHTS) == 121
    assert len(ALL_MEMBERS) == 166


@pytest.mark.parametrize("name", ALL_MEMBERS)
def test_get_weight_resolves(name):
    w = get_weight(name)
    assert isinstance(w, Weights)
    assert w.url.endswith(".ckpt")
    # the per-weight eval preset builds (crop/resize/normalize wired)
    assert w.transforms() is not None
    assert "_metrics" in w.meta or "recipe" in w.meta


def test_defaults_set():
    for ename, spec in d.WEIGHTS.items():
        enum = ENUM_REGISTRY[ename]
        if spec["default"] is not None:
            assert isinstance(enum.DEFAULT, Weights), ename


def test_builders_carry_enums():
    # every reference builder name with weights has a linked enum here
    missing = []
    for bname, ename in d.BUILDER_ENUMS.items():
        try:
            enum = models.get_model_weights(bname)
        except ValueError:
            missing.append(bname)
            continue
        if enum is None:
            missing.append(bname)
    assert not missing, f"builders without weights_enum: {missing}"


def test_verify_accepts_strings_and_none():
    enum = ENUM_REGISTRY["ConvNeXt_Tiny_Weights"]
    w = enum.verify("ConvNeXt_Tiny_Weights.IMAGENET1K_V1")
    assert isinstance(w, Weights)
    assert enum.verify(None) is None


def test_unquantized_links_resolve():
    w = get_weight("ResNet50_QuantizedWeights.IMAGENET1K_FBGEMM_V1")
    uq = w.meta.get("unquantized")
    assert isinstance(uq, Weights)


def test_metrics_match_reference_spot_values():
    # published numbers, straight from the reference tables
    w = get_weight("ConvNeXt_Tiny_Weights.IMAGENET1K_V1")
    assert w.meta["_metrics"]["ImageNet-1K"]["acc@1"] == 82.52
    w = get_weight("FasterRCNN_ResNet50_FPN_Weights.COCO_V1")
    assert w.meta["_metrics"]["COCO-val2017"]["box_map"] == 37.0
    w = get_weight("ResNet50_Weights.IMAGENET1K_V2")
    assert w.meta["_metrics"]["ImageNet-1K"]["acc@1"] == 80.858
