"""Full-zoo parameter parity: every count below was verified against the
reference torchvision source built in-process (torch CPU, stubbed C-op
schemas) — see PROGRESS notes.  The test re-checks our builders against the
recorded reference totals with ``jax.eval_shape`` (trace only, no compute).
vit_h_14 is excluded (needs 518px trace, covered in test_models_extra)."""

import jax
import jax.numpy as jnp
import pytest

from cpu_vision_tpu import models

VERIFIED = [
    ("alexnet", 61100840, 64),
    ("convnext_base", 88591464, 64),
    ("convnext_large", 197767336, 64),
    ("convnext_small", 50223688, 64),
    ("convnext_tiny", 28589128, 64),
    ("densenet121", 7978856, 64),
    ("densenet161", 28681000, 64),
    ("densenet169", 14149480, 64),
    ("densenet201", 20013928, 64),
    ("efficientnet_b0", 5288548, 64),
    ("efficientnet_b1", 7794184, 64),
    ("efficientnet_b2", 9109994, 64),
    ("efficientnet_b3", 12233232, 64),
    ("efficientnet_b4", 19341616, 64),
    ("efficientnet_b5", 30389784, 64),
    ("efficientnet_b6", 43040704, 64),
    ("efficientnet_b7", 66347960, 64),
    ("efficientnet_v2_l", 118515272, 64),
    ("efficientnet_v2_m", 54139356, 64),
    ("efficientnet_v2_s", 21458488, 64),
    ("googlenet", 13004888, 64),
    ("inception_v3", 27161264, 299),
    ("maxvit_t", 30919624, 224),
    ("mnasnet0_5", 2218512, 64),
    ("mnasnet0_75", 3170208, 64),
    ("mnasnet1_0", 4383312, 64),
    ("mnasnet1_3", 6282256, 64),
    ("mobilenet_v2", 3504872, 64),
    ("mobilenet_v3_large", 5483032, 64),
    ("mobilenet_v3_small", 2542856, 64),
    ("regnet_x_16gf", 54278536, 64),
    ("regnet_x_1_6gf", 9190136, 64),
    ("regnet_x_32gf", 107811560, 64),
    ("regnet_x_3_2gf", 15296552, 64),
    ("regnet_x_400mf", 5495976, 64),
    ("regnet_x_800mf", 7259656, 64),
    ("regnet_x_8gf", 39572648, 64),
    ("regnet_y_128gf", 644812894, 64),
    ("regnet_y_16gf", 83590140, 64),
    ("regnet_y_1_6gf", 11202430, 64),
    ("regnet_y_32gf", 145046770, 64),
    ("regnet_y_3_2gf", 19436338, 64),
    ("regnet_y_400mf", 4344144, 64),
    ("regnet_y_800mf", 6432512, 64),
    ("regnet_y_8gf", 39381472, 64),
    ("resnet101", 44549160, 64),
    ("resnet152", 60192808, 64),
    ("resnet18", 11689512, 64),
    ("resnet34", 21797672, 64),
    ("resnet50", 25557032, 64),
    ("resnext101_32x8d", 88791336, 64),
    ("resnext101_64x4d", 83455272, 64),
    ("resnext50_32x4d", 25028904, 64),
    ("shufflenet_v2_x0_5", 1366792, 64),
    ("shufflenet_v2_x1_0", 2278604, 64),
    ("shufflenet_v2_x1_5", 3503624, 64),
    ("shufflenet_v2_x2_0", 7393996, 64),
    ("squeezenet1_0", 1248424, 64),
    ("squeezenet1_1", 1235496, 64),
    ("swin_b", 87768224, 224),
    ("swin_s", 49606258, 224),
    ("swin_t", 28288354, 224),
    ("swin_v2_b", 87930848, 224),
    ("swin_v2_s", 49737442, 224),
    ("swin_v2_t", 28351570, 224),
    ("vgg11", 132863336, 64),
    ("vgg11_bn", 132868840, 64),
    ("vgg13", 133047848, 64),
    ("vgg13_bn", 133053736, 64),
    ("vgg16", 138357544, 64),
    ("vgg16_bn", 138365992, 64),
    ("vgg19", 143667240, 64),
    ("vgg19_bn", 143678248, 64),
    ("vit_b_16", 86567656, 224),
    ("vit_b_32", 88224232, 224),
    ("vit_l_16", 304326632, 224),
    ("vit_l_32", 306535400, 224),
    ("wide_resnet101_2", 126886696, 64),
    ("wide_resnet50_2", 68883240, 64),
]


@pytest.mark.parametrize("name,ref_params,size", VERIFIED,
                         ids=[v[0] for v in VERIFIED])
def test_param_count_matches_reference(name, ref_params, size):
    m = models.get_model(name)
    x = jnp.zeros((1, size, size, 3))

    def init():
        try:
            return m.init(jax.random.PRNGKey(0), x, train=False)
        except TypeError:
            return m.init(jax.random.PRNGKey(0), x)

    v = jax.eval_shape(init)
    ours = sum(int(a.size) for a in jax.tree.leaves(v["params"]))
    assert ours == ref_params


# detection / segmentation / video — verified against the reference source
# the same way (shape key: input (H, W) or (T, H, W))
VERIFIED_TASK = [
    ("fasterrcnn_resnet50_fpn", 41808406),
    ("fasterrcnn_resnet50_fpn_v2", 43712278),
    ("fasterrcnn_mobilenet_v3_large_fpn", 19410754),
    ("fasterrcnn_mobilenet_v3_large_320_fpn", 19410754),
    ("maskrcnn_resnet50_fpn", 44454513),
    ("maskrcnn_resnet50_fpn_v2", 46359409),
    ("keypointrcnn_resnet50_fpn", 59190378),
    ("retinanet_resnet50_fpn", 34068119),
    ("retinanet_resnet50_fpn_v2", 38198935),
    ("fcos_resnet50_fpn", 32322720),
    ("ssd300_vgg16", 35641826),
    ("ssdlite320_mobilenet_v3_large", 3440060),
    ("fcn_resnet50", 32957013),
    ("fcn_resnet101", 51949141),
    ("deeplabv3_resnet50", 39638869),
    ("deeplabv3_resnet101", 58630997),
    ("deeplabv3_mobilenet_v3_large", 11025477),
    ("lraspp_mobilenet_v3_large", 3221538),
    ("r3d_18", 33371472),
    ("mc3_18", 11695440),
    ("r2plus1d_18", 31505325),
    ("s3d", 8320048),
    ("mvit_v1_b", 36610672),
    ("mvit_v2_s", 34537744),
    ("swin3d_t", 28158070),
    ("swin3d_s", 49816678),
    ("swin3d_b", 88048984),
]


@pytest.mark.parametrize("name,ref_params", VERIFIED_TASK,
                         ids=[v[0] for v in VERIFIED_TASK])
def test_task_model_param_count_matches_reference(name, ref_params):
    m = models.get_model(name)
    if any(k in name for k in ("r3d", "mc3", "r2plus1d", "swin3d")):
        x = jnp.zeros((1, 8, 64, 64, 3))
    elif "s3d" in name:
        x = jnp.zeros((1, 16, 64, 64, 3))
    elif "mvit" in name:
        x = jnp.zeros((1, 16, 224, 224, 3))
    elif "ssdlite" in name:
        x = jnp.zeros((1, 320, 320, 3))
    else:
        x = jnp.zeros((1, 128, 128, 3))
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
    ours = sum(int(a.size) for a in jax.tree.leaves(v["params"]))
    assert ours == ref_params
