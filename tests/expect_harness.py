"""Model forward-snapshot harness (counterpart of the reference's
``test/expect/`` tier, 125 pickled snapshots compared in
``test/test_models.py:133-155`` and refreshed with ``EXPECTTEST_ACCEPT=1``).

Every builder from ``models.list_models()`` is initialised with a fixed PRNG
key, run on a fixed tiny input, and fingerprinted (shapes + strided value
samples).  Fingerprints live in ``tests/expect/model_fingerprints.npz``;
regenerate with ``CVT_EXPECT_ACCEPT=1 python -m pytest
tests/test_expect_models.py``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

import numpy as np

EXPECT_PATH = os.path.join(os.path.dirname(__file__), "expect", "model_fingerprints.npz")
FP_SAMPLES = 64


def _img(size: int, ch: int = 3, batch: int = 1) -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.random((batch, size, size, ch), np.float32)


def _vid(t: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.random((1, t, size, size, 3), np.float32)


# name -> (builder_kwargs, input_builder, apply_kwargs)
# defaults: classification at 128x128
_DET_RCNN = dict(num_classes=11, rpn_pre_nms_top_n=100, rpn_post_nms_top_n=32,
                 max_detections=5)
SPECIAL: Dict[str, Tuple[dict, Callable[[], tuple]]] = {
    "maxvit_t": ({}, lambda: (_img(224),)),
    "vit_h_14": ({}, lambda: (_img(112),)),
    "ssd300_vgg16": (dict(num_classes=11, image_size=128), lambda: (_img(128),)),
    "ssdlite320_mobilenet_v3_large": (dict(num_classes=11, image_size=128),
                                      lambda: (_img(128),)),
    "raft_large": (dict(iters=2), lambda: (_img(64), _img(64))),
    "raft_small": (dict(iters=2), lambda: (_img(64), _img(64))),
    "raft_stereo_base": (dict(iters=2), lambda: (_img(64), _img(64))),
    "raft_stereo_realtime": (dict(iters=2), lambda: (_img(64), _img(64))),
}
for _n in ("fasterrcnn_resnet50_fpn", "fasterrcnn_resnet50_fpn_v2",
           "fasterrcnn_mobilenet_v3_large_fpn",
           "fasterrcnn_mobilenet_v3_large_320_fpn",
           "maskrcnn_resnet50_fpn", "maskrcnn_resnet50_fpn_v2",
           "keypointrcnn_resnet50_fpn"):
    SPECIAL[_n] = (dict(_DET_RCNN), lambda: (_img(128),))
for _n in ("retinanet_resnet50_fpn", "retinanet_resnet50_fpn_v2",
           "fcos_resnet50_fpn"):
    SPECIAL[_n] = (dict(num_classes=11, topk_candidates=50, max_detections=5),
                   lambda: (_img(128),))
for _n in ("r3d_18", "mc3_18", "r2plus1d_18",
           "swin3d_t", "swin3d_s", "swin3d_b", "mvit_v1_b", "mvit_v2_s"):
    SPECIAL[_n] = ({}, lambda: (_vid(4, 64),))
# s3d downsamples T by 8x (three stride-2 temporal pools) — needs T >= 8
SPECIAL["s3d"] = ({}, lambda: (_vid(8, 64),))
for _n in ("fcn_resnet50", "fcn_resnet101", "deeplabv3_resnet50",
           "deeplabv3_resnet101", "deeplabv3_mobilenet_v3_large",
           "lraspp_mobilenet_v3_large"):
    SPECIAL[_n] = ({}, lambda: (_img(64),))


def spec_for(name: str):
    if name in SPECIAL:
        return SPECIAL[name]
    return {}, lambda: (_img(128),)


def fingerprint(name: str) -> Dict[str, np.ndarray]:
    """Init + forward a builder deterministically; return fingerprint dict."""
    import jax
    import jax.numpy as jnp

    from cpu_vision_tpu import models

    kwargs, make_inputs = spec_for(name)
    model = models.get_model(name, **kwargs)
    if name.startswith("quantized_"):
        model = model.model  # QuantizableModel wrapper: snapshot the fp path
    inputs = tuple(jnp.asarray(a) for a in make_inputs())
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    leaves = jax.tree.leaves(out)
    fp: Dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf).astype(np.float64).reshape(-1)
        stride = max(1, len(a) // FP_SAMPLES)
        fp[f"{name}/{i}/shape"] = np.asarray(np.shape(leaf), np.int64)
        fp[f"{name}/{i}/sample"] = a[::stride][:FP_SAMPLES].astype(np.float32)
        fp[f"{name}/{i}/stats"] = np.asarray(
            [a.mean(), a.std(), np.abs(a).max()], np.float32)
    fp[f"{name}/nleaves"] = np.asarray([len(leaves)], np.int64)
    return fp


def load_expected() -> Dict[str, np.ndarray]:
    if not os.path.exists(EXPECT_PATH):
        return {}
    with np.load(EXPECT_PATH) as z:
        return {k: z[k] for k in z.files}


def save_expected(d: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(EXPECT_PATH), exist_ok=True)
    np.savez_compressed(EXPECT_PATH, **d)
