"""Verify model parameter parity against the reference source itself.

Imports the reference torchvision from ``/root/reference`` **in-process**
(torch CPU): the C extension is absent, so the custom-op schemas that
``_meta_registrations.py`` needs are pre-registered as stubs — model
*construction* never calls them.  Then every builder is instantiated on
both sides and the parameter totals compared.

This is the script that produced the verified tables in
``tests/test_param_parity.py``.  Run:

    PYTHONPATH=/root/reference:. PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/verify_against_reference.py [name ...]
"""

from __future__ import annotations

import sys
import warnings

warnings.filterwarnings("ignore")

_SCHEMAS = [
    "nms(Tensor dets, Tensor scores, float iou_threshold) -> Tensor",
    "roi_align(Tensor input, Tensor rois, float spatial_scale, int pooled_height, int pooled_width, int sampling_ratio, bool aligned) -> Tensor",
    "_roi_align_backward(Tensor grad, Tensor rois, float spatial_scale, int pooled_height, int pooled_width, int batch_size, int channels, int height, int width, int sampling_ratio, bool aligned) -> Tensor",
    "ps_roi_align(Tensor input, Tensor rois, float spatial_scale, int pooled_height, int pooled_width, int sampling_ratio) -> (Tensor, Tensor)",
    "ps_roi_pool(Tensor input, Tensor rois, float spatial_scale, int pooled_height, int pooled_width) -> (Tensor, Tensor)",
    "roi_pool(Tensor input, Tensor rois, float spatial_scale, int pooled_height, int pooled_width) -> (Tensor, Tensor)",
    "deform_conv2d(Tensor input, Tensor weight, Tensor offset, Tensor mask, Tensor bias, int stride_h, int stride_w, int pad_h, int pad_w, int dilation_h, int dilation_w, int groups, int offset_groups, bool use_mask) -> Tensor",
    "_deform_conv2d_backward(Tensor grad, Tensor input, Tensor weight, Tensor offset, Tensor mask, Tensor bias, int stride_h, int stride_w, int pad_h, int pad_w, int dilation_h, int dilation_w, int groups, int offset_groups, bool use_mask) -> (Tensor, Tensor, Tensor, Tensor, Tensor)",
]


def load_reference_models():
    """Reference ``torchvision.models`` with stubbed C-op schemas."""
    import torch

    lib = torch.library.Library("torchvision", "DEF")
    for s in _SCHEMAS:
        try:
            lib.define(s)
        except Exception:
            pass  # already defined in this process
    from torchvision import models as tvm  # noqa: PLC0415

    return tvm, lib  # keep lib alive: dropping it unregisters the schemas


def ref_param_count(tvm, name: str) -> int:
    for ns in (tvm, tvm.detection, tvm.segmentation, tvm.video):
        builder = getattr(ns, name, None)
        if builder is not None:
            break
    else:
        raise ValueError(f"no reference builder {name!r}")
    try:
        model = builder(weights=None, weights_backbone=None)
    except TypeError:
        model = builder(weights=None)
    n = sum(p.numel() for p in model.parameters())
    del model
    return n


def our_param_count(name: str) -> int:
    import jax
    import jax.numpy as jnp

    from cpu_vision_tpu import models as cvm

    m = cvm.get_model(name)
    if any(k in name for k in ("r3d", "mc3", "r2plus1d", "swin3d")):
        x = jnp.zeros((1, 8, 64, 64, 3))
    elif "s3d" in name:
        x = jnp.zeros((1, 16, 64, 64, 3))
    elif "mvit" in name:
        x = jnp.zeros((1, 16, 224, 224, 3))
    elif "ssdlite" in name:
        x = jnp.zeros((1, 320, 320, 3))
    elif name.startswith(("vit_", "swin", "maxvit")):
        x = jnp.zeros((1, 518 if name == "vit_h_14" else 224, 518 if name == "vit_h_14" else 224, 3))
    elif "inception" in name:
        x = jnp.zeros((1, 299, 299, 3))
    elif any(k in name for k in ("rcnn", "retinanet", "fcos", "ssd")):
        x = jnp.zeros((1, 128, 128, 3))
    else:
        x = jnp.zeros((1, 64, 64, 3))

    def init():
        try:
            return m.init(jax.random.PRNGKey(0), x, train=False)
        except TypeError:
            return m.init(jax.random.PRNGKey(0), x)

    v = jax.eval_shape(init)
    return sum(int(a.size) for a in jax.tree.leaves(v["params"]))


def main(argv):
    from cpu_vision_tpu import models as cvm

    tvm, _lib = load_reference_models()
    names = argv or [n for n in cvm.list_models() if not n.startswith("quantized_")
                     and "raft" not in n]
    bad = 0
    for name in sorted(names):
        try:
            ref = ref_param_count(tvm, name)
            ours = our_param_count(name)
            status = "OK" if ref == ours else "MISMATCH"
            bad += status != "OK"
            print(f"{name:42s} {status:9s} ref={ref} ours={ours}", flush=True)
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name:42s} ERR {str(e)[:100]}", flush=True)
    print(f"\n{len(names)} checked, {bad} issues")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
