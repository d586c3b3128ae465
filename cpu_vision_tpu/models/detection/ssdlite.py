"""SSDLite320-MobileNetV3 (reference
``torchvision/models/detection/ssdlite.py``): MobileNetV3-Large trunk with
C4/C5 taps, depthwise-separable extra blocks and lite prediction heads.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from .._api import register_model
from ..layers import ConvNormActivation
from ..mobilenet import _V3_LARGE, V3Block, hardswish
from ._utils import BoxCoder
from .ssd import SSD, DefaultBoxGenerator

__all__ = ["SSDLite", "ssdlite320_mobilenet_v3_large"]


def _sep_block(c_mid, c_out, dtype):
    """Depthwise-separable extra block (reference ``_extra_block``)."""

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvNormActivation(c_mid, 1, activation=nn.relu6, eps=1e-3, dtype=dtype)(x, train)
            x = ConvNormActivation(c_mid, 3, 2, groups=c_mid, activation=nn.relu6, eps=1e-3, dtype=dtype)(x, train)
            return ConvNormActivation(c_out, 1, activation=nn.relu6, eps=1e-3, dtype=dtype)(x, train)

    return Block()


class SSDLite(nn.Module):
    """(reference ``ssdlite.py:ssdlite320_mobilenet_v3_large``)."""

    num_classes: int = 91
    image_size: int = 320
    score_thresh: float = 0.001
    nms_thresh: float = 0.55
    max_detections: int = 300
    topk_candidates: int = 300
    nms_candidates: int = 4096
    # reference: reduce_tail = weights_backbone is None (ssdlite.py:282) —
    # the from-scratch config halves the last three blocks' channels; pass
    # False to match the published-checkpoint architecture
    reduced_tail: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        div = 2 if self.reduced_tail else 1
        # reference reduce: block 12 keeps its 672 expand but halves its out;
        # blocks 13-14 halve both (mobilenetv3.py:240-247)
        cfg = [
            (k, exp // (div if i > 12 else 1), out_c // div, se, hs, s)
            if i >= 12 else (k, exp, out_c, se, hs, s)
            for i, (k, exp, out_c, se, hs, s) in enumerate(_V3_LARGE)
        ]
        x = ConvNormActivation(16, 3, 2, activation=hardswish, eps=1e-3, dtype=self.dtype)(images, train)
        feats: List[jnp.ndarray] = []
        for i, (k, exp, out_c, se, hs, s) in enumerate(cfg):
            if i == 12:
                # C4 = the expand conv INSIDE block 12 (the reference splits
                # the backbone at that layer and reuses it, ssdlite.py:129)
                x, expanded = V3Block(out_c, k, exp, se, hs, s, dtype=self.dtype)(
                    x, train, return_expanded=True)
                feats.append(expanded)
            else:
                x = V3Block(out_c, k, exp, se, hs, s, dtype=self.dtype)(x, train)
        x = ConvNormActivation(6 * x.shape[-1], 1, activation=hardswish, eps=1e-3, dtype=self.dtype)(x, train)
        feats.append(x)  # C5
        for c_mid, c_out in [(256, 512), (128, 256), (128, 256), (64, 128)]:
            x = _sep_block(c_mid, c_out, self.dtype)(x, train)
            feats.append(x)

        # reference generator: min_ratio 0.2, max_ratio 0.95 -> scales
        # [0.2, 0.35, 0.5, 0.65, 0.8, 0.95, 1.0]; steps=None (grid sizes)
        gen = DefaultBoxGenerator(
            aspect_ratios=((2, 3),) * 6,
            scales=(0.2, 0.35, 0.5, 0.65, 0.8, 0.95, 1.0),
            steps=None,
        )
        num_anchors = gen.num_anchors_per_location()
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(feats, num_anchors)):
            # lite heads: depthwise 3x3 + 1x1 (reference SSDLiteHead)
            def head(out_ch, name):
                y = ConvNormActivation(f.shape[-1], 3, groups=f.shape[-1],
                                       activation=nn.relu6, eps=1e-3, dtype=self.dtype,
                                       name=f"{name}_dw{i}")(f, train)
                return nn.Conv(out_ch, (1, 1), dtype=self.dtype, name=f"{name}_pw{i}")(y)

            n = f.shape[0]
            cls_out.append(head(a * self.num_classes, "cls").reshape(n, -1, self.num_classes))
            reg_out.append(head(a * 4, "reg").reshape(n, -1, 4))
        anchors = gen(self.image_size, [f.shape[1] for f in feats])
        return jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1), anchors

    # reuse SSD's postprocess machinery
    _coder = SSD._coder
    postprocess = SSD.postprocess


@register_model("ssdlite320_mobilenet_v3_large")
def ssdlite320_mobilenet_v3_large(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> SSDLite:
    return SSDLite(num_classes=num_classes, dtype=dtype, **kwargs)
