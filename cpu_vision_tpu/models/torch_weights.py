"""Import torchvision-format state dicts into our flax models.

Counterpart of the reference's ``WeightsEnum.get_state_dict`` loading path
(``models/_api.py:89``): instead of torch-hub downloads, this converts a
torchvision ``state_dict`` (e.g. loaded from a ``.pth`` with
``torch.load(..., map_location="cpu")``) into the flax variables of the
matching model here — so the reference's published pretrained weights run
on TPU unchanged.

Supported: the ResNet family (incl. resnext/wide) and AlexNet/VGG-style
conv+linear stacks.  Conversion rules:

* conv ``weight`` (O, I, kH, kW) -> HWIO kernel (transpose 2,3,1,0)
* linear ``weight`` (O, I) -> (I, O)
* batchnorm ``weight/bias`` -> params scale/bias;
  ``running_mean/var`` -> batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

import jax.numpy as jnp

__all__ = [
    "resnet_from_torch",
    "sequential_cnn_from_torch",
    "alexnet_from_torch",
    "vgg_from_torch",
    "convert_conv",
    "convert_linear",
]


def _np(t) -> np.ndarray:
    try:  # torch tensors
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_conv(w) -> jnp.ndarray:
    """torch conv (O, I, kH, kW) -> flax HWIO."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def convert_linear(w) -> jnp.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return jnp.asarray(_np(w).T)


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }
    return params, stats


def resnet_from_torch(state_dict: Mapping, layers: Tuple[int, ...], bottleneck: bool) -> Dict:
    """Convert a torchvision ResNet ``state_dict`` to our flax variables.

    ``layers`` e.g. (2, 2, 2, 2) for resnet18; ``bottleneck`` selects the
    block type.  Returns {"params": ..., "batch_stats": ...} matching
    :class:`cpu_vision_tpu.models.resnet.ResNet`.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["Conv_0"] = {"kernel": convert_conv(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(layers, start=1):
        for blk in range(n_blocks):
            t_prefix = f"layer{stage}.{blk}"
            name = f"layer{stage}_{blk}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in range(n_convs):
                bp[f"Conv_{ci}"] = {"kernel": convert_conv(sd[f"{t_prefix}.conv{ci + 1}.weight"])}
                p, s = _bn(sd, f"{t_prefix}.bn{ci + 1}")
                bp[f"BatchNorm_{ci}"] = p
                bs[f"BatchNorm_{ci}"] = s
            if f"{t_prefix}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": convert_conv(sd[f"{t_prefix}.downsample.0.weight"])
                }
                p, s = _bn(sd, f"{t_prefix}.downsample.1")
                bp[f"BatchNorm_{n_convs}"] = p
                bs[f"BatchNorm_{n_convs}"] = s
            params[name] = bp
            stats[name] = bs

    params["Dense_0"] = {
        "kernel": convert_linear(sd["fc.weight"]),
        "bias": jnp.asarray(_np(sd["fc.bias"])),
    }
    return {"params": params, "batch_stats": stats}


def _sequential_convs(sd: Mapping, prefix: str = "features"):
    """Conv (weight, bias) pairs of a torch Sequential trunk, in index order."""
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith(f"{prefix}.") and k.endswith(".weight")
         and _np(sd[k]).ndim == 4}
    )
    return [(sd[f"{prefix}.{i}.weight"], sd.get(f"{prefix}.{i}.bias")) for i in idxs]


def _sequential_linears(sd: Mapping, prefix: str = "classifier"):
    idxs = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith(f"{prefix}.") and k.endswith(".weight")
         and _np(sd[k]).ndim == 2}
    )
    return [(sd[f"{prefix}.{i}.weight"], sd[f"{prefix}.{i}.bias"]) for i in idxs]


def sequential_cnn_from_torch(state_dict: Mapping) -> Dict:
    """Convert AlexNet/VGG-style torchvision checkpoints (a ``features``
    Sequential of convs + a ``classifier`` Sequential of linears) into our
    flax params (Conv_0..N, Dense_0..M).

    The first linear consumes the flattened conv features: torch flattens
    CHW, we flatten HWC, so its input dimension is re-ordered accordingly
    (C = the last conv's output channels; spatial size inferred square).
    """
    params: Dict[str, Any] = {}
    convs = _sequential_convs(state_dict)
    for i, (w, b) in enumerate(convs):
        entry = {"kernel": convert_conv(w)}
        if b is not None:
            entry["bias"] = jnp.asarray(_np(b))
        params[f"Conv_{i}"] = entry
    last_c = _np(convs[-1][0]).shape[0]
    for i, (w, b) in enumerate(_sequential_linears(state_dict)):
        wn = _np(w)
        if i == 0 and wn.shape[1] % last_c == 0 and wn.shape[1] > last_c:
            hw = wn.shape[1] // last_c
            side = int(round(hw**0.5))
            # (O, C*H*W) -> (O, C, H, W) -> (O, H, W, C) -> (O, H*W*C)
            wn = wn.reshape(wn.shape[0], last_c, side, side)
            wn = wn.transpose(0, 2, 3, 1).reshape(wn.shape[0], -1)
        params[f"Dense_{i}"] = {"kernel": jnp.asarray(wn.T), "bias": jnp.asarray(_np(b))}
    return {"params": params}


alexnet_from_torch = sequential_cnn_from_torch
vgg_from_torch = sequential_cnn_from_torch
