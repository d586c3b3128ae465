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
    "swin3d_from_torch",
    "vit_from_torch",
    "swin_from_torch",
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


def resnet_from_torch(state_dict: Mapping, layers: Tuple[int, ...], bottleneck: bool,
                      with_fc: bool = True) -> Dict:
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

    if with_fc:
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


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": convert_linear(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def vit_from_torch(state_dict: Mapping, num_layers: int, num_heads: int) -> Dict:
    """Convert a torchvision VisionTransformer ``state_dict`` into the flax
    variables of :class:`~cpu_vision_tpu.models.vision_transformer.
    VisionTransformer`.

    Reference layout (``models/vision_transformer.py:86-243``):
    ``conv_proj``, ``class_token``, ``encoder.pos_embedding``,
    ``encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp.{0,3}}``,
    ``encoder.ln``, ``heads.head``. torch's packed ``in_proj_weight``
    (3D, D) splits into flax q/k/v kernels (D, H, head_dim).
    """
    sd = state_dict
    d = _np(sd["class_token"]).shape[-1]
    hd = d // num_heads
    params: Dict[str, Any] = {
        "Conv_0": {"kernel": convert_conv(sd["conv_proj.weight"]),
                   "bias": jnp.asarray(_np(sd["conv_proj.bias"]))},
        "class_token": jnp.asarray(_np(sd["class_token"])),
        "pos_embedding": jnp.asarray(_np(sd["encoder.pos_embedding"])),
        "LayerNorm_0": _ln(sd, "encoder.ln"),
        "Dense_0": _dense(sd, "heads.head"),
    }
    for i in range(num_layers):
        t = f"encoder.layers.encoder_layer_{i}"
        in_w = _np(sd[f"{t}.self_attention.in_proj_weight"])  # (3D, D)
        in_b = _np(sd[f"{t}.self_attention.in_proj_bias"])
        out_w = _np(sd[f"{t}.self_attention.out_proj.weight"])  # (D, D)
        qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]

        def qkv(w, b):
            return {"kernel": jnp.asarray(w.T.reshape(d, num_heads, hd)),
                    "bias": jnp.asarray(b.reshape(num_heads, hd))}

        params[f"encoder_{i}"] = {
            "LayerNorm_0": _ln(sd, f"{t}.ln_1"),
            "MultiHeadDotProductAttention_0": {
                "query": qkv(qw, qb), "key": qkv(kw, kb), "value": qkv(vw, vb),
                "out": {"kernel": jnp.asarray(out_w.T.reshape(num_heads, hd, d)),
                        "bias": jnp.asarray(_np(sd[f"{t}.self_attention.out_proj.bias"]))},
            },
            "LayerNorm_1": _ln(sd, f"{t}.ln_2"),
            "Dense_0": _dense(sd, f"{t}.mlp.0"),
            "Dense_1": _dense(sd, f"{t}.mlp.3"),
        }
    return {"params": params}


def swin_from_torch(state_dict: Mapping, depths: Tuple[int, ...] = (2, 2, 6, 2)) -> Dict:
    """Convert a torchvision (image) Swin V1/V2 ``state_dict`` into the flax
    variables of :class:`~cpu_vision_tpu.models.swin.SwinTransformer`.

    Reference layout (``models/swin_transformer.py:SwinTransformer``):
    ``features.0.{0,2}`` patch embed conv + norm; blocks at
    ``features.{2i+1}.{j}``; PatchMerging at ``features.{2i}``, i>=1
    (``reduction``/``norm``); final ``norm`` + ``head``. V2 blocks carry
    ``attn.logit_scale`` + ``attn.cpb_mlp.{0,2}`` instead of the bias table
    (detected per-block from the keys present).
    """
    sd = state_dict
    params: Dict[str, Any] = {
        "Conv_0": {"kernel": convert_conv(sd["features.0.0.weight"]),
                   "bias": jnp.asarray(_np(sd["features.0.0.bias"]))},
        "LayerNorm_0": _ln(sd, "features.0.2"),
        "LayerNorm_1": _ln(sd, "norm"),
        "Dense_0": _dense(sd, "head"),
    }
    bid = 0
    for stage, depth in enumerate(depths):
        if stage > 0:
            t = f"features.{2 * stage}"
            params[f"PatchMerging_{stage - 1}"] = {
                "LayerNorm_0": _ln(sd, f"{t}.norm"),
                "Dense_0": {"kernel": convert_linear(sd[f"{t}.reduction.weight"])},
            }
        for blk in range(depth):
            t = f"features.{2 * stage + 1}.{blk}"
            attn = {
                "qkv": _dense(sd, f"{t}.attn.qkv"),
                "proj": _dense(sd, f"{t}.attn.proj"),
            }
            if f"{t}.attn.logit_scale" in sd:  # V2
                attn["logit_scale"] = jnp.asarray(_np(sd[f"{t}.attn.logit_scale"]))
                attn["cpb_fc1"] = _dense(sd, f"{t}.attn.cpb_mlp.0")
                attn["cpb_fc2"] = _dense(sd, f"{t}.attn.cpb_mlp.2", bias=False)
            else:
                attn["relative_position_bias_table"] = jnp.asarray(
                    _np(sd[f"{t}.attn.relative_position_bias_table"]))
            params[f"SwinBlock_{bid}"] = {
                "LayerNorm_0": _ln(sd, f"{t}.norm1"),
                "WindowAttention_0": attn,
                "LayerNorm_1": _ln(sd, f"{t}.norm2"),
                "Dense_0": _dense(sd, f"{t}.mlp.0"),
                "Dense_1": _dense(sd, f"{t}.mlp.3"),
            }
            bid += 1
    return {"params": params}


def swin3d_from_torch(state_dict: Mapping, depths: Tuple[int, ...] = (2, 2, 6, 2)) -> Dict:
    """Convert a torchvision Video-Swin (``swin3d_*``) ``state_dict`` into
    the flax variables of :class:`cpu_vision_tpu.models.video_swin.
    SwinTransformer3d`.

    Reference layout (``video/swin_transformer.py:366-474``):
    ``patch_embed.proj`` Conv3d (O, I, D, kH, kW) -> DHWIO;
    ``features.{2i}.{j}`` blocks (norm1/attn.{qkv,proj,relative_position_
    bias_table}/norm2/mlp.{0,3}); ``features.{2i+1}`` PatchMerging
    (reduction/norm); final ``norm`` + ``head``.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    params["patch_embed"] = {
        "kernel": jnp.asarray(_np(sd["patch_embed.proj.weight"]).transpose(2, 3, 4, 1, 0)),
        "bias": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
    }
    params["LayerNorm_0"] = _ln(sd, "patch_embed.norm")
    bid = 0
    for stage, depth in enumerate(depths):
        for blk in range(depth):
            t = f"features.{2 * stage}.{blk}"
            params[f"SwinBlock3d_{bid}"] = {
                "LayerNorm_0": _ln(sd, f"{t}.norm1"),
                "WindowAttention3d_0": {
                    "qkv": _dense(sd, f"{t}.attn.qkv"),
                    "proj": _dense(sd, f"{t}.attn.proj"),
                    "relative_position_bias_table": jnp.asarray(
                        _np(sd[f"{t}.attn.relative_position_bias_table"])),
                },
                "LayerNorm_1": _ln(sd, f"{t}.norm2"),
                "Dense_0": _dense(sd, f"{t}.mlp.0"),
                "Dense_1": _dense(sd, f"{t}.mlp.3"),
            }
            bid += 1
        if stage < len(depths) - 1:
            t = f"features.{2 * stage + 1}"
            params[f"PatchMerging3d_{stage}"] = {
                "LayerNorm_0": _ln(sd, f"{t}.norm"),
                "Dense_0": {"kernel": convert_linear(sd[f"{t}.reduction.weight"])},
            }
    params["LayerNorm_1"] = _ln(sd, "norm")
    params["head"] = _dense(sd, "head")
    return {"params": params}


def _cna(sd: Mapping, conv_prefix: str, bn_prefix: str) -> Tuple[Dict, Dict]:
    """torch BasicConv2d (conv + bn) -> our ConvNormActivation subtree."""
    bn_p, bn_s = _bn(sd, bn_prefix)
    p = {"Conv_0": {"kernel": convert_conv(sd[f"{conv_prefix}.weight"])},
         "BatchNorm_0": bn_p}
    s = {"BatchNorm_0": bn_s}
    return p, s


def googlenet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision GoogLeNet state_dict -> our variables (reference
    ``googlenet.py``: conv1-3, inception3a..5b, aux1/aux2, fc).  Branch
    order maps to call order: branch1 -> CNA_0, branch2.{0,1} -> CNA_{1,2},
    branch3.{0,1} -> CNA_{3,4}, branch4.1 -> CNA_5."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def put(name, p, s):
        params[name] = p
        stats[name] = s

    for i, stem in enumerate(("conv1", "conv2", "conv3")):
        p, s = _cna(sd, f"{stem}.conv", f"{stem}.bn")
        put(f"ConvNormActivation_{i}", p, s)

    blocks = ["inception3a", "inception3b", "inception4a", "inception4b",
              "inception4c", "inception4d", "inception4e", "inception5a",
              "inception5b"]
    branch_map = [("branch1", ""), ("branch2", ".0"), ("branch2", ".1"),
                  ("branch3", ".0"), ("branch3", ".1"), ("branch4", ".1")]
    for bi, blk in enumerate(blocks):
        bp: Dict = {}
        bs: Dict = {}
        for ci, (br, idx) in enumerate(branch_map):
            p, s = _cna(sd, f"{blk}.{br}{idx}.conv", f"{blk}.{br}{idx}.bn")
            bp[f"ConvNormActivation_{ci}"] = p
            bs[f"ConvNormActivation_{ci}"] = s
        put(f"InceptionBlock_{bi}", bp, bs)

    for aux in ("aux1", "aux2"):
        if f"{aux}.conv.conv.weight" not in sd:
            continue
        p, s = _cna(sd, f"{aux}.conv.conv", f"{aux}.conv.bn")
        # fc1 consumes the flattened 4x4x128 map: torch flattens CHW, we
        # flatten HWC — reorder its input dimension
        w1 = _np(sd[f"{aux}.fc1.weight"]).reshape(-1, 128, 4, 4)
        w1 = w1.transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
        params[aux] = {
            "ConvNormActivation_0": p,
            "Dense_0": {"kernel": jnp.asarray(w1.T),
                        "bias": jnp.asarray(_np(sd[f"{aux}.fc1.bias"]))},
            "Dense_1": {"kernel": convert_linear(sd[f"{aux}.fc2.weight"]),
                        "bias": jnp.asarray(_np(sd[f"{aux}.fc2.bias"]))},
        }
        stats[aux] = {"ConvNormActivation_0": s}

    params["Dense_0"] = {"kernel": convert_linear(sd["fc.weight"]),
                         "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["googlenet_from_torch"]


def mobilenet_v3_from_torch(state_dict: Mapping, arch: str = "large") -> Dict:
    """torchvision MobileNetV3 state_dict -> our variables (reference
    ``mobilenetv3.py``): features.0 stem, features.1..N InvertedResidual
    blocks (expand / depthwise / optional SE / project), features.N+1 last
    conv, classifier.{0,3} linears."""
    from .mobilenet import _V3_LARGE, _V3_SMALL

    cfg = _V3_LARGE if arch == "large" else _V3_SMALL
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def cna(conv_prefix, bn_prefix):
        return _cna(sd, conv_prefix, bn_prefix)

    p, s = cna("features.0.0", "features.0.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    stem_out = 16
    in_c = stem_out
    for bi, (k, exp, out_c, se, hs, stride) in enumerate(cfg):
        t = f"features.{bi + 1}.block"
        bp: Dict = {}
        bs: Dict = {}
        li = 0  # torch sub-layer index
        ci = 0  # our ConvNormActivation index
        if exp != in_c:  # expand 1x1
            p, s = cna(f"{t}.{li}.0", f"{t}.{li}.1")
            bp[f"ConvNormActivation_{ci}"] = p
            bs[f"ConvNormActivation_{ci}"] = s
            li += 1
            ci += 1
        p, s = cna(f"{t}.{li}.0", f"{t}.{li}.1")  # depthwise
        bp[f"ConvNormActivation_{ci}"] = p
        bs[f"ConvNormActivation_{ci}"] = s
        li += 1
        ci += 1
        if se:
            bp["SqueezeExcitation_0"] = {
                "Conv_0": {"kernel": convert_conv(sd[f"{t}.{li}.fc1.weight"]),
                           "bias": jnp.asarray(_np(sd[f"{t}.{li}.fc1.bias"]))},
                "Conv_1": {"kernel": convert_conv(sd[f"{t}.{li}.fc2.weight"]),
                           "bias": jnp.asarray(_np(sd[f"{t}.{li}.fc2.bias"]))},
            }
            li += 1
        p, s = cna(f"{t}.{li}.0", f"{t}.{li}.1")  # project
        bp[f"ConvNormActivation_{ci}"] = p
        bs[f"ConvNormActivation_{ci}"] = s
        params[f"V3Block_{bi}"] = bp
        stats[f"V3Block_{bi}"] = bs
        in_c = out_c

    last = f"features.{len(cfg) + 1}"
    p, s = cna(f"{last}.0", f"{last}.1")
    params["ConvNormActivation_1"] = p
    stats["ConvNormActivation_1"] = s

    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.0.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.0.bias"]))}
    params["Dense_1"] = {"kernel": convert_linear(sd["classifier.3.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.3.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["mobilenet_v3_from_torch"]


def mobilenet_v2_from_torch(state_dict: Mapping) -> Dict:
    """torchvision MobileNetV2 state_dict -> our variables (reference
    ``mobilenetv2.py``): features.0 stem CNA, features.1..17 InvertedResidual
    (``conv`` = [expand CNA,] depthwise CNA, project conv+bn), features.18
    last CNA, classifier.1 linear."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    p, s = _cna(sd, "features.0.0", "features.0.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    # (t, c, n, s) table — repeats per stage; 17 blocks total
    repeats = [1, 2, 3, 4, 3, 3, 1]
    expands = [1, 6, 6, 6, 6, 6, 6]
    bi = 0
    for stage, n in enumerate(repeats):
        for _ in range(n):
            t = f"features.{bi + 1}.conv"
            bp: Dict = {}
            bs: Dict = {}
            li = ci = 0
            if expands[stage] != 1:  # expand 1x1 CNA
                p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")
                bp[f"ConvNormActivation_{ci}"] = p
                bs[f"ConvNormActivation_{ci}"] = s
                li += 1
                ci += 1
            p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")  # depthwise CNA
            bp[f"ConvNormActivation_{ci}"] = p
            bs[f"ConvNormActivation_{ci}"] = s
            # project: bare conv + bn (not a CNA submodule in torch)
            p, s = _cna(sd, f"{t}.{li + 1}", f"{t}.{li + 2}")
            bp[f"ConvNormActivation_{ci + 1}"] = p
            bs[f"ConvNormActivation_{ci + 1}"] = s
            params[f"InvertedResidual_{bi}"] = bp
            stats[f"InvertedResidual_{bi}"] = bs
            bi += 1

    p, s = _cna(sd, "features.18.0", "features.18.1")
    params["ConvNormActivation_1"] = p
    stats["ConvNormActivation_1"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.1.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.1.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["mobilenet_v2_from_torch"]


def convnext_from_torch(state_dict: Mapping) -> Dict:
    """torchvision ConvNeXt state_dict -> our flax params (reference
    ``convnext.py``: features.0 stem conv+LN, odd features = CNBlock stages
    (block.{0 dw-conv, 2 LN, 3 fc1, 5 fc2} + layer_scale), even features =
    downsample LN+conv, classifier.{0 LN, 2 linear}).  Depths inferred from
    the state-dict names."""
    sd = state_dict
    params: Dict[str, Any] = {
        "Conv_0": {"kernel": convert_conv(sd["features.0.0.weight"]),
                   "bias": jnp.asarray(_np(sd["features.0.0.bias"]))},
        "LayerNorm_0": _ln(sd, "features.0.1"),
    }
    stage_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("features.")})
    block_stages = [i for i in stage_ids if f"features.{i}.0.layer_scale" in sd]
    down_stages = [i for i in stage_ids if i not in block_stages and i != 0]
    bi = 0
    for si in block_stages:
        j = 0
        while f"features.{si}.{j}.layer_scale" in sd:
            t = f"features.{si}.{j}"
            params[f"CNBlock_{bi}"] = {
                "Conv_0": {"kernel": convert_conv(sd[f"{t}.block.0.weight"]),
                           "bias": jnp.asarray(_np(sd[f"{t}.block.0.bias"]))},
                "LayerNorm_0": _ln(sd, f"{t}.block.2"),
                "Dense_0": _dense(sd, f"{t}.block.3"),
                "Dense_1": _dense(sd, f"{t}.block.5"),
                "layer_scale": jnp.asarray(_np(sd[f"{t}.layer_scale"]).reshape(-1)),
            }
            bi += 1
            j += 1
    for di, si in enumerate(down_stages, start=1):
        params[f"LayerNorm_{di}"] = _ln(sd, f"features.{si}.0")
        params[f"Conv_{di}"] = {"kernel": convert_conv(sd[f"features.{si}.1.weight"]),
                                "bias": jnp.asarray(_np(sd[f"features.{si}.1.bias"]))}
    params[f"LayerNorm_{len(down_stages) + 1}"] = _ln(sd, "classifier.0")
    params["Dense_0"] = _dense(sd, "classifier.2")
    return {"params": params}


__all__ += ["convnext_from_torch"]


def efficientnet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision EfficientNet (v1) state_dict -> our flax variables
    (reference ``efficientnet.py``): features.0 stem, features.1..7 MBConv
    stages (optional expand, depthwise, SE fc1/fc2, project), features.8
    head conv, classifier.1 linear.  Stage/repeat structure inferred from
    the names; expand presence from the ``block.3`` sub-layer."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _cna(sd, "features.0.0", "features.0.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    stage_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("features.")})
    head_id = stage_ids[-1]
    bi = 0
    for si in stage_ids[1:-1]:
        j = 0
        while f"features.{si}.{j}.block.0.0.weight" in sd:
            t = f"features.{si}.{j}.block"
            has_expand = f"{t}.3.0.weight" in sd
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            li = 0
            ci = 0
            if has_expand:
                p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")
                bp[f"ConvNormActivation_{ci}"] = p
                bs[f"ConvNormActivation_{ci}"] = s
                li += 1
                ci += 1
            p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")  # depthwise
            bp[f"ConvNormActivation_{ci}"] = p
            bs[f"ConvNormActivation_{ci}"] = s
            li += 1
            ci += 1
            bp["SqueezeExcitation_0"] = {
                "Conv_0": {"kernel": convert_conv(sd[f"{t}.{li}.fc1.weight"]),
                           "bias": jnp.asarray(_np(sd[f"{t}.{li}.fc1.bias"]))},
                "Conv_1": {"kernel": convert_conv(sd[f"{t}.{li}.fc2.weight"]),
                           "bias": jnp.asarray(_np(sd[f"{t}.{li}.fc2.bias"]))},
            }
            li += 1
            p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")  # project
            bp[f"ConvNormActivation_{ci}"] = p
            bs[f"ConvNormActivation_{ci}"] = s
            params[f"MBConv_{bi}"] = bp
            stats[f"MBConv_{bi}"] = bs
            bi += 1
            j += 1

    p, s = _cna(sd, f"features.{head_id}.0", f"features.{head_id}.1")
    params["ConvNormActivation_1"] = p
    stats["ConvNormActivation_1"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.1.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.1.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["efficientnet_from_torch"]


def efficientnet_v2_from_torch(state_dict: Mapping, arch: str = "efficientnet_v2_s") -> Dict:
    """torchvision EfficientNetV2 state_dict -> our flax variables
    (reference ``efficientnet.py``: FusedMBConv stages first, then MBConv;
    fused block = [expand-fused CNA, project CNA] or one CNA when
    expand_ratio == 1).  Flax gives MBConv/FusedMBConv separate name
    counters, so the converter walks the per-arch stage table."""
    from .efficientnet import _V2_L, _V2_M, _V2_S

    cfg = {"efficientnet_v2_s": _V2_S, "efficientnet_v2_m": _V2_M,
           "efficientnet_v2_l": _V2_L}[arch]
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _cna(sd, "features.0.0", "features.0.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    mb = fused = 0
    for si, (btype, expand, _k, _st, _c, repeats) in enumerate(cfg, start=1):
        for j in range(repeats):
            t = f"features.{si}.{j}.block"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if btype == "fused":
                if expand != 1:
                    p, s = _cna(sd, f"{t}.0.0", f"{t}.0.1")  # fused expand
                    bp["ConvNormActivation_0"] = p
                    bs["ConvNormActivation_0"] = s
                    p, s = _cna(sd, f"{t}.1.0", f"{t}.1.1")  # project
                    bp["ConvNormActivation_1"] = p
                    bs["ConvNormActivation_1"] = s
                else:
                    p, s = _cna(sd, f"{t}.0.0", f"{t}.0.1")
                    bp["ConvNormActivation_0"] = p
                    bs["ConvNormActivation_0"] = s
                params[f"FusedMBConv_{fused}"] = bp
                stats[f"FusedMBConv_{fused}"] = bs
                fused += 1
            else:
                p, s = _cna(sd, f"{t}.0.0", f"{t}.0.1")  # expand 1x1
                bp["ConvNormActivation_0"] = p
                bs["ConvNormActivation_0"] = s
                p, s = _cna(sd, f"{t}.1.0", f"{t}.1.1")  # depthwise
                bp["ConvNormActivation_1"] = p
                bs["ConvNormActivation_1"] = s
                bp["SqueezeExcitation_0"] = {
                    "Conv_0": {"kernel": convert_conv(sd[f"{t}.2.fc1.weight"]),
                               "bias": jnp.asarray(_np(sd[f"{t}.2.fc1.bias"]))},
                    "Conv_1": {"kernel": convert_conv(sd[f"{t}.2.fc2.weight"]),
                               "bias": jnp.asarray(_np(sd[f"{t}.2.fc2.bias"]))},
                }
                p, s = _cna(sd, f"{t}.3.0", f"{t}.3.1")  # project
                bp["ConvNormActivation_2"] = p
                bs["ConvNormActivation_2"] = s
                params[f"MBConv_{mb}"] = bp
                stats[f"MBConv_{mb}"] = bs
                mb += 1

    head = len(cfg)
    p, s = _cna(sd, f"features.{head + 1}.0", f"features.{head + 1}.1")
    params["ConvNormActivation_1"] = p
    stats["ConvNormActivation_1"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.1.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.1.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["efficientnet_v2_from_torch"]


def shufflenet_v2_from_torch(state_dict: Mapping) -> Dict:
    """torchvision ShuffleNetV2 state_dict -> our flax variables (reference
    ``shufflenetv2.py``): conv1, stage2-4 of InvertedResiduals (downsample
    units carry branch1 dw+pw; all carry branch2 pw/dw/pw), conv5, fc."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _cna(sd, "conv1.0", "conv1.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    bi = 0
    for stage in (2, 3, 4):
        j = 0
        while f"stage{stage}.{j}.branch2.0.weight" in sd:
            t = f"stage{stage}.{j}"
            pairs = []
            if f"{t}.branch1.0.weight" in sd:  # downsample unit
                pairs += [(f"{t}.branch1.0", f"{t}.branch1.1"),
                          (f"{t}.branch1.2", f"{t}.branch1.3")]
            pairs += [(f"{t}.branch2.0", f"{t}.branch2.1"),
                      (f"{t}.branch2.3", f"{t}.branch2.4"),
                      (f"{t}.branch2.5", f"{t}.branch2.6")]
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci, (cp, bnp) in enumerate(pairs):
                p, s = _cna(sd, cp, bnp)
                bp[f"ConvNormActivation_{ci}"] = p
                bs[f"ConvNormActivation_{ci}"] = s
            params[f"_ShuffleUnit_{bi}"] = bp
            stats[f"_ShuffleUnit_{bi}"] = bs
            bi += 1
            j += 1

    p, s = _cna(sd, "conv5.0", "conv5.1")
    params["ConvNormActivation_1"] = p
    stats["ConvNormActivation_1"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["fc.weight"]),
                         "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["shufflenet_v2_from_torch"]


def densenet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision DenseNet state_dict -> our flax variables (reference
    ``densenet.py``: features.conv0/norm0, denseblock{1..4}.denselayer{j}
    (norm1/conv1/norm2/conv2), transition{1..3} (norm/conv), norm5,
    classifier).  Block depths inferred from the names."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["Conv_0"] = {"kernel": convert_conv(sd["features.conv0.weight"])}
    p, s = _bn(sd, "features.norm0")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    li = 0
    for blk in (1, 2, 3, 4):
        j = 1
        while f"features.denseblock{blk}.denselayer{j}.conv1.weight" in sd:
            t = f"features.denseblock{blk}.denselayer{j}"
            p1, s1 = _bn(sd, f"{t}.norm1")
            p2, s2 = _bn(sd, f"{t}.norm2")
            params[f"DenseLayer_{li}"] = {
                "BatchNorm_0": p1,
                "Conv_0": {"kernel": convert_conv(sd[f"{t}.conv1.weight"])},
                "BatchNorm_1": p2,
                "Conv_1": {"kernel": convert_conv(sd[f"{t}.conv2.weight"])},
            }
            stats[f"DenseLayer_{li}"] = {"BatchNorm_0": s1, "BatchNorm_1": s2}
            li += 1
            j += 1
        if blk < 4:
            t = f"features.transition{blk}"
            p, s = _bn(sd, f"{t}.norm")
            params[f"BatchNorm_{blk}"] = p
            stats[f"BatchNorm_{blk}"] = s
            params[f"Conv_{blk}"] = {"kernel": convert_conv(sd[f"{t}.conv.weight"])}

    p, s = _bn(sd, "features.norm5")
    params["BatchNorm_4"] = p
    stats["BatchNorm_4"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["densenet_from_torch"]


def regnet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision RegNet state_dict -> our flax variables (reference
    ``regnet.py``): stem, trunk_output.block{s}.block{s}-{j} with
    f.a / f.b / optional f.se / f.c and optional proj downsample, fc."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _cna(sd, "stem.0", "stem.1")
    params["ConvNormActivation_0"] = p
    stats["ConvNormActivation_0"] = s

    bi = 0
    stage = 1
    while f"trunk_output.block{stage}.block{stage}-0.f.a.0.weight" in sd:
        j = 0
        while f"trunk_output.block{stage}.block{stage}-{j}.f.a.0.weight" in sd:
            t = f"trunk_output.block{stage}.block{stage}-{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci, sub in enumerate(("f.a", "f.b")):
                p, s = _cna(sd, f"{t}.{sub}.0", f"{t}.{sub}.1")
                bp[f"ConvNormActivation_{ci}"] = p
                bs[f"ConvNormActivation_{ci}"] = s
            if f"{t}.f.se.fc1.weight" in sd:
                bp["SqueezeExcitation_0"] = {
                    "Conv_0": {"kernel": convert_conv(sd[f"{t}.f.se.fc1.weight"]),
                               "bias": jnp.asarray(_np(sd[f"{t}.f.se.fc1.bias"]))},
                    "Conv_1": {"kernel": convert_conv(sd[f"{t}.f.se.fc2.weight"]),
                               "bias": jnp.asarray(_np(sd[f"{t}.f.se.fc2.bias"]))},
                }
            p, s = _cna(sd, f"{t}.f.c.0", f"{t}.f.c.1")
            bp["ConvNormActivation_2"] = p
            bs["ConvNormActivation_2"] = s
            if f"{t}.proj.0.weight" in sd:
                p, s = _cna(sd, f"{t}.proj.0", f"{t}.proj.1")
                bp["ConvNormActivation_3"] = p
                bs["ConvNormActivation_3"] = s
            params[f"XBlock_{bi}"] = bp
            stats[f"XBlock_{bi}"] = bs
            bi += 1
            j += 1
        stage += 1

    params["Dense_0"] = {"kernel": convert_linear(sd["fc.weight"]),
                         "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["regnet_from_torch"]


def mnasnet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision MNASNet state_dict -> our flax variables (reference
    ``mnasnet.py``: layers.0/1 stem, layers.3/4 depthwise, layers.6/7
    project, layers.8-13 _InvertedResidual stacks (each sub-block has
    layers.{0,1,3,4,6,7}), layers.14/15 head conv, classifier.1)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for ci, (cw, bw) in enumerate((("layers.0", "layers.1"),
                                   ("layers.3", "layers.4"),
                                   ("layers.6", "layers.7"))):
        p, s = _cna(sd, cw, bw)
        params[f"ConvNormActivation_{ci}"] = p
        stats[f"ConvNormActivation_{ci}"] = s

    bi = 0
    for stack in (8, 9, 10, 11, 12, 13):
        j = 0
        while f"layers.{stack}.{j}.layers.0.weight" in sd:
            t = f"layers.{stack}.{j}.layers"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci, (c, b) in enumerate(((0, 1), (3, 4), (6, 7))):
                p, s = _cna(sd, f"{t}.{c}", f"{t}.{b}")
                bp[f"ConvNormActivation_{ci}"] = p
                bs[f"ConvNormActivation_{ci}"] = s
            params[f"_InvertedResidual_{bi}"] = bp
            stats[f"_InvertedResidual_{bi}"] = bs
            bi += 1
            j += 1

    p, s = _cna(sd, "layers.14", "layers.15")
    params["ConvNormActivation_3"] = p
    stats["ConvNormActivation_3"] = s
    params["Dense_0"] = {"kernel": convert_linear(sd["classifier.1.weight"]),
                         "bias": jnp.asarray(_np(sd["classifier.1.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["mnasnet_from_torch"]


def _conv_b(sd: Mapping, prefix: str) -> Dict:
    """torch conv with bias -> flax Conv subtree."""
    return {"kernel": convert_conv(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def squeezenet_from_torch(state_dict: Mapping) -> Dict:
    """torchvision SqueezeNet state_dict -> our flax variables (reference
    ``squeezenet.py``: features.0 stem conv, Fire modules at the remaining
    feature indices with squeeze/expand1x1/expand3x3 convs, classifier.1
    final conv).  Fire index order matches call order (Fire_0..Fire_7)."""
    sd = state_dict
    params: Dict[str, Any] = {"Conv_0": _conv_b(sd, "features.0")}
    fire_ids = sorted({int(k.split(".")[1]) for k in sd if ".squeeze.weight" in k})
    for j, i in enumerate(fire_ids):
        t = f"features.{i}"
        params[f"Fire_{j}"] = {
            "Conv_0": _conv_b(sd, f"{t}.squeeze"),
            "Conv_1": _conv_b(sd, f"{t}.expand1x1"),
            "Conv_2": _conv_b(sd, f"{t}.expand3x3"),
        }
    params["Conv_1"] = _conv_b(sd, "classifier.1")
    return {"params": params}


__all__ += ["squeezenet_from_torch"]


def inception3_from_torch(state_dict: Mapping) -> Dict:
    """torchvision Inception3 state_dict -> our flax variables (reference
    ``inception.py``: Conv2d_* stem, Mixed_5x InceptionA, Mixed_6a
    InceptionB, Mixed_6b-e InceptionC, Mixed_7a InceptionD, Mixed_7b/c
    InceptionE, AuxLogits, fc).  Branch-to-CNA index maps follow our call
    order in ``googlenet.py:InceptionA..E``."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_cna(dst_p, dst_s, name, torch_prefix):
        p, s = _cna(sd, f"{torch_prefix}.conv", f"{torch_prefix}.bn")
        dst_p[name] = p
        dst_s[name] = s

    for i, stem in enumerate(("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                              "Conv2d_3b_1x1", "Conv2d_4a_3x3")):
        put_cna(params, stats, f"ConvNormActivation_{i}", stem)

    block_branches = {
        "A": ["branch1x1", "branch5x5_1", "branch5x5_2",
              "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
        "B": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
        "C": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
              "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
        "D": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
              "branch7x7x3_3", "branch7x7x3_4"],
        "E": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
              "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
              "branch3x3dbl_3b", "branch_pool"],
    }
    mixed = [("Mixed_5b", "A", 0), ("Mixed_5c", "A", 1), ("Mixed_5d", "A", 2),
             ("Mixed_6a", "B", 0), ("Mixed_6b", "C", 0), ("Mixed_6c", "C", 1),
             ("Mixed_6d", "C", 2), ("Mixed_6e", "C", 3), ("Mixed_7a", "D", 0),
             ("Mixed_7b", "E", 0), ("Mixed_7c", "E", 1)]
    for blk, kind, idx in mixed:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for ci, br in enumerate(block_branches[kind]):
            put_cna(bp, bs, f"ConvNormActivation_{ci}", f"{blk}.{br}")
        params[f"Inception{kind}_{idx}"] = bp
        stats[f"Inception{kind}_{idx}"] = bs

    if "AuxLogits.conv0.conv.weight" in sd:
        ap: Dict[str, Any] = {}
        as_: Dict[str, Any] = {}
        put_cna(ap, as_, "ConvNormActivation_0", "AuxLogits.conv0")
        put_cna(ap, as_, "ConvNormActivation_1", "AuxLogits.conv1")
        ap["Dense_0"] = {"kernel": convert_linear(sd["AuxLogits.fc.weight"]),
                         "bias": jnp.asarray(_np(sd["AuxLogits.fc.bias"]))}
        params["AuxLogits"] = ap
        stats["AuxLogits"] = as_

    params["Dense_0"] = {"kernel": convert_linear(sd["fc.weight"]),
                         "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["inception3_from_torch"]


def convert_conv3d(w) -> jnp.ndarray:
    """torch conv3d (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)."""
    return jnp.asarray(_np(w).transpose(2, 3, 4, 1, 0))


def video_resnet_from_torch(state_dict: Mapping, arch: str) -> Dict:
    """torchvision VideoResNet state_dict -> our flax variables (reference
    ``video/resnet.py``: stem, layer1-4 of 2 BasicBlocks each, fc).
    ``arch`` in {"r3d_18", "mc3_18", "r2plus1d_18"} picks the per-stage
    conv builders (Conv3DSimple / Conv3DNoTemporal / Conv2Plus1D)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn3(prefix):
        return _bn(sd, prefix)

    if arch == "r2plus1d_18":
        conv_types = ["2plus1d"] * 4
        params["Conv_0"] = {"kernel": convert_conv3d(sd["stem.0.weight"])}
        p, s = bn3("stem.1")
        params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
        params["Conv_1"] = {"kernel": convert_conv3d(sd["stem.3.weight"])}
        p, s = bn3("stem.4")
        params["BatchNorm_1"], stats["BatchNorm_1"] = p, s
    else:
        conv_types = ["3d"] * 4 if arch == "r3d_18" else ["3d", "2d", "2d", "2d"]
        params["Conv_0"] = {"kernel": convert_conv3d(sd["stem.0.weight"])}
        p, s = bn3("stem.1")
        params["BatchNorm_0"], stats["BatchNorm_0"] = p, s

    bi = 0
    for li, ctype in enumerate(conv_types):
        for j in range(2):
            t = f"layer{li + 1}.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if ctype == "2plus1d":
                for ci, cv in enumerate(("conv1", "conv2")):
                    sub_p, sub_s = bn3(f"{t}.{cv}.0.1")
                    bp[f"Conv2Plus1D_{ci}"] = {
                        "Conv_0": {"kernel": convert_conv3d(sd[f"{t}.{cv}.0.0.weight"])},
                        "BatchNorm_0": sub_p,
                        "Conv_1": {"kernel": convert_conv3d(sd[f"{t}.{cv}.0.3.weight"])},
                    }
                    bs[f"Conv2Plus1D_{ci}"] = {"BatchNorm_0": sub_s}
                    p, s = bn3(f"{t}.{cv}.1")
                    bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"] = p, s
                ds_conv = "Conv_0"
            else:
                for ci, cv in enumerate(("conv1", "conv2")):
                    bp[f"Conv_{ci}"] = {"kernel": convert_conv3d(sd[f"{t}.{cv}.0.weight"])}
                    p, s = bn3(f"{t}.{cv}.1")
                    bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"] = p, s
                ds_conv = "Conv_2"
            if f"{t}.downsample.0.weight" in sd:
                bp[ds_conv] = {"kernel": convert_conv3d(sd[f"{t}.downsample.0.weight"])}
                p, s = bn3(f"{t}.downsample.1")
                bp["BatchNorm_2"], bs["BatchNorm_2"] = p, s
            params[f"VideoBasicBlock_{bi}"] = bp
            stats[f"VideoBasicBlock_{bi}"] = bs
            bi += 1

    params["Dense_0"] = {"kernel": convert_linear(sd["fc.weight"]),
                         "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["video_resnet_from_torch", "convert_conv3d"]


def s3d_from_torch(state_dict: Mapping) -> Dict:
    """torchvision S3D state_dict -> our flax variables (reference
    ``video/s3d.py``): features.* Conv3dNormActivation chains in call order
    (our S3D names convs/bns positionally), classifier.1 final conv."""
    sd = state_dict
    # conv-bn prefixes in call order: stem sep(2) + cna + sep(2), then 10
    # SepInceptionBlock3D x (b0: 1, b1: 1+2, b2: 1+2, b3: 1)
    prefixes = ["features.0.0", "features.0.1", "features.2", "features.3.0",
                "features.3.1"]
    incep = [5, 6, 8, 9, 10, 11, 12, 14, 15]
    for i in incep:
        t = f"features.{i}"
        prefixes += [f"{t}.branch0", f"{t}.branch1.0", f"{t}.branch1.1.0",
                     f"{t}.branch1.1.1", f"{t}.branch2.0", f"{t}.branch2.1.0",
                     f"{t}.branch2.1.1", f"{t}.branch3.1"]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for ci, pre in enumerate(prefixes):
        params[f"Conv_{ci}"] = {"kernel": convert_conv3d(sd[f"{pre}.0.weight"])}
        p, s = _bn(sd, f"{pre}.1")
        params[f"BatchNorm_{ci}"], stats[f"BatchNorm_{ci}"] = p, s
    n = len(prefixes)
    w = _np(sd["classifier.1.weight"])  # (O, I, 1, 1, 1) conv3d classifier
    params[f"Conv_{n}"] = {
        "kernel": jnp.asarray(w[:, :, 0].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(_np(sd["classifier.1.bias"]))}
    return {"params": params, "batch_stats": stats}


__all__ += ["s3d_from_torch"]


def _raft_cna(sd: Mapping, prefix: str, has_bn: bool = False):
    """torch Conv2dNormActivation inside RAFT (conv idx 0 with bias,
    optional BatchNorm idx 1) -> our _CNA subtree."""
    p: Dict[str, Any] = {"Conv_0": {"kernel": convert_conv(sd[f"{prefix}.0.weight"]),
                                    "bias": jnp.asarray(_np(sd[f"{prefix}.0.bias"]))}}
    s: Dict[str, Any] = {}
    if has_bn:
        bn_p, bn_s = _bn(sd, f"{prefix}.1")
        p["BatchNorm_0"] = bn_p
        s["BatchNorm_0"] = bn_s
    return p, s


def raft_from_torch(state_dict: Mapping, arch: str = "raft_large") -> Dict:
    """torchvision RAFT state_dict -> our flax variables (reference
    ``optical_flow/raft.py``: feature/context encoders, update block with
    motion encoder + recurrent GRUs + flow head, mask predictor)."""
    sd = state_dict
    large = arch == "raft_large"
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def encoder(name, bn):
        ep: Dict[str, Any] = {}
        es: Dict[str, Any] = {}

        def put(sub, prefix):
            p, s = _raft_cna(sd, prefix, bn)
            ep[sub] = p
            if s:
                es[sub] = s

        put("convnormrelu", f"{name}.convnormrelu")
        subs = (("convnormrelu1", "convnormrelu2", "downsample") if large
                else ("convnormrelu1", "convnormrelu2", "convnormrelu3", "downsample"))
        for li in (1, 2, 3):
            for j in (0, 1):
                t = f"{name}.layer{li}.{j}"
                bp: Dict[str, Any] = {}
                bs: Dict[str, Any] = {}
                for cna in subs:
                    if f"{t}.{cna}.0.weight" not in sd:
                        continue  # identity downsample
                    p, s = _raft_cna(sd, f"{t}.{cna}", bn)
                    bp[cna] = p
                    if s:
                        bs[cna] = s
                ep[f"layer{li}_{j}"] = bp
                if bs:
                    es[f"layer{li}_{j}"] = bs
        ep["conv"] = {"kernel": convert_conv(sd[f"{name}.conv.weight"]),
                      "bias": jnp.asarray(_np(sd[f"{name}.conv.bias"]))}
        params[name] = ep
        if es:
            stats[name] = es

    encoder("feature_encoder", bn=False)
    encoder("context_encoder", bn=large)

    up: Dict[str, Any] = {}
    me: Dict[str, Any] = {}
    t = "update_block.motion_encoder"
    for cna in ("convcorr1", "convcorr2", "convflow1", "convflow2", "conv"):
        if f"{t}.{cna}.0.weight" in sd:
            me[cna], _ = _raft_cna(sd, f"{t}.{cna}")
    up["motion_encoder"] = me
    rb: Dict[str, Any] = {}
    for gi, gru in enumerate(("convgru1", "convgru2")):
        if f"update_block.recurrent_block.{gru}.convz.weight" not in sd:
            continue
        rb[gru] = {
            c: {"kernel": convert_conv(sd[f"update_block.recurrent_block.{gru}.{c}.weight"]),
                "bias": jnp.asarray(_np(sd[f"update_block.recurrent_block.{gru}.{c}.bias"]))}
            for c in ("convz", "convr", "convq")}
    up["recurrent_block"] = rb
    up["flow_head"] = {
        c: {"kernel": convert_conv(sd[f"update_block.flow_head.{c}.weight"]),
            "bias": jnp.asarray(_np(sd[f"update_block.flow_head.{c}.bias"]))}
        for c in ("conv1", "conv2")}
    params["update_block"] = up

    if "mask_predictor.convrelu.0.weight" in sd:
        mp: Dict[str, Any] = {}
        mp["convrelu"], _ = _raft_cna(sd, "mask_predictor.convrelu")
        mp["conv"] = {"kernel": convert_conv(sd["mask_predictor.conv.weight"]),
                      "bias": jnp.asarray(_np(sd["mask_predictor.conv.bias"]))}
        params["mask_predictor"] = mp

    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


__all__ += ["raft_from_torch"]


def _dense_t(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": convert_linear(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _ln_t(sd: Mapping, prefix: str) -> Dict:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def maxvit_from_torch(state_dict: Mapping) -> Dict:
    """torchvision MaxVit state_dict -> our flax variables (reference
    ``maxvit.py``: stem, blocks.B.layers.L.layers.{MBconv, window_attention,
    grid_attention}, classifier).  maxvit_t layout: 4 stages of (2,2,5,2)
    MaxVitLayers, every first layer stride 2."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _cna(sd, "stem.0.0", "stem.0.1")
    params["Conv_0"] = p["Conv_0"]
    params["BatchNorm_0"] = p["BatchNorm_0"]
    stats["BatchNorm_0"] = s["BatchNorm_0"]
    params["Conv_1"] = _conv_b(sd, "stem.1.0")

    def bn(prefix):
        return _bn(sd, prefix)

    def attention(t):
        return {
            "Dense_0": _dense_t(sd, f"{t}.to_qkv"),
            "Dense_1": _dense_t(sd, f"{t}.merge"),
            "rel_bias": jnp.asarray(_np(sd[f"{t}.relative_position_bias_table"])),
        }

    bi = 0
    b = 0
    while f"blocks.{b}.layers.0.layers.MBconv.layers.conv_a.0.weight" in sd:
        li = 0
        while f"blocks.{b}.layers.{li}.layers.MBconv.layers.conv_a.0.weight" in sd:
            t = f"blocks.{b}.layers.{li}.layers"
            mb: Dict[str, Any] = {}
            mbs: Dict[str, Any] = {}
            # first layer of each stage strides (proj conv created first)
            ci = 0
            if f"{t}.MBconv.proj.1.weight" in sd:
                mb[f"Conv_{ci}"] = _conv_b(sd, f"{t}.MBconv.proj.1")
                ci += 1
            elif f"{t}.MBconv.proj.0.weight" in sd:
                mb[f"Conv_{ci}"] = _conv_b(sd, f"{t}.MBconv.proj.0")
                ci += 1
            p, s = bn(f"{t}.MBconv.layers.pre_norm")
            mb["BatchNorm_0"], mbs["BatchNorm_0"] = p, s
            mb[f"Conv_{ci}"] = {"kernel": convert_conv(sd[f"{t}.MBconv.layers.conv_a.0.weight"])}
            p, s = bn(f"{t}.MBconv.layers.conv_a.1")
            mb["BatchNorm_1"], mbs["BatchNorm_1"] = p, s
            mb[f"Conv_{ci + 1}"] = {"kernel": convert_conv(sd[f"{t}.MBconv.layers.conv_b.0.weight"])}
            p, s = bn(f"{t}.MBconv.layers.conv_b.1")
            mb["BatchNorm_2"], mbs["BatchNorm_2"] = p, s
            mb["SqueezeExcitation_0"] = {
                "Conv_0": _conv_b(sd, f"{t}.MBconv.layers.squeeze_excitation.fc1"),
                "Conv_1": _conv_b(sd, f"{t}.MBconv.layers.squeeze_excitation.fc2"),
            }
            mb[f"Conv_{ci + 2}"] = _conv_b(sd, f"{t}.MBconv.layers.conv_c")
            bp: Dict[str, Any] = {"MBConvBlock_0": mb}
            bs: Dict[str, Any] = {"MBConvBlock_0": mbs}
            for ai, at in enumerate(("window_attention", "grid_attention")):
                bp[f"LayerNorm_{2 * ai}"] = _ln_t(sd, f"{t}.{at}.attn_layer.0")
                bp[f"RelativeAttention_{ai}"] = attention(f"{t}.{at}.attn_layer.1")
                bp[f"LayerNorm_{2 * ai + 1}"] = _ln_t(sd, f"{t}.{at}.mlp_layer.0")
                bp[f"Dense_{2 * ai}"] = _dense_t(sd, f"{t}.{at}.mlp_layer.1")
                bp[f"Dense_{2 * ai + 1}"] = _dense_t(sd, f"{t}.{at}.mlp_layer.3")
            params[f"MaxVitBlock_{bi}"] = bp
            stats[f"MaxVitBlock_{bi}"] = bs
            bi += 1
            li += 1
        b += 1

    params["LayerNorm_0"] = _ln_t(sd, "classifier.2")
    params["Dense_0"] = _dense_t(sd, "classifier.3")
    params["Dense_1"] = {"kernel": convert_linear(sd["classifier.5.weight"])}
    return {"params": params, "batch_stats": stats}


__all__ += ["maxvit_from_torch"]


def mvit_from_torch(state_dict: Mapping) -> Dict:
    """torchvision (video) MViT state_dict -> our flax variables (reference
    ``video/mvit.py``; our module names mirror the torch attribute names:
    conv_proj, pos_encoding, blocks.N.{norm1, attn.{qkv, project.0,
    pool_q/k/v.{pool, norm_act.0}, rel_pos_*}, norm2, mlp.{0,3}, project},
    norm, head.1)."""
    sd = state_dict
    params: Dict[str, Any] = {}

    params["conv_proj"] = {"kernel": convert_conv3d(sd["conv_proj.weight"]),
                           "bias": jnp.asarray(_np(sd["conv_proj.bias"]))}
    pe: Dict[str, Any] = {"class_token": jnp.asarray(_np(sd["pos_encoding.class_token"]).reshape(-1))}
    if "pos_encoding.spatial_pos" in sd:
        pe["spatial_pos"] = jnp.asarray(_np(sd["pos_encoding.spatial_pos"]))
        pe["temporal_pos"] = jnp.asarray(_np(sd["pos_encoding.temporal_pos"]))
        pe["class_pos"] = jnp.asarray(_np(sd["pos_encoding.class_pos"]).reshape(-1))
    params["pos_encoding"] = pe

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        t = f"blocks.{i}"
        bp: Dict[str, Any] = {
            "norm1": _ln_t(sd, f"{t}.norm1"),
            "norm2": _ln_t(sd, f"{t}.norm2"),
            "mlp_fc1": _dense_t(sd, f"{t}.mlp.0"),
            "mlp_fc2": _dense_t(sd, f"{t}.mlp.3"),
        }
        at: Dict[str, Any] = {
            "qkv": _dense_t(sd, f"{t}.attn.qkv"),
            "project": _dense_t(sd, f"{t}.attn.project.0"),
        }
        for pool in ("pool_q", "pool_k", "pool_v"):
            if f"{t}.attn.{pool}.pool.weight" in sd:
                at[pool] = {
                    "pool_conv": {"kernel": convert_conv3d(sd[f"{t}.attn.{pool}.pool.weight"])},
                    "norm": _ln_t(sd, f"{t}.attn.{pool}.norm_act.0"),
                }
        for rp in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
            if f"{t}.attn.{rp}" in sd:
                at[rp] = jnp.asarray(_np(sd[f"{t}.attn.{rp}"]))
        bp["attn"] = at
        if f"{t}.project.weight" in sd:
            bp["project"] = _dense_t(sd, f"{t}.project")
        params[f"block{i}"] = bp
        i += 1

    params["norm"] = _ln_t(sd, "norm")
    params["head"] = _dense_t(sd, "head.1")
    return {"params": params}


__all__ += ["mvit_from_torch"]


def _subdict(sd: Mapping, prefix: str) -> Dict:
    pl = len(prefix) + 1
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def _fcn_head(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """torch FCNHead Sequential (0 conv, 1 bn, 4 conv) -> our FCNHead."""
    p: Dict[str, Any] = {"Conv_0": {"kernel": convert_conv(sd[f"{prefix}.0.weight"])}}
    bn_p, bn_s = _bn(sd, f"{prefix}.1")
    p["BatchNorm_0"] = bn_p
    p["Conv_1"] = _conv_b(sd, f"{prefix}.4")
    return p, {"BatchNorm_0": bn_s}


def _mobilenet_v3_backbone(sd: Mapping) -> Tuple[Dict, Dict]:
    """torch IntermediateLayerGetter over MobileNetV3-Large features
    ("0".."16") -> our inline backbone subtree (stem CNA_0, V3Block_0..14,
    head CNA_1).  Shared by the segmentation and detection wrappers."""
    from .mobilenet import _V3_LARGE

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    p, s = _cna(sd, "0.0", "0.1")
    params["ConvNormActivation_0"], stats["ConvNormActivation_0"] = p, s
    in_c = 16
    for bi, (k, exp, out_c, se, hs, stride) in enumerate(_V3_LARGE):
        t = f"{bi + 1}.block"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        li = ci = 0
        if exp != in_c:
            p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")
            bp[f"ConvNormActivation_{ci}"], bs[f"ConvNormActivation_{ci}"] = p, s
            li += 1
            ci += 1
        p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")
        bp[f"ConvNormActivation_{ci}"], bs[f"ConvNormActivation_{ci}"] = p, s
        li += 1
        ci += 1
        if se:
            bp["SqueezeExcitation_0"] = {
                "Conv_0": _conv_b(sd, f"{t}.{li}.fc1"),
                "Conv_1": _conv_b(sd, f"{t}.{li}.fc2"),
            }
            li += 1
        p, s = _cna(sd, f"{t}.{li}.0", f"{t}.{li}.1")
        bp[f"ConvNormActivation_{ci}"], bs[f"ConvNormActivation_{ci}"] = p, s
        params[f"V3Block_{bi}"] = bp
        stats[f"V3Block_{bi}"] = bs
        in_c = out_c
    p, s = _cna(sd, "16.0", "16.1")
    params["ConvNormActivation_1"], stats["ConvNormActivation_1"] = p, s
    return params, stats


def segmentation_from_torch(state_dict: Mapping, arch: str) -> Dict:
    """torchvision segmentation state_dict -> our flax variables.

    ``arch``: fcn_resnet50/101, deeplabv3_resnet50/101,
    deeplabv3_mobilenet_v3_large, lraspp_mobilenet_v3_large (reference
    ``segmentation/{fcn,deeplabv3,lraspp}.py``)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    has_aux = any(k.startswith("aux_classifier.") for k in sd)

    if arch == "lraspp_mobilenet_v3_large":
        bb = _subdict(sd, "backbone")
        p, s = _mobilenet_v3_backbone(bb)
        params.update(p)
        stats.update(s)
        params["Conv_0"] = {"kernel": convert_conv(sd["classifier.cbr.0.weight"])}
        bn_p, bn_s = _bn(sd, "classifier.cbr.1")
        params["BatchNorm_0"], stats["BatchNorm_0"] = bn_p, bn_s
        params["Conv_1"] = {"kernel": convert_conv(sd["classifier.scale.1.weight"])}
        params["Conv_2"] = _conv_b(sd, "classifier.high_classifier")
        params["Conv_3"] = _conv_b(sd, "classifier.low_classifier")
        return {"params": params, "batch_stats": stats}

    if "mobilenet" in arch:
        bp, bs = _mobilenet_v3_backbone(_subdict(sd, "backbone"))
    else:
        layers = (3, 4, 6, 3) if "resnet50" in arch else (3, 4, 23, 3)
        bbvars = resnet_from_torch(_subdict(sd, "backbone"), layers, True, with_fc=False)
        bp, bs = bbvars["params"], bbvars["batch_stats"]
    params["backbone"] = bp
    stats["backbone"] = bs

    if arch.startswith("fcn"):
        p, s = _fcn_head(sd, "classifier")
        params["FCNHead_0"], stats["FCNHead_0"] = p, s
        if has_aux:
            p, s = _fcn_head(sd, "aux_classifier")
            params["FCNHead_1"], stats["FCNHead_1"] = p, s
        return {"params": params, "batch_stats": stats}

    # deeplabv3: classifier.0 = ASPP, classifier.{1,2} conv+bn, classifier.4
    ap: Dict[str, Any] = {}
    as_: Dict[str, Any] = {}
    # convs.0 (1x1), convs.1-3 (rates), convs.4 (pool: [0]=pool, [1]=conv...)
    for ci in range(4):
        t = f"classifier.0.convs.{ci}"
        ap[f"Conv_{ci}"] = {"kernel": convert_conv(sd[f"{t}.0.weight"])}
        p, s = _bn(sd, f"{t}.1")
        ap[f"BatchNorm_{ci}"], as_[f"BatchNorm_{ci}"] = p, s
    ap["Conv_4"] = {"kernel": convert_conv(sd["classifier.0.convs.4.1.weight"])}
    p, s = _bn(sd, "classifier.0.convs.4.2")
    ap["BatchNorm_4"], as_["BatchNorm_4"] = p, s
    ap["Conv_5"] = {"kernel": convert_conv(sd["classifier.0.project.0.weight"])}
    p, s = _bn(sd, "classifier.0.project.1")
    ap["BatchNorm_5"], as_["BatchNorm_5"] = p, s
    params["ASPP_0"], stats["ASPP_0"] = ap, as_
    params["Conv_0"] = {"kernel": convert_conv(sd["classifier.1.weight"])}
    p, s = _bn(sd, "classifier.2")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    params["Conv_1"] = _conv_b(sd, "classifier.4")
    if has_aux:
        p, s = _fcn_head(sd, "aux_classifier")
        params["FCNHead_0"], stats["FCNHead_0"] = p, s
    return {"params": params, "batch_stats": stats}


__all__ += ["segmentation_from_torch"]


def _linear_from_chw(sd: Mapping, prefix: str, c: int, h: int, w: int) -> Dict:
    """torch Linear over a flattened CHW map -> ours over flattened HWC."""
    wt = _np(sd[f"{prefix}.weight"]).reshape(-1, c, h, w)
    wt = wt.transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
    return {"kernel": jnp.asarray(wt.T),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _fpn_from_torch(sd: Mapping, layer_names: Sequence[str], with_bn: bool) -> Tuple[Dict, Dict]:
    """torch FeaturePyramidNetwork (inner_blocks/layer_blocks) -> our
    FeaturePyramidNetwork named convs (inner_<layer>/layer_<layer>)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i, name in enumerate(layer_names):
        for tset, oset in (("inner_blocks", "inner"), ("layer_blocks", "layer")):
            if with_bn:
                p[f"{oset}_{name}"] = {"kernel": convert_conv(sd[f"backbone.fpn.{tset}.{i}.0.weight"])}
                bn_p, bn_s = _bn(sd, f"backbone.fpn.{tset}.{i}.1")
                p[f"{oset}_bn_{name}"] = bn_p
                s[f"{oset}_bn_{name}"] = bn_s
            else:
                p[f"{oset}_{name}"] = _conv_b(sd, f"backbone.fpn.{tset}.{i}.0")
    return p, s


def faster_rcnn_from_torch(state_dict: Mapping, arch: str = "fasterrcnn_resnet50_fpn") -> Dict:
    """torchvision R-CNN detector state_dict -> our flax variables.

    Covers fasterrcnn_resnet50_fpn(_v2), fasterrcnn_mobilenet_v3_large(_320)_fpn,
    maskrcnn_resnet50_fpn(_v2), keypointrcnn_resnet50_fpn (reference
    ``detection/{faster_rcnn,mask_rcnn,keypoint_rcnn}.py``)."""
    sd = state_dict
    v2 = arch.endswith("_v2")
    mobile = "mobilenet" in arch
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- backbone + fpn
    bb_sd = _subdict(sd, "backbone.body")
    if mobile:
        bp, bs = _mobilenet_v3_backbone(bb_sd)
        layer_names = ["layer3", "layer4"]
    else:
        bbvars = resnet_from_torch(bb_sd, (3, 4, 6, 3), True, with_fc=False)
        bp, bs = bbvars["params"], bbvars["batch_stats"]
        layer_names = ["layer1", "layer2", "layer3", "layer4"]
    fp, fs = _fpn_from_torch(sd, layer_names, with_bn=v2)
    fpn_p = {"backbone": bp, "FeaturePyramidNetwork_0": fp}
    fpn_s = {"backbone": bs}
    if fs:
        fpn_s["FeaturePyramidNetwork_0"] = fs
    params["backbone"] = fpn_p
    stats["backbone"] = fpn_s

    # ---- rpn head
    rp: Dict[str, Any] = {
        "conv": _conv_b(sd, "rpn.head.conv.0.0"),
        "cls_logits": _conv_b(sd, "rpn.head.cls_logits"),
        "bbox_pred": _conv_b(sd, "rpn.head.bbox_pred"),
    }
    if "rpn.head.conv.1.0.weight" in sd:
        rp["conv1"] = _conv_b(sd, "rpn.head.conv.1.0")
    params["rpn"] = {"head": rp}

    # ---- roi heads
    rh: Dict[str, Any] = {}
    rhs: Dict[str, Any] = {}
    if "roi_heads.box_head.fc6.weight" in sd:  # v1 TwoMLPHead
        rh["box_head"] = {
            "Dense_0": _linear_from_chw(sd, "roi_heads.box_head.fc6", 256, 7, 7),
            "Dense_1": _dense_t(sd, "roi_heads.box_head.fc7"),
        }
    else:  # v2 FastRCNNConvFCHead: 0..3 Conv2dNormActivation, 5 Linear
        bh: Dict[str, Any] = {}
        bhs: Dict[str, Any] = {}
        for i in range(4):
            bh[f"Conv_{i}"] = {"kernel": convert_conv(sd[f"roi_heads.box_head.{i}.0.weight"])}
            p, s = _bn(sd, f"roi_heads.box_head.{i}.1")
            bh[f"BatchNorm_{i}"] = p
            bhs[f"BatchNorm_{i}"] = s
        bh["Dense_0"] = _linear_from_chw(sd, "roi_heads.box_head.5", 256, 7, 7)
        rh["box_head"] = bh
        rhs["box_head"] = bhs
    rh["predictor"] = {
        "Dense_0": _dense_t(sd, "roi_heads.box_predictor.cls_score"),
        "Dense_1": _dense_t(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    params["roi_heads"] = rh
    if rhs:
        stats["roi_heads"] = rhs

    # ---- mask head (mask rcnn)
    if "roi_heads.mask_head.mask_fcn1.0.weight" in sd or "roi_heads.mask_head.0.0.weight" in sd:
        mh: Dict[str, Any] = {}
        mhs: Dict[str, Any] = {}
        for i in range(4):
            t = (f"roi_heads.mask_head.mask_fcn{i + 1}"
                 if f"roi_heads.mask_head.mask_fcn{i + 1}.0.weight" in sd
                 else f"roi_heads.mask_head.{i}")
            if f"{t}.1.running_mean" in sd:  # v2 BN head
                mh[f"mask_fcn{i + 1}"] = {"kernel": convert_conv(sd[f"{t}.0.weight"])}
                p, s = _bn(sd, f"{t}.1")
                mh[f"BatchNorm_{i}"] = p
                mhs[f"BatchNorm_{i}"] = s
            else:
                mh[f"mask_fcn{i + 1}"] = _conv_b(sd, f"{t}.0")
        wdc = _np(sd["roi_heads.mask_predictor.conv5_mask.weight"])  # (in, out, kh, kw)
        mh["mask_deconv"] = {"kernel": jnp.asarray(wdc.transpose(2, 3, 0, 1)),
                             "bias": jnp.asarray(_np(sd["roi_heads.mask_predictor.conv5_mask.bias"]))}
        mh["mask_logits"] = _conv_b(sd, "roi_heads.mask_predictor.mask_fcn_logits")
        params["mask_head"] = mh
        if mhs:
            stats["mask_head"] = mhs

    # ---- keypoint head (keypoint rcnn)
    if "roi_heads.keypoint_head.0.weight" in sd:
        kh: Dict[str, Any] = {}
        for i in range(8):
            kh[f"kps_fcn{i + 1}"] = _conv_b(sd, f"roi_heads.keypoint_head.{2 * i}")
        wdc = _np(sd["roi_heads.keypoint_predictor.kps_score_lowres.weight"])
        kh["kps_score_lowres"] = {"kernel": jnp.asarray(wdc.transpose(2, 3, 0, 1)),
                           "bias": jnp.asarray(_np(sd["roi_heads.keypoint_predictor.kps_score_lowres.bias"]))}
        params["keypoint_head"] = kh

    out: Dict[str, Any] = {"params": params, "batch_stats": stats}
    return out


__all__ += ["faster_rcnn_from_torch"]


def ssd300_from_torch(state_dict: Mapping) -> Dict:
    """torchvision ssd300_vgg16 state_dict -> our flax variables (reference
    ``detection/ssd.py:SSDFeatureExtractorVGG`` + ``SSDHead``).  Our inline
    VGG convs are auto-named Conv_0.. in call order; heads are named
    cls_head{i}/reg_head{i}."""
    sd = state_dict
    params: Dict[str, Any] = {}
    # VGG trunk convs in our call order -> torch keys
    trunk = ["backbone.features.0", "backbone.features.2",      # 64
             "backbone.features.5", "backbone.features.7",      # 128
             "backbone.features.10", "backbone.features.12", "backbone.features.14",  # 256
             "backbone.features.17", "backbone.features.19", "backbone.features.21",  # conv4
             "backbone.extra.0.1", "backbone.extra.0.3", "backbone.extra.0.5",        # conv5
             "backbone.extra.0.7.1", "backbone.extra.0.7.3",    # fc6 (atrous), fc7
             "backbone.extra.1.0", "backbone.extra.1.2",
             "backbone.extra.2.0", "backbone.extra.2.2",
             "backbone.extra.3.0", "backbone.extra.3.2",
             "backbone.extra.4.0", "backbone.extra.4.2"]
    for i, t in enumerate(trunk):
        params[f"Conv_{i}"] = _conv_b(sd, t)
    params["l2_scale"] = jnp.asarray(_np(sd["backbone.scale_weight"]))
    for i in range(6):
        params[f"cls_head{i}"] = _conv_b(sd, f"head.classification_head.module_list.{i}")
        params[f"reg_head{i}"] = _conv_b(sd, f"head.regression_head.module_list.{i}")
    return {"params": params}


__all__ += ["ssd300_from_torch"]


def _gn_t(sd: Mapping, prefix: str) -> Dict:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def retinanet_from_torch(state_dict: Mapping, arch: str = "retinanet_resnet50_fpn") -> Dict:
    """torchvision RetinaNet/FCOS state_dict -> our flax variables (reference
    ``detection/retinanet.py`` / ``fcos.py``): resnet50 body, 3-level FPN +
    P6/P7, shared cls/reg conv towers."""
    sd = state_dict
    fcos = arch.startswith("fcos")
    v2 = arch.endswith("_v2")
    gn = fcos or v2  # GroupNorm towers
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bbvars = resnet_from_torch(_subdict(sd, "backbone.body"), (3, 4, 6, 3), True,
                               with_fc=False)
    fp, fs = _fpn_from_torch(sd, ["layer2", "layer3", "layer4"], with_bn=False)
    p6p7 = {"p6": _conv_b(sd, "backbone.fpn.extra_blocks.p6"),
            "p7": _conv_b(sd, "backbone.fpn.extra_blocks.p7")}
    params["backbone"] = {"backbone": bbvars["params"],
                          "FeaturePyramidNetwork_0": fp,
                          "LastLevelP6P7_0": p6p7}
    stats["backbone"] = {"backbone": bbvars["batch_stats"]}

    hp: Dict[str, Any] = {}
    for i in range(4):
        if fcos:
            # flat Sequential: conv.{3i}=conv (bias), conv.{3i+1}=gn
            cls_conv = f"head.classification_head.conv.{3 * i}"
            reg_conv = f"head.regression_head.conv.{3 * i}"
            hp[f"cls_conv{i}"] = _conv_b(sd, cls_conv)
            hp[f"reg_conv{i}"] = _conv_b(sd, reg_conv)
            hp[f"cls_gn{i}"] = _gn_t(sd, f"head.classification_head.conv.{3 * i + 1}")
            hp[f"reg_gn{i}"] = _gn_t(sd, f"head.regression_head.conv.{3 * i + 1}")
        elif gn:  # retinanet v2: Conv2dNormActivation (conv no-bias, gn)
            tc = f"head.classification_head.conv.{i}"
            tr = f"head.regression_head.conv.{i}"
            hp[f"cls_conv{i}"] = {"kernel": convert_conv(sd[f"{tc}.0.weight"])}
            hp[f"reg_conv{i}"] = {"kernel": convert_conv(sd[f"{tr}.0.weight"])}
            hp[f"cls_gn{i}"] = _gn_t(sd, f"{tc}.1")
            hp[f"reg_gn{i}"] = _gn_t(sd, f"{tr}.1")
        else:
            hp[f"cls_conv{i}"] = _conv_b(sd, f"head.classification_head.conv.{i}.0")
            hp[f"reg_conv{i}"] = _conv_b(sd, f"head.regression_head.conv.{i}.0")
    hp["cls_logits"] = _conv_b(sd, "head.classification_head.cls_logits")
    hp["bbox_reg"] = _conv_b(sd, "head.regression_head.bbox_reg")
    if fcos:
        hp["ctrness"] = _conv_b(sd, "head.regression_head.bbox_ctrness")
    params["head"] = hp
    return {"params": params, "batch_stats": stats}


__all__ += ["retinanet_from_torch"]


def ssdlite_from_torch(state_dict: Mapping) -> Dict:
    """torchvision ssdlite320_mobilenet_v3_large state_dict -> our flax
    variables (reference ``detection/ssdlite.py``).  The reference splits the
    backbone at block 12's expand conv (features.0.13) and keeps the rest in
    features.1; our V3Block_12 owns both halves."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(dst_p, dst_s, name, conv_prefix, bn_prefix):
        p, s = _cna(sd, conv_prefix, bn_prefix)
        dst_p[name] = p
        dst_s[name] = s

    put(params, stats, "ConvNormActivation_0", "backbone.features.0.0.0", "backbone.features.0.0.1")

    def v3block(bi, prefix, se):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        li = ci = 0
        n_sub = 4 if se else 3
        has_expand = f"{prefix}.{n_sub - 3}.0.weight" in sd and n_sub - 3 == 1
        # determine expand presence by counting distinct sub-indices
        subs = sorted({int(k[len(prefix) + 1:].split(".")[0]) for k in sd
                       if k.startswith(prefix + ".")})
        idx = 0
        if len(subs) == (4 if se else 3):  # expand + dw (+se) + project
            put(bp, bs, f"ConvNormActivation_{ci}", f"{prefix}.{subs[idx]}.0", f"{prefix}.{subs[idx]}.1")
            idx += 1
            ci += 1
        put(bp, bs, f"ConvNormActivation_{ci}", f"{prefix}.{subs[idx]}.0", f"{prefix}.{subs[idx]}.1")
        idx += 1
        ci += 1
        if se:
            bp["SqueezeExcitation_0"] = {
                "Conv_0": _conv_b(sd, f"{prefix}.{subs[idx]}.fc1"),
                "Conv_1": _conv_b(sd, f"{prefix}.{subs[idx]}.fc2"),
            }
            idx += 1
        put(bp, bs, f"ConvNormActivation_{ci}", f"{prefix}.{subs[idx]}.0", f"{prefix}.{subs[idx]}.1")
        params[f"V3Block_{bi}"] = bp
        stats[f"V3Block_{bi}"] = bs

    from .mobilenet import _V3_LARGE

    for bi in range(12):
        v3block(bi, f"backbone.features.0.{bi + 1}.block", _V3_LARGE[bi][3])

    # block 12: expand at features.0.13 (a bare CNA), rest at features.1.0.{1,2,3}
    bp: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}
    put(bp, bs, "ConvNormActivation_0", "backbone.features.0.13.0", "backbone.features.0.13.1")
    put(bp, bs, "ConvNormActivation_1", "backbone.features.1.0.1.0", "backbone.features.1.0.1.1")
    bp["SqueezeExcitation_0"] = {
        "Conv_0": _conv_b(sd, "backbone.features.1.0.2.fc1"),
        "Conv_1": _conv_b(sd, "backbone.features.1.0.2.fc2"),
    }
    put(bp, bs, "ConvNormActivation_2", "backbone.features.1.0.3.0", "backbone.features.1.0.3.1")
    params["V3Block_12"] = bp
    stats["V3Block_12"] = bs

    for j, bi in enumerate((13, 14)):
        v3block(bi, f"backbone.features.1.{j + 1}.block", True)
    put(params, stats, "ConvNormActivation_1", "backbone.features.1.3.0", "backbone.features.1.3.1")

    for e in range(4):
        ep: Dict[str, Any] = {}
        es: Dict[str, Any] = {}
        for ci in range(3):
            put(ep, es, f"ConvNormActivation_{ci}", f"backbone.extra.{e}.{ci}.0",
                f"backbone.extra.{e}.{ci}.1")
        params[f"Block_{e}"] = ep
        stats[f"Block_{e}"] = es

    for i in range(6):
        for kind, tname in (("cls", "classification_head"), ("reg", "regression_head")):
            t = f"head.{tname}.module_list.{i}"
            p, s = _cna(sd, f"{t}.0.0", f"{t}.0.1")
            params[f"{kind}_dw{i}"] = p
            stats[f"{kind}_dw{i}"] = s
            params[f"{kind}_pw{i}"] = _conv_b(sd, f"{t}.1")
    return {"params": params, "batch_stats": stats}


__all__ += ["ssdlite_from_torch"]
