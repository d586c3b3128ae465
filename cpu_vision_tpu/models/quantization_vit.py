"""End-to-end int8 PTQ inference engine for the ViT family.

The transformer twin of ``quantization_resnet.Int8ResNet``: weights are
per-output-channel symmetric int8, activations are quantised to static
per-tensor scales **inside** the fused Pallas kernels
(``ops/pallas/int8_transformer.py``) at the post-LN / post-gelu /
pre-out-projection sites, so int8 activations never ride HBM.  LayerNorm,
softmax and gelu stay f32 on the VPU.  Calibration is a one-graph float
pass recording |amax| at every quantisation site (observer-style PTQ, the
``torch.ao`` MinMaxObserver role).

The reference ships no quantized ViT (``models/quantization/`` is
CNN-only, see its ``models/quantization/__init__.py``) — this extends the
reference's fused-quantized-model design (``models/quantization/resnet.py``)
to the transformer zoo, where the MXU's 2x int8 MAC rate is otherwise
left on the table.

Usage::

    eng = Int8ViT.from_model(model, variables)   # quantise + introspect
    eng.calibrate(batches)                       # static activation scales
    fwd = jax.jit(eng)
    logits = fwd(images)
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas.int8_transformer import (
    attention_block_int8, mlp_block_int8, quantize_weight)
from ..ops.pallas.transformer_block import _gelu_f32, _ln_f32
from .layers import PatchifyDense

__all__ = ["Int8ViT"]


class _Layer:
    """One encoder block's folded parameters."""

    def __init__(self, p: Dict, d: int):
        self.g0 = jnp.asarray(p["LayerNorm_0"]["scale"], jnp.float32)
        self.b0 = jnp.asarray(p["LayerNorm_0"]["bias"], jnp.float32)
        mha = p["MultiHeadDotProductAttention_0"]
        w_qkv = jnp.concatenate(
            [jnp.asarray(mha[k]["kernel"], jnp.float32).reshape(d, d)
             for k in ("query", "key", "value")], axis=1)
        self.b_qkv = jnp.concatenate(
            [jnp.asarray(mha[k]["bias"], jnp.float32).reshape(d)
             for k in ("query", "key", "value")])
        w_o = jnp.asarray(mha["out"]["kernel"], jnp.float32).reshape(d, d)
        self.b_o = jnp.asarray(mha["out"]["bias"], jnp.float32).reshape(d)
        self.g1 = jnp.asarray(p["LayerNorm_1"]["scale"], jnp.float32)
        self.b1ln = jnp.asarray(p["LayerNorm_1"]["bias"], jnp.float32)
        w1 = jnp.asarray(p["Dense_0"]["kernel"], jnp.float32)
        self.b1 = jnp.asarray(p["Dense_0"]["bias"], jnp.float32)
        w2 = jnp.asarray(p["Dense_1"]["kernel"], jnp.float32)
        self.b2 = jnp.asarray(p["Dense_1"]["bias"], jnp.float32)

        self.qw_qkv, self.s_qkv = quantize_weight(w_qkv)
        self.qw_o, self.s_o = quantize_weight(w_o)
        self.qw1, self.s1 = quantize_weight(w1)
        self.qw2, self.s2 = quantize_weight(w2)
        # float copies for the calibration/oracle pass
        self.w_qkv, self.w_o, self.w1, self.w2 = w_qkv, w_o, w1, w2

    def floats(self) -> Dict:
        return {"g0": self.g0, "b0": self.b0, "w_qkv": self.w_qkv,
                "b_qkv": self.b_qkv, "w_o": self.w_o, "b_o": self.b_o,
                "g1": self.g1, "b1ln": self.b1ln, "w1": self.w1,
                "b1": self.b1, "w2": self.w2, "b2": self.b2}


class Int8ViT:
    """See module docstring.  Built by :meth:`from_model`."""

    def __init__(self, model, params):
        self.patch = model.patch_size
        self.heads = model.num_heads
        self.d = model.hidden_dim
        self.mlp_dim = model.mlp_dim
        self.num_classes = model.num_classes
        self.conv0 = params["Conv_0"]
        self.cls = jnp.asarray(params["class_token"], jnp.float32)
        self.pos = jnp.asarray(params["pos_embedding"], jnp.float32)
        self.layers: List[_Layer] = [
            _Layer(params[f"encoder_{i}"], self.d)
            for i in range(model.num_layers)]
        self.ln_f = params["LayerNorm_0"]
        self.head = params["Dense_0"]
        self.scales: Dict[str, jax.Array] | None = None
        self._sites: Dict[str, jax.Array] = {}

    @staticmethod
    def from_model(model, variables) -> "Int8ViT":
        return Int8ViT(model, variables["params"])

    # -------------------------------------------------------- shared graph

    def _record(self, f32, site: str):
        # functional amax collection: sites are gathered into a dict returned
        # from the (jittable) float graph, so calibration is ONE compiled
        # program per batch shape instead of an eager op stream with a host
        # readback per site (48 relay round-trips for ViT-B).
        # PER-CHANNEL amax: each channel (and so each attention head at the
        # attn_out site) gets its own int8 range; the scale is folded into
        # the quantized weight's rows, so it costs nothing at inference.
        flat = f32.reshape(-1, f32.shape[-1])
        self._sites[site] = jnp.max(jnp.abs(flat), axis=0)

    def _embed(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        pe = PatchifyDense(self.d, (self.patch, self.patch),
                           dtype=jnp.bfloat16)
        x = pe.apply({"params": self.conv0}, x)
        x = x.reshape(n, -1, self.d)
        cls = jnp.broadcast_to(self.cls, (n, 1, self.d)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        return (x + self.pos.astype(x.dtype)).astype(jnp.bfloat16)

    def _classify(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-6).apply({"params": self.ln_f},
                                             x.astype(jnp.float32))
        return nn.Dense(self.num_classes).apply({"params": self.head}, x[:, 0])

    def _layer_float(self, x, fp: Dict[str, jax.Array], i: int):
        """Float twin of the int8 kernels (calibration + oracle); matmuls in
        bf16 like the bf16 fused path, sites recorded in f32.  ``fp`` is a
        plain dict of this layer's float params (``_Layer.floats()``) so the
        jitted calibration graph takes the ~350 MB of weights as *arguments*
        rather than baked-in HLO constants (which overflow the remote-compile
        relay's request size limit)."""
        n, s, d = x.shape
        hd = d // self.heads
        x32 = x.astype(jnp.float32)
        h32 = _ln_f32(x32, fp["g0"], fp["b0"], 1e-6)
        self._record(h32, f"L{i}/attn_in")
        qkv = (jnp.dot(h32.reshape(-1, d).astype(jnp.bfloat16),
                       fp["w_qkv"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
               + fp["b_qkv"]).reshape(n, s, 3 * d).astype(jnp.bfloat16)
        q, k, v = [a.reshape(n, s, self.heads, hd)
                   for a in jnp.split(qkv, 3, axis=-1)]
        sc = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                        preferred_element_type=jnp.float32) / float(hd) ** 0.5
        p = jax.nn.softmax(sc, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, v,
                       preferred_element_type=jnp.float32).reshape(n, s, d)
        self._record(o, f"L{i}/attn_out")
        x32 = x32 + (jnp.dot(o.reshape(-1, d).astype(jnp.bfloat16),
                             fp["w_o"].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                     + fp["b_o"]).reshape(n, s, d)
        h32 = _ln_f32(x32, fp["g1"], fp["b1ln"], 1e-6)
        self._record(h32, f"L{i}/mlp_in")
        f = _gelu_f32(jnp.dot(h32.reshape(-1, d).astype(jnp.bfloat16),
                              fp["w1"].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) + fp["b1"])
        self._record(f, f"L{i}/mlp_gelu")
        x32 = x32 + (jnp.dot(f.astype(jnp.bfloat16),
                             fp["w2"].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                     + fp["b2"]).reshape(n, s, d)
        return x32.astype(jnp.bfloat16)

    def _layer_int8(self, x, ly: _Layer, i: int, interpret: bool):
        n, s, d = x.shape
        hd = d // self.heads
        sc = self.scales
        x = attention_block_int8(
            x, ly.g0, ly.b0, ly.qw_qkv, ly.s_qkv, ly.b_qkv, ly.qw_o,
            ly.s_o, ly.b_o, sc[f"L{i}/attn_in"], sc[f"L{i}/attn_out"],
            self.heads, 1.0 / float(hd) ** 0.5, 1e-6, interpret)
        out = mlp_block_int8(
            x.reshape(n * s, d), ly.g1, ly.b1ln, ly.qw1, ly.s1, ly.b1,
            ly.qw2, ly.s2, ly.b2, sc[f"L{i}/mlp_in"], sc[f"L{i}/mlp_gelu"],
            1e-6, 256, interpret)
        return out.reshape(n, s, d)

    # ------------------------------------------------------------- public

    def calibrate(self, batches: Sequence[jax.Array]) -> "Int8ViT":
        amax: Dict[str, np.ndarray] = {}
        fp = jax.jit(lambda flt, b: self._float_graph(flt, b)[1])
        flt = [ly.floats() for ly in self.layers]
        for b in batches:
            sites = jax.device_get(fp(flt, jnp.asarray(b)))
            for k, v in sites.items():
                v = np.asarray(v, np.float32)
                amax[k] = np.maximum(amax[k], v) if k in amax else v
        self.scales = {k: jnp.asarray(np.maximum(v, 1e-8) / 127.0)
                       for k, v in amax.items()}
        # re-quantize weights with the activation scales folded into the
        # rows: q_x[c] = round(x[c]/a_c) and w'[c,:] = w[c,:]*a_c give the
        # exact same product with per-channel activation ranges for free
        for i, ly in enumerate(self.layers):
            a_in = self.scales[f"L{i}/attn_in"][:, None]
            a_out = self.scales[f"L{i}/attn_out"][:, None]
            m_in = self.scales[f"L{i}/mlp_in"][:, None]
            m_g = self.scales[f"L{i}/mlp_gelu"][:, None]
            ly.qw_qkv, ly.s_qkv = quantize_weight(ly.w_qkv * a_in)
            ly.qw_o, ly.s_o = quantize_weight(ly.w_o * a_out)
            ly.qw1, ly.s1 = quantize_weight(ly.w1 * m_in)
            ly.qw2, ly.s2 = quantize_weight(ly.w2 * m_g)
        return self

    def _float_graph(self, flt: List[Dict], x: jax.Array):
        self._sites = {}
        x = self._embed(x)
        for i, fp in enumerate(flt):
            x = self._layer_float(x, fp, i)
        return self._classify(x), dict(self._sites)

    def float_reference(self, x: jax.Array) -> jax.Array:
        return self._float_graph([ly.floats() for ly in self.layers], x)[0]

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.scales is None:
            raise RuntimeError("call .calibrate(batches) before int8 inference")
        interpret = jax.default_backend() != "tpu"
        x = self._embed(x)
        for i, ly in enumerate(self.layers):
            x = self._layer_int8(x, ly, i, interpret)
        return self._classify(x)
