"""Swin Transformer (reference ``torchvision/models/swin_transformer.py``):
shifted-window attention with relative position bias, patch merging.

TPU notes: window partition is reshape/transpose only (no gathers); the
cyclic shift is ``jnp.roll``; attention is batched over windows on the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import PatchifyDense, StochasticDepth

__all__ = ["SwinTransformer", "swin_t", "swin_s", "swin_b",
           "swin_v2_t", "swin_v2_s", "swin_v2_b"]

# A/B levers (tools/swin_ab.py): route through the unfused XLA paths to
# attribute device time between the fused kernels and the glue around them.
FUSED_ATTENTION = True
FUSED_MLP = True


def _window_partition(x, ws: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(windows, ws: int, n: int, h: int, w: int):
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _shift_mask(ph: int, pw: int, ws: int, shift_h: int, shift_w: int):
    """(nW, ws*ws, ws*ws) additive attention mask for the wrapped windows
    of a cyclic shift (reference ``swin_transformer.py:165-176``)."""
    img_mask = np.zeros((1, ph, pw, 1), np.float32)
    cnt = 0
    h_slices = ((slice(0, -ws), slice(-ws, -shift_h), slice(-shift_h, None))
                if shift_h else (slice(0, None),))
    w_slices = ((slice(0, -ws), slice(-ws, -shift_w), slice(-shift_w, None))
                if shift_w else (slice(0, None),))
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = _window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, ws*ws)
    return jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _log_cpb_coords(ws: int) -> np.ndarray:
    """Log-spaced continuous relative coordinates (Swin V2, reference
    ``swin_transformer.py:ShiftedWindowAttentionV2``)."""
    rel = np.arange(-(ws - 1), ws, dtype=np.float32)
    ry, rx = np.meshgrid(rel, rel, indexing="ij")
    coords = np.stack([ry, rx], -1) / (ws - 1) * 8.0 if ws > 1 else np.zeros((1, 1, 2), np.float32)
    return np.sign(coords) * np.log2(np.abs(coords) + 1.0) / 3.0


class _QKV(nn.Module):
    """qkv projection; for V2 the key bias is zeroed at use (reference
    ``shifted_window_attention`` logit_scale branch,
    ``swin_transformer.py:175-178``)."""

    features: int
    zero_k_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.zero_k_bias:
            third = self.features // 3
            bias = bias.at[third : 2 * third].set(0.0)
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    v2: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape  # (windows, ws*ws, C)
        ws = self.window_size
        qkv = _QKV(3 * self.dim, zero_k_bias=self.v2, dtype=self.dtype, name="qkv")(x)
        # slice the flat (b, n, 3C) product instead of reshaping to
        # (b, n, 3, heads, hd): the 5-D reshape forces XLA to materialise
        # a full-tensor layout copy ({1,4,3,0,2}) that traced at ~23% of
        # swin_t device time; minor-dim slices + head splits fuse away.
        hd = c // self.num_heads
        q = qkv[..., :c].reshape(b, n, self.num_heads, hd)
        k = qkv[..., c:2 * c].reshape(b, n, self.num_heads, hd)
        v = qkv[..., 2 * c:].reshape(b, n, self.num_heads, hd)
        idx = jnp.asarray(_relative_position_index(ws)).reshape(-1)
        if self.v2:
            # cosine attention with learned per-head logit scale
            qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
            kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
            logit_scale = self.param(
                "logit_scale", nn.initializers.constant(np.log(10.0)), (self.num_heads, 1, 1)
            )
            attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn)
            attn = attn * jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))[None]
            # continuous position bias: 2-layer MLP over log coords
            coords = jnp.asarray(_log_cpb_coords(ws).reshape(-1, 2))
            hcpb = nn.relu(nn.Dense(512, dtype=self.dtype, name="cpb_fc1")(coords))
            table = nn.Dense(self.num_heads, use_bias=False, dtype=self.dtype, name="cpb_fc2")(hcpb)
            bias = 16.0 * nn.sigmoid(table[idx].reshape(n, n, self.num_heads)).transpose(2, 0, 1)
        else:
            scale = (c // self.num_heads) ** -0.5
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.normal(stddev=0.02),
                ((2 * ws - 1) ** 2, self.num_heads),
            )
            bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(b, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _SlotDense(nn.Module):
    """Parameter slots matching ``nn.Dense``/``_QKV`` (kernel + bias)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(), self.shape),
                self.param("bias", nn.initializers.zeros, (self.shape[1],)))


class _WinAttnParams(nn.Module):
    """The WindowAttention parameter tree (qkv / proj / position bias) as
    raw arrays for the fused Pallas kernel — slots identical to
    ``WindowAttention`` so converters and checkpoints are unchanged."""

    dim: int
    num_heads: int
    window_size: int
    v2: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        c, ws, nh = self.dim, self.window_size, self.num_heads
        n = ws * ws
        wqkv, bqkv = _SlotDense((c, 3 * c), name="qkv")()
        wo, bo = _SlotDense((c, c), name="proj")()
        idx = jnp.asarray(_relative_position_index(ws)).reshape(-1)
        if self.v2:
            bqkv = bqkv.at[c:2 * c].set(0.0)
            logit_scale = self.param(
                "logit_scale", nn.initializers.constant(np.log(10.0)), (nh, 1, 1))
            coords = jnp.asarray(_log_cpb_coords(ws).reshape(-1, 2))
            hcpb = nn.relu(nn.Dense(512, dtype=self.dtype, name="cpb_fc1")(coords))
            table = nn.Dense(nh, use_bias=False, dtype=self.dtype, name="cpb_fc2")(hcpb)
            bias = 16.0 * nn.sigmoid(table[idx].reshape(n, n, nh)).transpose(2, 0, 1)
            return wqkv, bqkv, wo, bo, bias, logit_scale.reshape(nh)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02), ((2 * ws - 1) ** 2, nh))
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        return wqkv, bqkv, wo, bo, bias, None


class MaskedLayerNorm(nn.Module):
    """LayerNorm whose statistics cover only the first ``count`` REAL
    channels of a zero-padded lane layout (channel-padded swin variant).
    Padded channels hold zeros, so sums over all channels equal sums over
    real ones; zero-padded scale/bias keep padded outputs at exactly zero.
    Param slots match ``nn.LayerNorm`` (scale/bias)."""

    count: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        m = jnp.sum(x32, -1, keepdims=True) / self.count
        v = jnp.sum(x32 * x32, -1, keepdims=True) / self.count - m * m
        y = (x32 - m) * jax.lax.rsqrt(v + self.epsilon)
        return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    sd_prob: float = 0.0
    v2: bool = False
    dtype: Any = jnp.float32
    # channel-padded variant (pad_dims experiment): number of REAL channels
    # when `dim` is zero-padded to a 128 lane multiple; 0 = dim (native).
    # LN statistics normalise over real_dim, the MLP hidden sizes off it,
    # and zero-padded weights keep padded lanes at exactly zero.
    real_dim: int = 0

    def _ln(self, name):
        real = self.real_dim
        if real and real != self.dim:
            return MaskedLayerNorm(real, epsilon=1e-5, dtype=self.dtype,
                                   name=name)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        ws = self.window_size
        # the reference never shrinks the window: it pads the feature map up
        # to window multiples and zeroes the shift per-dim when the window
        # covers the padded dim (``shifted_window_attention``,
        # ``swin_transformer.py:151-163``)
        ph = (h + ws - 1) // ws * ws
        pw = (w + ws - 1) // ws * ws
        shift_h = self.shift if ws < ph else 0
        shift_w = self.shift if ws < pw else 0
        shifted = shift_h + shift_w > 0

        from ..ops.pallas.swin_attention import (pick_group,
                                                 window_attention_block)

        it = jnp.dtype(self.dtype).itemsize
        nw_img = (ph // ws) * (pw // ws)
        nsq = ws * ws
        gsel = pick_group(n * nw_img, nw_img, self.num_heads, shifted)
        # fused path only on unpadded maps: the kernel LN-normalises raw
        # windows, which matches the reference only when no zero padding
        # mixes into a window (224-input swin never pads)
        attn_fusable = (
            FUSED_ATTENTION
            and (not train or self.sd_prob == 0.0) and (ph, pw) == (h, w)
            and c % 8 == 0
            and (4 * c * c * it + self.num_heads * nsq * nsq * 4
                 + 2 * gsel * nsq * c * (4 + it)
                 + nsq * 3 * c * 4) <= 12_500_000)
        if attn_fusable:
            # one VMEM-resident kernel for LN + QKV + windowed MSA +
            # position bias/shift mask + proj + residual
            # (ops/pallas/swin_attention.py — trace evidence in its
            # docstring); param slots identical to the unfused path.
            from .vision_transformer import _LNParams

            g0, b0 = _LNParams(c, name="LayerNorm_0")()
            wqkv, bqkv, wo, bo, bias, ls = _WinAttnParams(
                c, self.num_heads, ws, v2=self.v2, dtype=self.dtype,
                name="WindowAttention_0")()
            mask = _shift_mask(ph, pw, ws, shift_h, shift_w) if shifted else None
            y = jnp.roll(x, (-shift_h, -shift_w), axis=(1, 2)) if shifted else x
            out = window_attention_block(
                _window_partition(y, ws), g0, b0, wqkv.astype(self.dtype),
                bqkv, wo.astype(self.dtype), bo, bias, mask, ls,
                self.num_heads, float(c // self.num_heads) ** -0.5, 1e-5,
                self.v2, nw_img, jax.default_backend() != "tpu",
                self.real_dim if self.real_dim != c else 0)
            y = _window_reverse(out, ws, n, ph, pw)
            if shifted:
                y = jnp.roll(y, (shift_h, shift_w), axis=(1, 2))
            x = y
        else:
            res = x
            # V2 uses post-norm (norm applied to the branch output)
            y = x if self.v2 else self._ln("LayerNorm_0")(x)
            if (ph, pw) != (h, w):
                y = jnp.pad(y, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
            if shifted:
                y = jnp.roll(y, (-shift_h, -shift_w), axis=(1, 2))
                mask = _shift_mask(ph, pw, ws, shift_h, shift_w)
            else:
                mask = None
            windows = _window_partition(y, ws)
            attn = WindowAttention(self.dim, self.num_heads, ws, v2=self.v2,
                                   dtype=self.dtype)(windows, mask)
            y = _window_reverse(attn, ws, n, ph, pw)
            if shifted:
                y = jnp.roll(y, (shift_h, shift_w), axis=(1, 2))
            if (ph, pw) != (h, w):
                y = y[:, :h, :w, :]
            if self.v2:
                y = self._ln("LayerNorm_0")(y)
            x = res + StochasticDepth(self.sd_prob, "row")(y, train)

        dh = int((self.real_dim or self.dim) * self.mlp_ratio)
        it = jnp.dtype(self.dtype).itemsize
        # c need only be sublane-tileable: Mosaic pads a 96/192-lane minor
        # dim to 128 (25%/50% lane waste) which still beats the layouts XLA
        # picks for the unfused stage-1/2 MLPs by an order of magnitude
        # (fusion.210: 4.6 ms/iter for a 0.3 ms-at-peak matmul).
        fusable = (FUSED_MLP and (not train or self.sd_prob == 0.0) and c % 8 == 0
                   and (2 * c * dh * it <= 10_000_000 or dh % 256 == 0))
        if fusable:
            # fused MLP sub-block (ops/pallas/transformer_block.py):
            # LN + both matmuls + gelu + residual in one VMEM-resident
            # kernel; post_norm handles the v2 (post-norm) variant.
            # Param slots match the module path (LayerNorm_1/Dense_0/
            # Dense_1, flax auto-name order).
            from ..ops.pallas.transformer_block import mlp_block
            from .vision_transformer import _DenseParams, _LNParams

            g, b = _LNParams(c, name="LayerNorm_1")()
            w1, b1 = _DenseParams((c, dh), name="Dense_0")()
            w2, b2 = _DenseParams((dh, c), name="Dense_1")()
            out = mlp_block(
                x.reshape(-1, c), g, b, w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, 1e-5, 256,
                jax.default_backend() != "tpu", self.v2,
                self.real_dim if self.real_dim != c else 0,
            )
            return out.reshape(x.shape)

        y = x if self.v2 else self._ln("LayerNorm_1")(x)
        y = nn.Dense(dh, dtype=self.dtype, name="Dense_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="Dense_1")(y)
        if self.v2:
            # v2's only LN in this sub-block — same LayerNorm_1 slot the
            # v1 pre-norm (and the fused path) uses
            y = self._ln("LayerNorm_1")(y)
        return x + StochasticDepth(self.sd_prob, "row")(y, train)


class PatchMerging(nn.Module):
    """(reference ``swin_transformer.py:PatchMerging`` / ``PatchMergingV2``).
    V1 norms the 4C concat before reduction; V2 norms the 2C output after."""

    dim_out: int
    v2: bool = False
    dtype: Any = jnp.float32
    # channel-padded variant: real channels per input feature vector (the
    # LN over the 4C concat normalises over 4*real_in) and in the output
    real_in: int = 0
    real_out: int = 0

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # pad odd spatial dims (reference pads with F.pad before merging)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            n, h, w, c = x.shape
        # channel order matches the reference concat x0..x3 =
        # [(h even, w even), (h odd, w even), (h even, w odd), (h odd, w odd)]
        # (``_patch_merging_pad``, ``swin_transformer.py:30-37``)
        x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(n, h // 2, w // 2, 4 * c)
        if self.v2:
            x = nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype)(x)
            if self.real_out and self.real_out != self.dim_out:
                return MaskedLayerNorm(self.real_out, epsilon=1e-5,
                                       dtype=self.dtype,
                                       name="LayerNorm_0")(x)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.real_in and 4 * self.real_in != 4 * c:
            x = MaskedLayerNorm(4 * self.real_in, epsilon=1e-5,
                                dtype=self.dtype, name="LayerNorm_0")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype)(x)


class SwinTransformer(nn.Module):
    """(reference ``swin_transformer.py:SwinTransformer``)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    sd_prob: float = 0.2
    num_classes: int = 1000
    v2: bool = False
    dtype: Any = jnp.float32
    # round every stage's channel dim up to the 128-lane tile (96 -> 128,
    # 192 -> 256): padded lanes carry exact zeros (masked LN + zero-padded
    # weights), head count scales to keep head_dim, and the K-contractions
    # run at full MXU lane occupancy (tools/k96_ab.py: K=96 mlp matmul
    # 6.26 -> 3.94 ms zero-padded to 128).  Weight converter:
    # models/swin_padded.pad_swin_variables.
    pad_channels: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pdim(real):
            return -(-real // 128) * 128 if self.pad_channels else real

        # patchify as space-to-depth matmul (models/layers.py:PatchifyDense)
        real = self.embed_dim
        x = PatchifyDense(pdim(real), (4, 4), dtype=self.dtype, name="Conv_0")(x)
        if pdim(real) != real:
            x = MaskedLayerNorm(real, epsilon=1e-5, dtype=self.dtype,
                                name="LayerNorm_0")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        total = sum(self.depths)
        bid = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            if stage > 0:
                real_prev, real = real, real * 2
                x = PatchMerging(pdim(real), v2=self.v2, dtype=self.dtype,
                                 real_in=real_prev if pdim(real_prev) != real_prev or pdim(real) != real else 0,
                                 real_out=real)(x)
            dim = pdim(real)
            hd = real // heads
            x_heads = dim // hd
            for blk in range(depth):
                sd = self.sd_prob * bid / max(total - 1, 1)
                x = SwinBlock(
                    dim, x_heads, self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    sd_prob=sd, v2=self.v2, dtype=self.dtype,
                    real_dim=real if dim != real else 0,
                )(x, train)
                bid += 1
        # padded mode: keep the native auto-name slot (stem=LayerNorm_0,
        # final=LayerNorm_1) so converted checkpoints line up
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="LayerNorm_1" if self.pad_channels else None)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _make(name, dim, depths, heads, sd, v2=False, window=7):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return SwinTransformer(dim, depths, heads, window, sd, num_classes, v2, dtype)

    builder.__name__ = name
    return register_model(name)(builder)


swin_t = _make("swin_t", 96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2)
swin_s = _make("swin_s", 96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3)
swin_b = _make("swin_b", 128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5)
# V2: cosine attention + post-norm + log-CPB, window 8 (reference swin_v2_*)
swin_v2_t = _make("swin_v2_t", 96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2, v2=True, window=8)
swin_v2_s = _make("swin_v2_s", 96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3, v2=True, window=8)
swin_v2_b = _make("swin_v2_b", 128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5, v2=True, window=8)
