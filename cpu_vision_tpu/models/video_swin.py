"""Video Swin Transformer (reference
``torchvision/models/video/swin_transformer.py``): 3D shifted-window
attention over (T, H, W) tokens, spatial-only patch merging between stages.

TPU notes: window partition/reverse are reshape/transpose only; the cyclic
shift is a 3-axis ``jnp.roll``; per-window attention batches onto the MXU as
(B*nW, Wd*Wh*Ww, C) matmuls. Layout is NTHWC (channels-last video).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import PatchifyDense, StochasticDepth

__all__ = ["SwinTransformer3d", "swin3d_t", "swin3d_s", "swin3d_b"]


def _adapt_window(size_dhw, window, shift):
    """Per-dim window/shift adaptation (reference
    ``_get_window_and_shift_size``, ``video/swin_transformer.py:32-41``)."""
    window = list(window)
    shift = list(shift)
    for i in range(3):
        if size_dhw[i] <= window[i]:
            window[i] = size_dhw[i]
            shift[i] = 0
    return tuple(window), tuple(shift)


def _relative_position_index_3d(ws: Tuple[int, int, int]) -> np.ndarray:
    """(reference ``ShiftedWindowAttention3d.define_relative_position_index``,
    ``video/swin_transformer.py:272-290``)."""
    coords = np.stack(np.meshgrid(
        np.arange(ws[0]), np.arange(ws[1]), np.arange(ws[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1).astype(np.int32)


def _window_partition_3d(x, ws):
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, ws[0] * ws[1] * ws[2], c)


def _window_reverse_3d(windows, ws, b, t, h, w):
    x = windows.reshape(b, t // ws[0], h // ws[1], w // ws[2],
                        ws[0], ws[1], ws[2], -1)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, t, h, w, -1)


def _attention_mask_3d(size, ws, shift):
    """Window-id mask for wrapped windows (reference
    ``_compute_attention_mask_3d``, ``video/swin_transformer.py:71-105``)."""
    img_mask = np.zeros((1, *size, 1), np.float32)
    cnt = 0
    slices = [
        ((0, -ws[i]), (-ws[i], -shift[i] or None), (-shift[i] or None, None))
        if shift[i] else ((0, None),)
        for i in range(3)
    ]
    for ds in slices[0]:
        for hs in slices[1]:
            for wsl in slices[2]:
                img_mask[:, ds[0]:ds[1], hs[0]:hs[1], wsl[0]:wsl[1], :] = cnt
                cnt += 1
    mw = _window_partition_3d(jnp.asarray(img_mask), ws)[..., 0]  # (nW, vol)
    return jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)


class WindowAttention3d(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]  # full (module) window — sizes the table
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape  # (B*nW, vol, C) with vol = adapted-window volume
        ws = self.window_size
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.num_heads) ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        # the table is always sized for the full window; when the window
        # adapts to a smaller input the index is sliced [:vol, :vol]
        # (reference ``_get_relative_position_bias``,
        # ``video/swin_transformer.py:47-57``)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1), self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index_3d(ws)[:n, :n].reshape(-1))
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(b, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _WinAttn3dParams(nn.Module):
    """``WindowAttention3d``'s parameter tree as raw arrays for the fused
    kernel — slots identical (qkv/proj Dense + bias table) so converters,
    checkpoints and param-parity tests are unchanged."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol: int):
        from .swin import _SlotDense

        c, nh, ws = self.dim, self.num_heads, self.window_size
        wqkv, bqkv = _SlotDense((c, 3 * c), name="qkv")()
        wo, bo = _SlotDense((c, c), name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1), nh),
        )
        idx = jnp.asarray(_relative_position_index_3d(ws)[:vol, :vol].reshape(-1))
        bias = table[idx].reshape(vol, vol, nh).transpose(2, 0, 1)
        return wqkv, bqkv, wo, bo, bias


class SwinBlock3d(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    sd_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        ws, shift = _adapt_window((t, h, w), self.window_size, self.shift_size)
        pads = [(d + ws[i] - 1) // ws[i] * ws[i] for i, d in enumerate((t, h, w))]
        pt, ph, pw = pads
        shifted = sum(shift) > 0
        vol = ws[0] * ws[1] * ws[2]
        nw_img = (pt // ws[0]) * (ph // ws[1]) * (pw // ws[2])

        # fused path (same kernel as 2D swin, 3D windows flattened to
        # S = wt*wh*ww tokens; Kinetics 16x224^2 runs it at stages 1-3 —
        # stage 4's (24, 392, 392) bias exceeds the VMEM budget).
        # Unpadded maps only: LN ordering vs zero-padding differs otherwise.
        from ..ops.pallas.swin_attention import window_attention_block

        it = jnp.dtype(self.dtype).itemsize
        from ..ops.pallas.swin_attention import pick_group

        gsel = pick_group(b * nw_img, nw_img, self.num_heads, shifted)
        attn_fusable = (
            (not train or self.sd_prob == 0.0)
            and (pt, ph, pw) == (t, h, w)
            and c % 8 == 0 and vol % 8 == 0
            and (4 * c * c * it + self.num_heads * vol * vol * 4
                 + 2 * gsel * vol * c * (4 + it)
                 + vol * 3 * c * 4) <= 12_500_000)
        if attn_fusable:
            from .vision_transformer import _LNParams

            g0, b0 = _LNParams(c, name="LayerNorm_0")()
            wqkv, bqkv, wo, bo, bias = _WinAttn3dParams(
                c, self.num_heads, tuple(self.window_size), self.dtype,
                name="WindowAttention3d_0")(vol)
            mask = (_attention_mask_3d((pt, ph, pw), ws, shift)
                    if shifted else None)
            y = (jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
                 if shifted else x)
            out = window_attention_block(
                _window_partition_3d(y, ws), g0, b0,
                wqkv.astype(self.dtype), bqkv, wo.astype(self.dtype), bo,
                bias, mask, None, self.num_heads,
                float(c // self.num_heads) ** -0.5, 1e-5, False, nw_img,
                jax.default_backend() != "tpu")
            y = _window_reverse_3d(out, ws, b, pt, ph, pw)
            if shifted:
                y = jnp.roll(y, shift, axis=(1, 2, 3))
            x = y
        else:
            res = x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="LayerNorm_0")(x)
            if (pt, ph, pw) != (t, h, w):
                y = jnp.pad(y, ((0, 0), (0, pt - t), (0, ph - h),
                                (0, pw - w), (0, 0)))
            if shifted:
                y = jnp.roll(y, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
                mask = _attention_mask_3d((pt, ph, pw), ws, shift)
            else:
                mask = None
            windows = _window_partition_3d(y, ws)
            attn = WindowAttention3d(
                self.dim, self.num_heads, tuple(self.window_size), self.dtype,
                name="WindowAttention3d_0",
            )(windows, mask)
            y = _window_reverse_3d(attn, ws, b, pt, ph, pw)
            if shifted:
                y = jnp.roll(y, shift, axis=(1, 2, 3))
            if (pt, ph, pw) != (t, h, w):
                y = y[:, :t, :h, :w, :]
            x = res + StochasticDepth(self.sd_prob, "row")(y, train)

        dh = int(self.dim * self.mlp_ratio)
        mlp_fusable = ((not train or self.sd_prob == 0.0) and c % 8 == 0
                       and (2 * c * dh * it <= 10_000_000 or dh % 256 == 0))
        if mlp_fusable:
            from ..ops.pallas.transformer_block import mlp_block
            from .vision_transformer import _DenseParams, _LNParams

            g, bb = _LNParams(c, name="LayerNorm_1")()
            w1, b1 = _DenseParams((c, dh), name="Dense_0")()
            w2, b2 = _DenseParams((dh, c), name="Dense_1")()
            out = mlp_block(
                x.reshape(-1, c), g, bb, w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, 1e-5, 256,
                jax.default_backend() != "tpu")
            return out.reshape(x.shape)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="LayerNorm_1")(x)
        y = nn.Dense(dh, dtype=self.dtype, name="Dense_0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="Dense_1")(y)
        return x + StochasticDepth(self.sd_prob, "row")(y, train)


class PatchMerging3d(nn.Module):
    """Spatial-only patch merging on NTHWC (reference reuses the 2D
    ``PatchMerging`` over the trailing H, W dims, ``swin_transformer.py:448``)."""

    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            b, t, h, w, c = x.shape
        # channel order matches the reference concat x0..x3 =
        # [(h even, w even), (h odd, w even), (h even, w odd), (h odd, w odd)]
        # (``_patch_merging_pad``, ``swin_transformer.py:30-37``)
        x = x.reshape(b, t, h // 2, 2, w // 2, 2, c).transpose(0, 1, 2, 4, 5, 3, 6)
        x = x.reshape(b, t, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype)(x)


class SwinTransformer3d(nn.Module):
    """(reference ``SwinTransformer3d``, ``video/swin_transformer.py:366``).
    Input NTHWC; patch embed (2, 4, 4); window (8, 7, 7)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    sd_prob: float = 0.1
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = self.patch_size
        b, t, h, w, c = x.shape
        pads = [(d + ps[i] - 1) // ps[i] * ps[i] - d for i, d in enumerate((t, h, w))]
        if any(pads):
            x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))
        # patchify as space-to-depth matmul (models/layers.py:PatchifyDense)
        x = PatchifyDense(self.embed_dim, tuple(ps), dtype=self.dtype,
                          name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        total = sum(self.depths)
        bid = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * 2 ** stage
            for blk in range(depth):
                sd = self.sd_prob * bid / max(total - 1, 1)
                shift = tuple(0 if blk % 2 == 0 else wsz // 2
                              for wsz in self.window_size)
                x = SwinBlock3d(dim, heads, tuple(self.window_size), shift,
                                sd_prob=sd, dtype=self.dtype)(x, train)
                bid += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging3d(2 * dim, self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def _make(name, dim, depths, heads):
    def builder(*, num_classes: int = 400, dtype=jnp.float32):
        return SwinTransformer3d(
            embed_dim=dim, depths=depths, num_heads=heads,
            num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


# param parity vs reference (counted from the reference source):
# swin3d_t 28,158,070 / swin3d_s 49,816,678 / swin3d_b 88,048,984
swin3d_t = _make("swin3d_t", 96, (2, 2, 6, 2), (3, 6, 12, 24))
swin3d_s = _make("swin3d_s", 96, (2, 2, 18, 2), (3, 6, 12, 24))
swin3d_b = _make("swin3d_b", 128, (2, 2, 18, 2), (4, 8, 16, 32))
