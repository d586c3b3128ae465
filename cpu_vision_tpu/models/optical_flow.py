"""RAFT optical flow (reference ``torchvision/models/optical_flow/raft.py``,
947 lines): feature/context encoders, all-pairs correlation pyramid, ConvGRU
update operator with lookup, learned convex upsampling.

TPU notes: the correlation volume is one big einsum on the MXU; the lookup
is a batched bilinear gather; the recurrent updates run a fixed iteration
count (static shapes).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["RAFT", "raft_large", "raft_small"]


class ResidualBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "instance"
    dtype: Any = jnp.float32

    def _norm(self, x):
        if self.norm == "instance":
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        y = nn.relu(self._norm(y))
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(y)
        y = nn.relu(self._norm(y))
        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.strides, self.strides), dtype=self.dtype)(x)
        return nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """(reference ``raft.py:FeatureEncoder``): 1/8-resolution features."""

    out_channels: int = 256
    base: int = 64
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], dtype=self.dtype)(x)
        x = nn.relu(x)
        for i, (c, s) in enumerate([(self.base, 1), (self.base * 3 // 2, 2), (self.base * 2, 2)]):
            x = ResidualBlock(c, s, self.norm, self.dtype)(x)
            x = ResidualBlock(c, 1, self.norm, self.dtype)(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)


def _corr_pyramid(f1: jax.Array, f2: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """All-pairs correlation + avg-pool pyramid (reference ``CorrBlock``).

    f1, f2: (N, H, W, C) -> levels of (N, H*W, H/2^l, W/2^l)."""
    n, h, w, c = f1.shape
    corr = jnp.einsum("nijc,nklc->nijkl", f1, f2) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = []
    for _ in range(num_levels):
        pyramid.append(corr.reshape(n, h * w, corr.shape[1], corr.shape[2]))
        corr = nn.avg_pool(corr, (2, 2), (2, 2))
    return pyramid


def _bilinear_lookup(corr: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Sample a (2r+1)^2 window around ``coords`` from each correlation map.

    corr (N, HW, Hl, Wl); coords (N, HW, 2) in level coordinates ->
    (N, HW, (2r+1)^2)."""
    n, hw, hl, wl = corr.shape
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    offs = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (K, 2) as (x, y)
    k = offs.shape[0]
    x = coords[..., 0:1] + offs[None, None, :, 0]  # (N, HW, K)
    y = coords[..., 1:2] + offs[None, None, :, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    out = jnp.zeros((n, hw, k), corr.dtype)
    flat = corr.reshape(n, hw, hl * wl)
    for dyi, wy in ((0, 1.0 - ty), (1, ty)):
        for dxi, wx in ((0, 1.0 - tx), (1, tx)):
            yi = jnp.clip(y0 + dyi, 0, hl - 1).astype(jnp.int32)
            xi = jnp.clip(x0 + dxi, 0, wl - 1).astype(jnp.int32)
            valid = (y + dyi >= 0) & (y + dyi <= hl - 1 + 1) & (x + dxi >= 0) & (x + dxi <= wl - 1 + 1)
            idx = yi * wl + xi
            tap = jnp.take_along_axis(flat, idx, axis=2)
            out = out + tap * (wy * wx)
    return out


class ConvGRU(nn.Module):
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    """Motion encoder + GRU + flow head (+ upsample mask) (reference
    ``raft.py:UpdateBlock``/``MotionEncoder``/``FlowHead``)."""

    hidden: int = 128
    mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, context, corr, flow):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(f))
        motion = nn.relu(nn.Conv(128 - 2, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(
            jnp.concatenate([c, f], axis=-1)))
        motion = jnp.concatenate([motion, flow], axis=-1)
        h = ConvGRU(self.hidden, self.dtype)(h, jnp.concatenate([context, motion], axis=-1))
        fh = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(h))
        delta = nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(fh)
        up_mask = None
        if self.mask:
            m = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(h))
            up_mask = nn.Conv(8 * 8 * 9, (1, 1), dtype=self.dtype)(m) * 0.25
        return h, delta, up_mask


def _upsample_flow(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Learned convex upsampling x8 (reference ``upsample_flow``)."""
    n, h, w, _ = flow.shape
    mask = mask.reshape(n, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighbourhood of the coarse flow
    pad = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)], axis=3
    )  # (N, H, W, 9, 2)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", mask, neigh)  # (N,H,W,8,8,2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 8, w * 8, 2)
    return up


class RAFT(nn.Module):
    """(reference ``raft.py:RAFT``)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    context: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        """Returns the list of upsampled flow predictions (last = final)."""
        n, h, w, _ = image1.shape
        fenc = FeatureEncoder(256, norm="instance", dtype=self.dtype, name="feature_encoder")
        cenc = FeatureEncoder(self.hidden + self.context, norm="none", dtype=self.dtype,
                              name="context_encoder")
        f1 = fenc(2 * image1 - 1.0)
        f2 = fenc(2 * image2 - 1.0)
        ctx = cenc(2 * image1 - 1.0)
        hidden = jnp.tanh(ctx[..., : self.hidden])
        context = nn.relu(ctx[..., self.hidden :])

        pyramid = _corr_pyramid(f1, f2, self.corr_levels)
        h8, w8 = f1.shape[1], f1.shape[2]
        ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.stack([xs, ys], axis=-1)[None]  # (1, H8, W8, 2)
        coords0 = jnp.broadcast_to(coords0, (n, h8, w8, 2))
        coords1 = coords0

        update = UpdateBlock(self.hidden, mask=True, dtype=self.dtype, name="update_block")
        flows = []
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            lookup = []
            for lvl, corr in enumerate(pyramid):
                c = coords1.reshape(n, h8 * w8, 2) / (2.0**lvl)
                lookup.append(_bilinear_lookup(corr, c, self.corr_radius))
            corr_feat = jnp.concatenate(lookup, axis=-1).reshape(n, h8, w8, -1)
            flow = coords1 - coords0
            hidden, delta, up_mask = update(hidden, context, corr_feat, flow)
            coords1 = coords1 + delta
            flows.append(_upsample_flow(coords1 - coords0, up_mask))
        return flows


@register_model("raft_large")
def raft_large(*, iters: int = 12, dtype=jnp.float32) -> RAFT:
    return RAFT(iters=iters, dtype=dtype)


@register_model("raft_small")
def raft_small(*, iters: int = 12, dtype=jnp.float32) -> RAFT:
    return RAFT(iters=iters, corr_levels=4, corr_radius=3, hidden=96, context=64, dtype=dtype)
