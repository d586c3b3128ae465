"""RAFT-Stereo depth estimation (reference
``torchvision/prototype/models/depth/stereo/raft_stereo.py``, 719 lines):
shared-base feature/context encoders, an **epipolar (1-D) correlation
pyramid**, a multi-level ConvGRU hierarchy, and learned convex upsampling
of the 1-channel disparity field.

TPU notes: because stereo correlation is per-row, the all-pairs volume is a
batched (N*H) x W x W matmul on the MXU (``einsum('nhic,nhjc->nhij')``) —
much cheaper than optical flow's 2-D volume.  The 1-D pyramid lookup is two
gather taps per offset.  All GRU iterations run a fixed count for static
shapes under ``jit``.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .optical_flow import ConvGRU, FeatureEncoder

__all__ = ["RaftStereo", "raft_stereo_base", "raft_stereo_realtime"]


def _corr_pyramid_1d(f1: jax.Array, f2: jax.Array, num_levels: int) -> List[jax.Array]:
    """Per-row correlation + x-axis avg-pool pyramid (reference
    ``CorrPyramid1d``, ``raft_stereo.py:257-296``).

    f1, f2: (N, H, W, C) left/right features -> levels of
    (N, H, W, W/2^l): correlation of left pixel (h, i) with right pixels
    (h, j/2^l).
    """
    c = f1.shape[-1]
    corr = jnp.einsum("nhic,nhjc->nhij", f1, f2) / jnp.sqrt(jnp.float32(c))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        w2 = corr.shape[-1] // 2 * 2  # floor odd widths, like torch avg_pool1d
        corr = corr[..., :w2].reshape(*corr.shape[:-1], w2 // 2, 2).mean(axis=-1)
        pyramid.append(corr)
    return pyramid


def _lookup_1d(corr: jax.Array, x: jax.Array, radius: int) -> jax.Array:
    """Sample a (2r+1)-tap window around ``x`` along the last axis with
    linear interpolation (reference ``CorrBlock1d``, ``raft_stereo.py:298-340``).

    corr: (N, H, W, Wl); x: (N, H, W) in level coordinates -> (N, H, W, 2r+1).
    """
    wl = corr.shape[-1]
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    xs = x[..., None] + offs  # (N, H, W, K)
    x0 = jnp.floor(xs)
    t = xs - x0
    out = jnp.zeros(xs.shape, corr.dtype)
    for dxi, wgt in ((0, 1.0 - t), (1, t)):
        xi = jnp.clip(x0 + dxi, 0, wl - 1).astype(jnp.int32)
        out = out + jnp.take_along_axis(corr, xi, axis=-1) * wgt
    return out


class _MotionEncoder(nn.Module):
    """Correlation + disparity -> motion features (reference
    ``MotionEncoder`` with 1-channel flow, ``raft_stereo.py:171-186`` via
    ``raft.py:MotionEncoder``)."""

    out: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr, disp):
        c = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(c))
        f = nn.relu(nn.Conv(64, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype)(disp))
        f = nn.relu(nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(f))
        m = nn.relu(nn.Conv(self.out - 1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([m, disp], axis=-1)


def _avgpool2(x):
    return nn.avg_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])


def _up2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), "bilinear")


class _MultiLevelUpdate(nn.Module):
    """GRU hierarchy over ``num_levels`` resolutions (reference
    ``MultiLevelUpdateBlock``, ``raft_stereo.py:171-244``): level 0 is the
    finest and receives motion features; each level's GRU input is the
    2x-avg-pooled hidden state of the finer level and the 2x-upsampled
    hidden state of the coarser level."""

    hidden: int = 128
    num_levels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hiddens, contexts, motion, update_fine: bool = True):
        grus = [ConvGRU(self.hidden, self.dtype, name=f"gru{i}")
                for i in range(self.num_levels)]
        hiddens = list(hiddens)
        # coarse -> fine, as the reference iterates in reversed order
        for i in range(self.num_levels - 1, -1, -1):
            if i == 0 and not update_fine:  # slow-fast: coarse-only pass
                continue
            feats = [contexts[i]]
            if i == 0:
                feats.append(motion)
            else:
                feats.append(_avgpool2(hiddens[i - 1]))
            if i < self.num_levels - 1:
                feats.append(_up2(hiddens[i + 1]))
            hiddens[i] = grus[i](hiddens[i], jnp.concatenate(feats, axis=-1))
        return hiddens


def _upsample_disparity(disp: jax.Array, mask: jax.Array, factor: int) -> jax.Array:
    """Learned convex upsampling of the 1-channel disparity (reference
    ``raft_stereo.py:342`` via ``raft.py:upsample_flow``, generalised to
    the encoder's downsampling factor)."""
    n, h, w, _ = disp.shape
    mask = mask.reshape(n, h, w, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=3)
    pad = jnp.pad(disp * factor, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)], axis=3
    )  # (N, H, W, 9, 1)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", mask, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * factor, w * factor, 1)


class RaftStereo(nn.Module):
    """(reference ``RaftStereo``, ``raft_stereo.py:342-470``).

    Returns the list of upsampled 1-channel disparity maps, one per GRU
    iteration (last = final), matching the reference's output contract.
    """

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    context: int = 128
    num_gru_levels: int = 3
    downsample: int = 4  # feature resolution 1 / downsample
    slow_fast: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        n, h, w, _ = left.shape
        f = self.downsample
        # both reference variants share the 64-wide BaseEncoder (raft_stereo.py:27)
        fenc = FeatureEncoder(256, base=64, norm="instance",
                              dtype=self.dtype, name="feature_encoder")
        cenc = FeatureEncoder(self.num_gru_levels * (self.hidden + self.context),
                              norm="none", dtype=self.dtype, name="context_encoder")

        def enc_at(enc, x):
            y = enc(2 * x - 1.0)
            if f == 4:  # encoders natively emit 1/8; upsample once for 1/4
                y = _up2(y)
            return y

        f1 = enc_at(fenc, left)
        f2 = enc_at(fenc, right)
        ctx = enc_at(cenc, left)

        hiddens, contexts = [], []
        cur = ctx
        for i in range(self.num_gru_levels):
            sl = cur[..., : self.hidden + self.context]
            cur = cur[..., self.hidden + self.context :]
            if i > 0:
                sl = _avgpool2(sl) if i == 1 else _avgpool2(_avgpool2(sl))
            hiddens.append(jnp.tanh(sl[..., : self.hidden]))
            # reference pre-convolves each context (raft_stereo.py:403-406)
            contexts.append(nn.relu(nn.Conv(
                self.context, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                name=f"context_conv{i}")(sl[..., self.hidden :])))

        pyramid = _corr_pyramid_1d(f1, f2, self.corr_levels)
        hf, wf = f1.shape[1], f1.shape[2]
        x0 = jnp.broadcast_to(jnp.arange(wf, dtype=jnp.float32)[None, None, :], (n, hf, wf))
        x1 = x0

        update = _MultiLevelUpdate(self.hidden, self.num_gru_levels,
                                   dtype=self.dtype, name="update_block")
        menc = _MotionEncoder(dtype=self.dtype, name="motion_encoder")
        disp_head = nn.Sequential([
            nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype),
            nn.relu,
            nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype),
        ], name="disparity_head")
        mask_head = nn.Sequential([
            nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype),
            nn.relu,
            nn.Conv(f * f * 9, (1, 1), dtype=self.dtype),
        ], name="mask_predictor")

        disps = []
        for _ in range(self.iters):
            x1 = jax.lax.stop_gradient(x1)
            taps = [_lookup_1d(corr, x1 / (2.0**lvl), self.corr_radius)
                    for lvl, corr in enumerate(pyramid)]
            corr_feat = jnp.concatenate(taps, axis=-1)
            disp = (x1 - x0)[..., None]
            motion = menc(corr_feat, disp)
            if self.slow_fast:  # extra coarse-only update (paper §3.4)
                hiddens = update(hiddens, contexts, motion, update_fine=False)
            hiddens = update(hiddens, contexts, motion)
            delta = disp_head(hiddens[0])
            x1 = x1 + delta[..., 0]
            up_mask = mask_head(hiddens[0]) * 0.25
            disps.append(_upsample_disparity((x1 - x0)[..., None], up_mask, f))
        return disps


@register_model("raft_stereo_base")
def raft_stereo_base(*, iters: int = 12, dtype=jnp.float32) -> RaftStereo:
    """(reference ``raft_stereo.py:raft_stereo_base``: 1/4-resolution
    features, 3 GRU levels)."""
    return RaftStereo(iters=iters, num_gru_levels=3, downsample=4, dtype=dtype)


@register_model("raft_stereo_realtime")
def raft_stereo_realtime(*, iters: int = 7, dtype=jnp.float32) -> RaftStereo:
    """(reference ``raft_stereo.py:raft_stereo_realtime``: 1/8-resolution
    features, 2 GRU levels, slow-fast GRU, 7 iterations)."""
    return RaftStereo(iters=iters, num_gru_levels=2, downsample=8,
                      slow_fast=True, dtype=dtype)
