"""RAFT optical flow (reference ``torchvision/models/optical_flow/raft.py``,
947 lines): feature/context encoders, all-pairs correlation pyramid, ConvGRU
update operator with lookup, learned convex upsampling.

Structural parity with the reference builders:
``raft_large`` — ResidualBlock encoders (feature: InstanceNorm, context:
BatchNorm), (256, 192)/(128, 64) motion encoder, two-pass SepConv GRU
((1,5)+(5,1)), mask predictor (``raft.py:838-875``).
``raft_small`` — BottleneckBlock encoders (context norm None), (96,)/(64, 32)
motion encoder -> 82 channels, single 3x3 GRU, no mask (``raft.py:896-945``).

TPU notes: the correlation volume is one big einsum on the MXU; the lookup
is a batched bilinear gather; the recurrent updates run a fixed iteration
count (static shapes).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["RAFT", "raft_large", "raft_small"]


def _instance_norm(x):
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial norm."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class _CNA(nn.Module):
    """Conv2dNormActivation as RAFT instantiates it: conv WITH bias (see the
    frozen-BN note at ``raft.py:33-38``), then norm, then optional relu."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    norm: Optional[str] = "instance"  # "instance" | "batch" | None
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel
        pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
        x = nn.Conv(self.features, self.kernel, (self.strides, self.strides),
                    padding=pad, use_bias=True, dtype=self.dtype)(x)
        if self.norm == "instance":
            x = _instance_norm(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class RaftResidualBlock(nn.Module):
    """(reference ``raft.py:ResidualBlock``)."""

    features: int
    strides: int = 1
    norm: Optional[str] = "instance"
    always_project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _CNA(self.features, (3, 3), self.strides, self.norm,
                 dtype=self.dtype, name="convnormrelu1")(x, train)
        y = _CNA(self.features, (3, 3), 1, self.norm,
                 dtype=self.dtype, name="convnormrelu2")(y, train)
        if self.strides != 1 or self.always_project:
            x = _CNA(self.features, (1, 1), self.strides, self.norm, act=False,
                     dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class RaftBottleneckBlock(nn.Module):
    """(reference ``raft.py:BottleneckBlock``)."""

    features: int
    strides: int = 1
    norm: Optional[str] = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.features // 4
        y = _CNA(q, (1, 1), 1, self.norm, dtype=self.dtype, name="convnormrelu1")(x, train)
        y = _CNA(q, (3, 3), self.strides, self.norm, dtype=self.dtype, name="convnormrelu2")(y, train)
        y = _CNA(self.features, (1, 1), 1, self.norm, dtype=self.dtype, name="convnormrelu3")(y, train)
        if self.strides != 1:
            x = _CNA(self.features, (1, 1), self.strides, self.norm, act=False,
                     dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(x + y)


class RaftFeatureEncoder(nn.Module):
    """(reference ``raft.py:FeatureEncoder``): 7x7/2 stem, three 2-block
    stages, 1x1 output conv; downsamples by 8."""

    layers: Sequence[int] = (64, 64, 96, 128, 256)
    block: str = "residual"  # "residual" | "bottleneck"
    norm: Optional[str] = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = RaftResidualBlock if self.block == "residual" else RaftBottleneckBlock
        x = _CNA(self.layers[0], (7, 7), 2, self.norm,
                 dtype=self.dtype, name="convnormrelu")(x, train)
        strides = (1, 2, 2)
        for li in range(3):
            for j, s in enumerate((strides[li], 1)):
                x = blk(self.layers[li + 1], s, self.norm, dtype=self.dtype,
                        name=f"layer{li + 1}_{j}")(x, train)
        return nn.Conv(self.layers[4], (1, 1), use_bias=True,
                       dtype=self.dtype, name="conv")(x)


class RaftMotionEncoder(nn.Module):
    """(reference ``raft.py:MotionEncoder``)."""

    corr_layers: Sequence[int] = (256, 192)
    flow_layers: Sequence[int] = (128, 64)
    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr_features):
        c = _CNA(self.corr_layers[0], (1, 1), norm=None,
                 dtype=self.dtype, name="convcorr1")(corr_features)
        if len(self.corr_layers) == 2:
            c = _CNA(self.corr_layers[1], (3, 3), norm=None,
                     dtype=self.dtype, name="convcorr2")(c)
        f = _CNA(self.flow_layers[0], (7, 7), norm=None,
                 dtype=self.dtype, name="convflow1")(flow)
        f = _CNA(self.flow_layers[1], (3, 3), norm=None,
                 dtype=self.dtype, name="convflow2")(f)
        cf = _CNA(self.out_channels - 2, (3, 3), norm=None,
                  dtype=self.dtype, name="conv")(jnp.concatenate([c, f], axis=-1))
        return jnp.concatenate([cf, flow], axis=-1)


class ConvGRU(nn.Module):
    """Convolutional GRU (reference ``raft.py:ConvGRU``).  Also used by
    RAFT-Stereo's multi-level update block (``stereo.py``)."""

    hidden: int = 128
    dtype: Any = jnp.float32
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, h, x):
        kh, kw = self.kernel
        pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]

        def conv(name):
            return nn.Conv(self.hidden, self.kernel, padding=pad,
                           dtype=self.dtype, name=name)

        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv("convz")(hx))
        r = nn.sigmoid(conv("convr")(hx))
        q = jnp.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class RaftRecurrentBlock(nn.Module):
    """(reference ``raft.py:RecurrentBlock``): one 3x3 GRU (small) or the
    separable (1,5)+(5,1) GRU pair (large)."""

    hidden: int = 128
    kernels: Sequence[Tuple[int, int]] = ((1, 5), (5, 1))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        h = ConvGRU(self.hidden, self.dtype, tuple(self.kernels[0]), name="convgru1")(h, x)
        if len(self.kernels) == 2:
            h = ConvGRU(self.hidden, self.dtype, tuple(self.kernels[1]), name="convgru2")(h, x)
        return h


class RaftFlowHead(nn.Module):
    """(reference ``raft.py:FlowHead``)."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv2")(x)


class RaftUpdateBlock(nn.Module):
    """(reference ``raft.py:UpdateBlock``)."""

    hidden: int = 128
    corr_layers: Sequence[int] = (256, 192)
    flow_layers: Sequence[int] = (128, 64)
    motion_out: int = 128
    gru_kernels: Sequence[Tuple[int, int]] = ((1, 5), (5, 1))
    flow_head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, context, corr, flow):
        motion = RaftMotionEncoder(self.corr_layers, self.flow_layers,
                                   self.motion_out, self.dtype,
                                   name="motion_encoder")(flow, corr)
        x = jnp.concatenate([context, motion], axis=-1)
        h = RaftRecurrentBlock(self.hidden, self.gru_kernels, self.dtype,
                               name="recurrent_block")(h, x)
        delta = RaftFlowHead(self.flow_head_hidden, self.dtype, name="flow_head")(h)
        return h, delta


class RaftMaskPredictor(nn.Module):
    """(reference ``raft.py:MaskPredictor``): x0.25 gradient downweighting."""

    hidden: int = 256
    multiplier: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _CNA(self.hidden, (3, 3), norm=None, dtype=self.dtype, name="convrelu")(x)
        x = nn.Conv(8 * 8 * 9, (1, 1), dtype=self.dtype, name="conv")(x)
        return self.multiplier * x


def _corr_pyramid(f1: jax.Array, f2: jax.Array, num_levels: int = 4) -> List[jax.Array]:
    """All-pairs correlation + avg-pool pyramid (reference
    ``raft.py:CorrBlock.build_pyramid``).

    f1, f2: (N, H, W, C) -> levels of (N, H*W, H/2^l, W/2^l).  Pooling stops
    early on tiny test inputs (the reference hard-errors below 16x16)."""
    n, h, w, c = f1.shape
    corr = jnp.einsum("nijc,nklc->nijkl", f1, f2) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = []
    for _ in range(num_levels):
        pyramid.append(corr.reshape(n, h * w, corr.shape[1], corr.shape[2]))
        if corr.shape[1] >= 2 and corr.shape[2] >= 2:
            corr = nn.avg_pool(corr, (2, 2), (2, 2))
    return pyramid


def _bilinear_lookup(corr: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Sample a (2r+1)^2 window around ``coords`` from each correlation map.

    corr (N, HW, Hl, Wl); coords (N, HW, 2) in level coordinates ->
    (N, HW, (2r+1)^2).  Matches ``grid_sample(..., align_corners=True)``
    with zero padding (reference ``CorrBlock.index_pyramid``): out-of-range
    taps contribute 0, and the window channel order is x-major (the
    reference adds its ``delta[..., 0]`` to the x coordinate)."""
    n, hw, hl, wl = corr.shape
    w = 2 * radius + 1
    win = w + 1                       # bilinear needs one extra row/col
    # TPU redesign: the original 4 x K ``take_along_axis`` gathers along the
    # minor (lane) axis traced at ~20 ms EACH on the 56x128 level (the hot
    # op of the whole model, 12 iters x 4 levels); a single structured
    # (win, win)-patch gather per level replaces them.  The window offsets
    # are a fixed integer grid around the (shared-fraction) centre, so ALL
    # 4*K taps live in one (win, win) patch at base = floor(c) - radius,
    # and zero-padding the map by ``win`` reproduces the out-of-range-
    # taps-contribute-0 rule exactly.  Bases that would clamp correspond to
    # fully-out-of-range windows -> masked to 0.  The pad is loop-invariant
    # across the 12 refinement iterations (XLA CSEs the copies).
    p = win
    padded = jnp.pad(corr, ((0, 0), (0, 0), (p, p), (p, p)))
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None, None]    # (N, HW, 1, 1) — same frac for all taps
    ty = (y - y0)[..., None, None]
    bu_y = y0.astype(jnp.int32) - radius + p
    bu_x = x0.astype(jnp.int32) - radius + p
    base_y = jnp.clip(bu_y, 0, hl + 2 * p - win)
    base_x = jnp.clip(bu_x, 0, wl + 2 * p - win)
    flatm = padded.reshape(n * hw, hl + 2 * p, wl + 2 * p)
    # one explicit patch-gather: (row, by, bx) -> (win, win) slices.  A
    # vmapped dynamic_slice lowers to SERIAL while loops on TPU (traced at
    # ~9.6 ms per call site); lax.gather with 2-D slice_sizes does not.
    rows = jnp.arange(n * hw, dtype=jnp.int32)
    starts = jnp.stack([rows, base_y.reshape(-1), base_x.reshape(-1)], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    patch = jax.lax.gather(flatm, starts, dnums, (1, win, win),
                           mode=jax.lax.GatherScatterMode.CLIP)
    patch = patch.reshape(n, hw, win, win)
    out_yx = (patch[:, :, :w, :w] * (1 - ty) * (1 - tx)
              + patch[:, :, :w, 1:] * (1 - ty) * tx
              + patch[:, :, 1:, :w] * ty * (1 - tx)
              + patch[:, :, 1:, 1:] * ty * tx)      # (N, HW, y-off, x-off)
    ok = ((bu_y == base_y) & (bu_x == base_x))[..., None, None]
    out_yx = jnp.where(ok, out_yx, 0.0)
    # reference channel order is x-major (di moves x and varies slowly)
    return out_yx.transpose(0, 1, 3, 2).reshape(n, hw, w * w)


def _upsample_flow(flow: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Learned convex upsampling x8, or align_corners bilinear when no mask
    (reference ``_utils.py:upsample_flow``)."""
    n, h, w, _ = flow.shape
    if mask is None:
        nh, nw = h * 8, w * 8
        ys = jnp.linspace(0.0, h - 1.0, nh)
        xs = jnp.linspace(0.0, w - 1.0, nw)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        ty = (ys - y0)[None, :, None, None]
        tx = (xs - x0)[None, None, :, None]
        g = 8.0 * flow
        top = g[:, y0][:, :, x0] * (1 - tx) + g[:, y0][:, :, x1] * tx
        bot = g[:, y1][:, :, x0] * (1 - tx) + g[:, y1][:, :, x1] * tx
        return top * (1 - ty) + bot * ty
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
    """(reference ``raft.py:RAFT``).  Like the reference, inputs are
    expected pre-normalized to [-1, 1] (the OpticalFlow preset does
    ``2x - 1``); returns the per-iteration list of upsampled flows."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    context: int = 128
    encoder_layers: Sequence[int] = (64, 64, 96, 128, 256)
    context_layers: Sequence[int] = (64, 64, 96, 128, 256)
    block: str = "residual"
    context_norm: Optional[str] = "batch"
    corr_layers: Sequence[int] = (256, 192)
    flow_layers: Sequence[int] = (128, 64)
    motion_out: int = 128
    gru_kernels: Sequence[Tuple[int, int]] = ((1, 5), (5, 1))
    flow_head_hidden: int = 256
    use_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        """Returns the list of upsampled flow predictions (last = final)."""
        n, h, w, _ = image1.shape
        fenc = RaftFeatureEncoder(self.encoder_layers, self.block, "instance",
                                  self.dtype, name="feature_encoder")
        cenc = RaftFeatureEncoder(self.context_layers, self.block,
                                  self.context_norm, self.dtype,
                                  name="context_encoder")
        # reference runs both images through one batch (raft.py:492)
        fmaps = fenc(jnp.concatenate([image1, image2], axis=0), train)
        f1, f2 = fmaps[:n], fmaps[n:]
        ctx = cenc(image1, train)
        hidden = jnp.tanh(ctx[..., : self.hidden])
        context = nn.relu(ctx[..., self.hidden :])

        pyramid = _corr_pyramid(f1, f2, self.corr_levels)
        h8, w8 = f1.shape[1], f1.shape[2]
        ys, xs = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.stack([xs, ys], axis=-1)[None]  # (1, H8, W8, 2)
        coords0 = jnp.broadcast_to(coords0, (n, h8, w8, 2))
        coords1 = coords0

        update = RaftUpdateBlock(self.hidden, self.corr_layers, self.flow_layers,
                                 self.motion_out, self.gru_kernels,
                                 self.flow_head_hidden, self.dtype,
                                 name="update_block")
        maskp = (RaftMaskPredictor(256, 0.25, self.dtype, name="mask_predictor")
                 if self.use_mask else None)
        flows = []
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            lookup = []
            for lvl, corr in enumerate(pyramid):
                c = coords1.reshape(n, h8 * w8, 2) / (2.0**lvl)
                lookup.append(_bilinear_lookup(corr, c, self.corr_radius))
            corr_feat = jnp.concatenate(lookup, axis=-1).reshape(n, h8, w8, -1)
            flow = coords1 - coords0
            hidden, delta = update(hidden, context, corr_feat, flow)
            coords1 = coords1 + delta
            up_mask = maskp(hidden) if maskp is not None else None
            flows.append(_upsample_flow(coords1 - coords0, up_mask))
        return flows


class FeatureEncoder(nn.Module):
    """Legacy simple encoder kept for RAFT-Stereo (``stereo.py``): stem +
    three 2-block stages + 1x1 out conv, instance/no norm, auto-named
    submodules (the stereo param tree depends on this structure)."""

    out_channels: int = 256
    base: int = 64
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], dtype=self.dtype)(x)
        x = nn.relu(x)
        for c, s in [(self.base, 1), (self.base * 3 // 2, 2), (self.base * 2, 2)]:
            x = ResidualBlock(c, s, self.norm, self.dtype)(x)
            x = ResidualBlock(c, 1, self.norm, self.dtype)(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)


class ResidualBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "instance"
    dtype: Any = jnp.float32

    def _norm(self, x):
        return _instance_norm(x) if self.norm == "instance" else x

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




@register_model("raft_large")
def raft_large(*, iters: int = 12, dtype=jnp.float32) -> RAFT:
    """(reference ``raft.py:raft_large`` config, ``raft.py:838-875``)."""
    return RAFT(iters=iters, dtype=dtype)


@register_model("raft_small")
def raft_small(*, iters: int = 12, dtype=jnp.float32) -> RAFT:
    """(reference ``raft.py:raft_small`` config, ``raft.py:896-945``)."""
    return RAFT(
        iters=iters,
        corr_levels=4,
        corr_radius=3,
        hidden=96,
        context=64,
        encoder_layers=(32, 32, 64, 96, 128),
        context_layers=(32, 32, 64, 96, 160),
        block="bottleneck",
        context_norm=None,
        corr_layers=(96,),
        flow_layers=(64, 32),
        motion_out=82,
        gru_kernels=((3, 3),),
        flow_head_hidden=128,
        use_mask=False,
        dtype=dtype,
    )
