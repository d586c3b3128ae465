"""Video Swin: param parity with the reference counts, and logits equality
against a torch oracle that recreates the reference architecture with
torchvision's exact module layout/naming (``torchvision/models/video/
swin_transformer.py``) — the same portability proof as ResNet in
``test_torch_weights.py``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cpu_vision_tpu import models
from cpu_vision_tpu.models.torch_weights import swin3d_from_torch

# counted from the reference model definition (see models/video_swin.py)
REF_NUM_PARAMS = {"swin3d_t": 28_158_070, "swin3d_s": 49_816_678,
                  "swin3d_b": 88_048_984}


class TestParamParity:
    @pytest.mark.parametrize("name,expected", sorted(REF_NUM_PARAMS.items()))
    def test_param_parity(self, name, expected):
        m = models.get_model(name)
        x = jnp.ones((1, 8, 64, 64, 3), jnp.float32)
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        n = int(sum(np.prod(p.shape) for p in jax.tree.leaves(v["params"])))
        assert n == expected, f"{name}: {n} != {expected}"


# ---- torch oracle (reference layout/naming) --------------------------------

def _rel_index_3d(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws[0]), torch.arange(ws[1]), torch.arange(ws[2]),
        indexing="ij"))
    flat = coords.flatten(1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


class TorchShiftedWindowAttention3d(nn.Module):
    """reference ``ShiftedWindowAttention3d`` + ``shifted_window_attention_3d``
    (``video/swin_transformer.py:115-318``)."""

    def __init__(self, dim, window_size, shift_size, num_heads):
        super().__init__()
        self.window_size = list(window_size)
        self.shift_size = list(shift_size)
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        ws = self.window_size
        self.relative_position_bias_table = nn.Parameter(torch.zeros(
            (2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1), num_heads))
        nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)
        self.register_buffer("relative_position_index", _rel_index_3d(ws))

    def forward(self, x):
        b, t, h, w, c = x.shape
        ws, shift = list(self.window_size), list(self.shift_size)
        size = [t, h, w]
        for i in range(3):
            if size[i] <= ws[i]:
                ws[i] = size[i]
                shift[i] = 0
        vol = ws[0] * ws[1] * ws[2]
        bias = self.relative_position_bias_table[
            self.relative_position_index[:vol, :vol].flatten()
        ].view(vol, vol, -1).permute(2, 0, 1).unsqueeze(0)

        pad = [(ws[i] - size[i] % ws[i]) % ws[i] for i in range(3)]
        x = F.pad(x, (0, 0, 0, pad[2], 0, pad[1], 0, pad[0]))
        _, tp, hp, wp, _ = x.shape
        if sum(shift) > 0:
            x = torch.roll(x, (-shift[0], -shift[1], -shift[2]), dims=(1, 2, 3))
        nw = (tp // ws[0]) * (hp // ws[1]) * (wp // ws[2])
        x = x.view(b, tp // ws[0], ws[0], hp // ws[1], ws[1], wp // ws[2], ws[2], c)
        x = x.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * nw, vol, c)
        qkv = self.qkv(x).reshape(x.size(0), vol, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (c // self.num_heads) ** -0.5).matmul(k.transpose(-2, -1))
        attn = attn + bias
        if sum(shift) > 0:
            mask = x.new_zeros(tp, hp, wp)
            slices = [((0, -ws[i]), (-ws[i], -shift[i]), (-shift[i], None))
                      for i in range(3)]
            cnt = 0
            for d in slices[0]:
                for hh in slices[1]:
                    for wsl in slices[2]:
                        mask[d[0]:d[1], hh[0]:hh[1], wsl[0]:wsl[1]] = cnt
                        cnt += 1
            mask = mask.view(tp // ws[0], ws[0], hp // ws[1], ws[1],
                             wp // ws[2], ws[2])
            mask = mask.permute(0, 2, 4, 1, 3, 5).reshape(nw, vol)
            mask = mask.unsqueeze(1) - mask.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
            attn = attn.view(b, nw, self.num_heads, vol, vol) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, vol, vol)
        attn = F.softmax(attn, dim=-1)
        x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), vol, c)
        x = self.proj(x)
        x = x.view(b, tp // ws[0], hp // ws[1], wp // ws[2], ws[0], ws[1], ws[2], c)
        x = x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if sum(shift) > 0:
            x = torch.roll(x, (shift[0], shift[1], shift[2]), dims=(1, 2, 3))
        return x[:, :t, :h, :w, :].contiguous()


class TorchSwinBlock(nn.Module):
    """reference ``SwinTransformerBlock`` (norm1/attn/norm2/mlp.{0..4})."""

    def __init__(self, dim, num_heads, window_size, shift_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchShiftedWindowAttention3d(dim, window_size, shift_size, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(4 * dim, dim), nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchPatchMerging(nn.Module):
    """reference 2D ``PatchMerging`` over trailing H, W dims."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        b, t, h, w, c = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class TorchPatchEmbed3d(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.proj = nn.Conv3d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):  # B C T H W
        x = self.proj(x)
        x = x.permute(0, 2, 3, 4, 1)
        return self.norm(x)


class TorchSwin3d(nn.Module):
    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                 window_size=(8, 7, 7), num_classes=13):
        super().__init__()
        self.patch_embed = TorchPatchEmbed3d([2, 4, 4], embed_dim)
        layers = []
        for i, (depth, heads) in enumerate(zip(depths, num_heads)):
            dim = embed_dim * 2 ** i
            stage = [TorchSwinBlock(dim, heads, window_size,
                                    [0 if j % 2 == 0 else w // 2 for w in window_size])
                     for j in range(depth)]
            layers.append(nn.Sequential(*stage))
            if i < len(depths) - 1:
                layers.append(TorchPatchMerging(dim))
        self.features = nn.Sequential(*layers)
        self.norm = nn.LayerNorm(embed_dim * 2 ** (len(depths) - 1))
        self.head = nn.Linear(embed_dim * 2 ** (len(depths) - 1), num_classes)

    def forward(self, x):  # B C T H W
        x = self.patch_embed(x)
        x = self.features(x)
        x = self.norm(x)
        x = x.permute(0, 4, 1, 2, 3)
        x = x.mean(dim=(2, 3, 4))
        return self.head(x)


class TestLogitsParity:
    @pytest.mark.parametrize("thw", [(4, 32, 32), (8, 56, 56)])
    def test_swin3d_logits_match_torch(self, rng, thw):
        """(8,56,56): patch grid (4,14,14) exercises shifted windows +
        attention masks; (4,32,32): grid (2,8,8) exercises per-dim window
        adaptation and the bias-index slice."""
        torch.manual_seed(0)
        # tiny config, same topology
        tm = TorchSwin3d(embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                         num_classes=13).eval()
        t, h, w = thw
        x = rng.standard_normal((1, t, h, w, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

        from cpu_vision_tpu.models.video_swin import SwinTransformer3d

        m = SwinTransformer3d(embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                              num_classes=13)
        variables = swin3d_from_torch(tm.state_dict(), depths=(1, 2))
        out = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-5)

    def test_converted_tree_matches_init(self, rng):
        torch.manual_seed(1)
        tm = TorchSwin3d(embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                         num_classes=13)
        from cpu_vision_tpu.models.video_swin import SwinTransformer3d

        m = SwinTransformer3d(embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                              num_classes=13)
        x = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
        ref = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        conv = swin3d_from_torch(tm.state_dict(), depths=(1, 2))
        ref_shapes = jax.tree.map(lambda a: a.shape, ref["params"])
        conv_shapes = jax.tree.map(lambda a: a.shape, conv["params"])
        assert ref_shapes == conv_shapes
