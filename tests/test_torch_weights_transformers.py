"""ViT and image-Swin (v1+v2) weight import: torch oracles recreated with
torchvision's exact module layout/naming produce the SAME logits through our
flax models after state-dict conversion (reference
``models/{vision_transformer,swin_transformer}.py``)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cpu_vision_tpu.models.torch_weights import swin_from_torch, vit_from_torch


# ---- ViT oracle (reference models/vision_transformer.py:86-243) ------------

class TorchViTEncoderBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(dim, mlp_dim), nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(mlp_dim, dim), nn.Dropout(0.0))

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TorchViT(nn.Module):
    def __init__(self, image_size=32, patch=8, layers=2, heads=2, dim=16,
                 mlp_dim=32, num_classes=9):
        super().__init__()
        self.conv_proj = nn.Conv2d(3, dim, patch, patch)
        self.class_token = nn.Parameter(torch.zeros(1, 1, dim))
        seq = (image_size // patch) ** 2 + 1
        encoder = nn.Module()
        encoder.pos_embedding = nn.Parameter(torch.empty(1, seq, dim).normal_(std=0.02))
        from collections import OrderedDict

        encoder.layers = nn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", TorchViTEncoderBlock(dim, heads, mlp_dim))
            for i in range(layers)))
        encoder.ln = nn.LayerNorm(dim, eps=1e-6)
        self.encoder = encoder
        self.heads = nn.Sequential()
        self.heads.add_module("head", nn.Linear(dim, num_classes))

    def forward(self, x):  # B C H W
        n = x.shape[0]
        x = self.conv_proj(x).flatten(2).transpose(1, 2)  # B S D
        cls = self.class_token.expand(n, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.encoder.pos_embedding
        x = self.encoder.layers(x)
        x = self.encoder.ln(x)
        return self.heads(x[:, 0])


class TestViT:
    def test_vit_logits_match_torch(self, rng):
        torch.manual_seed(0)
        tm = TorchViT().eval()
        # randomize class token too (zeros hide conversion bugs)
        with torch.no_grad():
            tm.class_token.normal_(std=0.5)
        x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        from cpu_vision_tpu.models.vision_transformer import VisionTransformer

        m = VisionTransformer(8, 2, 2, 16, 32, num_classes=9)
        variables = vit_from_torch(tm.state_dict(), num_layers=2, num_heads=2)
        out = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-5)


# ---- Swin oracle (reference models/swin_transformer.py) --------------------

def _rel_index_2d(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = coords.flatten(1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class TorchShiftedWindowAttention(nn.Module):
    """reference ``ShiftedWindowAttention[V2]`` + ``shifted_window_attention``
    (``swin_transformer.py:116-374``)."""

    def __init__(self, dim, window_size, shift_size, num_heads, v2=False):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.num_heads = num_heads
        self.v2 = v2
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        ws = window_size
        self.register_buffer("relative_position_index", _rel_index_2d(ws))
        if v2:
            self.logit_scale = nn.Parameter(torch.log(10 * torch.ones((num_heads, 1, 1))))
            self.cpb_mlp = nn.Sequential(
                nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
                nn.Linear(512, num_heads, bias=False))
            rel = torch.arange(-(ws - 1), ws, dtype=torch.float32)
            table = torch.stack(torch.meshgrid([rel, rel], indexing="ij"))
            table = table.permute(1, 2, 0).contiguous().unsqueeze(0) / (ws - 1) * 8
            table = torch.sign(table) * torch.log2(torch.abs(table) + 1.0) / 3.0
            self.register_buffer("relative_coords_table", table)
            with torch.no_grad():
                length = self.qkv.bias.numel() // 3
                self.qkv.bias[length : 2 * length].zero_()
        else:
            self.relative_position_bias_table = nn.Parameter(torch.zeros(
                (2 * ws - 1) ** 2, num_heads))
            nn.init.trunc_normal_(self.relative_position_bias_table, std=0.02)

    def _bias(self):
        ws = self.window_size
        if self.v2:
            table = self.cpb_mlp(self.relative_coords_table).view(-1, self.num_heads)
        else:
            table = self.relative_position_bias_table
        n = ws * ws
        bias = table[self.relative_position_index.flatten()]
        bias = bias.view(n, n, -1).permute(2, 0, 1).unsqueeze(0)
        if self.v2:
            bias = 16 * torch.sigmoid(bias)
        return bias

    def forward(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        bias = self._bias()
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, ph, pw, _ = x.shape
        sh = 0 if ws >= ph else self.shift_size
        sw = 0 if ws >= pw else self.shift_size
        if sh + sw > 0:
            x = torch.roll(x, (-sh, -sw), dims=(1, 2))
        nw = (ph // ws) * (pw // ws)
        x = x.view(b, ph // ws, ws, pw // ws, ws, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b * nw, ws * ws, c)
        qkv_bias = self.qkv.bias
        if self.v2:
            qkv_bias = qkv_bias.clone()
            length = qkv_bias.numel() // 3
            qkv_bias[length : 2 * length].zero_()
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(x.size(0), x.size(1), 3, self.num_heads,
                          c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.v2:
            attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
            attn = attn * torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        else:
            attn = (q * (c // self.num_heads) ** -0.5).matmul(k.transpose(-2, -1))
        attn = attn + bias
        if sh + sw > 0:
            mask = x.new_zeros(ph, pw)
            h_sl = ((0, -ws), (-ws, -sh), (-sh, None)) if sh else ((0, None),)
            w_sl = ((0, -ws), (-ws, -sw), (-sw, None)) if sw else ((0, None),)
            cnt = 0
            for hh in h_sl:
                for wsl in w_sl:
                    mask[hh[0]:hh[1], wsl[0]:wsl[1]] = cnt
                    cnt += 1
            mask = mask.view(ph // ws, ws, pw // ws, ws)
            mask = mask.permute(0, 2, 1, 3).reshape(nw, ws * ws)
            mask = mask.unsqueeze(1) - mask.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
            attn = attn.view(b, nw, self.num_heads, ws * ws, ws * ws) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, ws * ws, ws * ws)
        attn = F.softmax(attn, dim=-1)
        x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), ws * ws, c)
        x = self.proj(x)
        x = x.view(b, ph // ws, pw // ws, ws, ws, c)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
        if sh + sw > 0:
            x = torch.roll(x, (sh, sw), dims=(1, 2))
        return x[:, :h, :w, :].contiguous()


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift, v2=False):
        super().__init__()
        self.v2 = v2
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchShiftedWindowAttention(dim, ws, shift, heads, v2=v2)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(4 * dim, dim), nn.Dropout(0.0))

    def forward(self, x):
        if self.v2:  # post-norm (reference SwinTransformerBlockV2)
            x = x + self.norm1(self.attn(x))
            return x + self.norm2(self.mlp(x))
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchPatchMerging(nn.Module):
    def __init__(self, dim, v2=False):
        super().__init__()
        self.v2 = v2
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim if v2 else 4 * dim)

    def forward(self, x):
        b, h, w, c = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        if self.v2:
            return self.norm(self.reduction(x))
        return self.reduction(self.norm(x))


class TorchSwin(nn.Module):
    """reference ``SwinTransformer`` with state-dict-compatible naming:
    features.0 = patch embed; blocks at odd indices; merging at even >= 2."""

    def __init__(self, embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                 window_size=4, num_classes=9, v2=False):
        super().__init__()
        layers = [nn.Sequential(
            nn.Conv2d(3, embed_dim, 4, 4), nn.Identity(), nn.LayerNorm(embed_dim))]
        for i, (depth, heads) in enumerate(zip(depths, num_heads)):
            dim = embed_dim * 2 ** i
            if i > 0:
                layers.append(TorchPatchMerging(dim // 2, v2=v2))
            layers.append(nn.Sequential(*[
                TorchSwinBlock(dim, heads, window_size,
                               0 if j % 2 == 0 else window_size // 2, v2=v2)
                for j in range(depth)]))
        self.features = nn.Sequential(*layers)
        dim = embed_dim * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):  # B C H W
        x = self.features[0][0](x).permute(0, 2, 3, 1)
        x = self.features[0][2](x)
        for mod in list(self.features)[1:]:
            x = mod(x)
        x = self.norm(x)
        x = x.mean(dim=(1, 2))
        return self.head(x)


class TestSwin:
    @pytest.mark.parametrize("v2", [False, True])
    def test_swin_logits_match_torch(self, rng, v2):
        torch.manual_seed(0)
        tm = TorchSwin(v2=v2).eval()
        x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        from cpu_vision_tpu.models.swin import SwinTransformer

        m = SwinTransformer(embed_dim=8, depths=(1, 2), num_heads=(2, 4),
                            window_size=4, num_classes=9, v2=v2)
        variables = swin_from_torch(tm.state_dict(), depths=(1, 2))
        out = np.asarray(m.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(out, expected, atol=3e-5, rtol=1e-5)
