"""Golden-reference SiT in PyTorch for parity testing.

An independent reimplementation of the semantics the reference model inherits
from the third-party ``vit_pytorch.vit.Transformer`` (which is not installed
here): pre-norm blocks with fused no-bias QKV attention (scale d_head^-0.5,
biased out-projection) and Linear-GELU-Dropout-Linear-Dropout MLPs — the exact
structure pinned by the reference's weight-key map (reference:
utils/utils.py:17-33) — plus the SiT wrapper semantics of reference
models/sit.py:66-82. State-dict key names match the reference layout so
``checkpoints.torch_import`` consumes them directly.

Test-only module; the JAX framework never imports it.
"""

from __future__ import annotations

import math

import torch
from torch import nn


class _PatchFlatten(nn.Module):
    """b c n v -> b n (v c), channel-fastest (einops '(v c)')."""

    def forward(self, x):
        b, c, n, v = x.shape
        return x.permute(0, 2, 3, 1).reshape(b, n, v * c)


class _PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _FeedForward(nn.Module):
    def __init__(self, dim, hidden_dim, dropout=0.0):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, hidden_dim),
            nn.GELU(),
            nn.Dropout(dropout),
            nn.Linear(hidden_dim, dim),
            nn.Dropout(dropout),
        )

    def forward(self, x):
        return self.net(x)


class _Attention(nn.Module):
    def __init__(self, dim, heads=8, dim_head=64, dropout=0.0):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(dropout))

    def forward(self, x):
        b, n, _ = x.shape
        h = self.heads
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (
            t.reshape(b, n, h, -1).permute(0, 2, 1, 3) for t in (q, k, v)
        )
        dots = torch.matmul(q, k.transpose(-1, -2)) * self.scale
        attn = dots.softmax(dim=-1)
        out = torch.matmul(attn, v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class _Transformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim, dropout=0.0):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        _PreNorm(dim, _Attention(dim, heads, dim_head, dropout)),
                        _PreNorm(dim, _FeedForward(dim, mlp_dim, dropout)),
                    ]
                )
                for _ in range(depth)
            ]
        )

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class TorchSiT(nn.Module):
    """Reference-semantics SiT (models/sit.py:25-82) with matching key names."""

    def __init__(
        self,
        *,
        dim,
        depth,
        heads,
        mlp_dim,
        pool="cls",
        num_patches=320,
        num_classes=1,
        num_channels=4,
        num_vertices=153,
        dim_head=64,
        dropout=0.0,
        emb_dropout=0.0,
    ):
        super().__init__()
        patch_dim = num_channels * num_vertices
        self.to_patch_embedding = nn.Sequential(
            _PatchFlatten(), nn.Linear(patch_dim, dim)
        )
        self.pos_embedding = nn.Parameter(torch.randn(1, num_patches + 1, dim))
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim))
        self.dropout = nn.Dropout(emb_dropout)
        self.transformer = _Transformer(dim, depth, heads, dim_head, mlp_dim, dropout)
        self.pool = pool
        self.mlp_head = nn.Sequential(nn.LayerNorm(dim), nn.Linear(dim, num_classes))

    def forward(self, img):
        x = self.to_patch_embedding(img)
        b, n, _ = x.shape
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = x + self.pos_embedding[:, : n + 1]
        x = self.dropout(x)
        x = self.transformer(x)
        x = x.mean(dim=1) if self.pool == "mean" else x[:, 0]
        return self.mlp_head(x)


class TorchMPP(nn.Module):
    """Reference-semantics MPP forward given a precomputed corruption
    (models/mpp.py:115-132), for parity tests without RNG matching."""

    def __init__(self, sit: TorchSiT, dim_in: int, dim_out: int):
        super().__init__()
        self.sit = sit
        self.to_original = nn.Linear(dim_in, dim_out)
        self.mask_token = nn.Parameter(torch.randn(1, 1, dim_out))

    def forward(self, target_bnd, corrupted_bnd, mask_bn):
        sit = self.sit
        x = sit.to_patch_embedding[1](corrupted_bnd)
        b, n, _ = x.shape
        cls = sit.cls_token.expand(b, -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = x + sit.pos_embedding[:, : n + 1]
        x = sit.transformer(x)
        out = self.to_original(x[:, 1:, :])
        loss = torch.nn.functional.mse_loss(out[mask_bn], target_bnd[mask_bn])
        return loss, out
