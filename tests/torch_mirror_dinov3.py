"""Torch mirror of the DINOv3 backbone + DPT depther.

Defines the state-dict layout ``weights/convert.py::convert_dinov3``
consumes (reference ``later/DINOv3/infer.py`` loads the hub depther;
the upstream repo itself is gitignored). Deltas vs the DINOv2 mirror:
patch 16, 4 register tokens, axial 2D RoPE with [-1, 1]-normalized
coordinates, and NO learned position table.
"""

import math

import torch
import torch.nn as nn

from torch_mirror import TorchBlock, TorchDPTHead, TorchPatchEmbed


def rope_tables(ph, pw, head_dim, base=100.0):
    d4 = head_dim // 4
    freqs = base ** (-torch.arange(d4, dtype=torch.float32) / d4)
    ys = (torch.arange(ph, dtype=torch.float32)[:, None].expand(ph, pw)
          .reshape(-1) + 0.5) / ph * 2 - 1
    xs = (torch.arange(pw, dtype=torch.float32)[None, :].expand(ph, pw)
          .reshape(-1) + 0.5) / pw * 2 - 1
    ang = math.pi * torch.cat(
        [ys[:, None] * freqs[None], xs[:, None] * freqs[None]], dim=-1
    )
    return torch.cos(ang), torch.sin(ang)


class TorchDinoV3(nn.Module):
    """RoPE-only encoder (no pos_embed); names match the DINOv2 mirror."""

    def __init__(self, dim, depth, num_heads, patch=16, ffn="mlp",
                 num_register_tokens=4, rope_base=100.0):
        super().__init__()
        self.patch = patch
        self.dim = dim
        self.num_heads = num_heads
        self.rope_base = rope_base
        self.num_register_tokens = num_register_tokens
        self.patch_embed = TorchPatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.register_tokens = nn.Parameter(
            torch.zeros(1, num_register_tokens, dim)
        )
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, num_heads, ffn=ffn) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def get_intermediate_layers(self, x, idxs):
        B = x.shape[0]
        ph, pw = x.shape[2] // self.patch, x.shape[3] // self.patch
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat(
            [self.cls_token.expand(B, -1, -1),
             self.register_tokens.expand(B, -1, -1), x],
            dim=1,
        )
        rope = (
            rope_tables(ph, pw, self.dim // self.num_heads, self.rope_base),
            1 + self.num_register_tokens,
        )
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x, rope=rope)
            if i in idxs:
                y = self.norm(x)
                outs.append((y[:, 1 + self.num_register_tokens:], y[:, 0]))
        return outs


class TorchDINOv3Depther(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=16, ffn="mlp"):
        super().__init__()
        self.idxs = idxs
        self.backbone = TorchDinoV3(dim, depth, num_heads, patch, ffn)
        self.head = TorchDPTHead(dim, features, out_channels, patch,
                                 metric=False)

    def forward(self, x):
        ph, pw = x.shape[2] // self.backbone.patch, x.shape[3] // self.backbone.patch
        feats = self.backbone.get_intermediate_layers(x, self.idxs)
        return self.head(feats, ph, pw).squeeze(1)
