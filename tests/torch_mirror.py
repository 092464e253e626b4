"""Test-only torch mirror of the DINOv2 + DPT architecture.

The upstream model repos are not vendored anywhere (the reference gitignores
them), so numerical parity is established against this independent torch
implementation written to the published DINOv2/DPT architecture spec. It uses
the exact state-dict naming of the upstream checkpoints
(``pretrained.blocks.N.attn.qkv.weight`` ... ``depth_head.scratch...``), which
simultaneously validates ``weights/convert.py`` on real checkpoint layouts.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x, rope=None):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        if rope is not None:
            (cos, sin), prefix = rope

            def rot(t):
                p = t[:, :, prefix:]
                p1, p2 = p[..., 0::2], p[..., 1::2]
                r = torch.stack([p1 * cos - p2 * sin, p1 * sin + p2 * cos],
                                dim=-1).reshape(p.shape)
                return torch.cat([t[:, :, :prefix], r], dim=2)

            q, k = rot(q), rot(k)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchSwiGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w12 = nn.Linear(dim, 2 * hidden)
        self.w3 = nn.Linear(hidden, dim)

    def forward(self, x):
        x12 = self.w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        return self.w3(F.silu(x1) * x2)


class TorchLayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TorchBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, ffn="mlp"):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads)
        self.ls1 = TorchLayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        if ffn == "swiglu":
            hidden = (int(dim * mlp_ratio * 2 / 3) + 7) // 8 * 8
            self.mlp = TorchSwiGLU(dim, hidden)
        else:
            self.mlp = TorchMlp(dim, int(dim * mlp_ratio))
        self.ls2 = TorchLayerScale(dim)

    def forward(self, x, rope=None):
        x = x + self.ls1(self.attn(self.norm1(x), rope=rope))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchPatchEmbed(nn.Module):
    def __init__(self, dim, patch, in_ch=3):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch, patch)

    def forward(self, x):
        return self.proj(x)


class TorchDinoViT(nn.Module):
    """DINOv2 encoder; names match upstream checkpoints."""

    def __init__(self, dim, depth, num_heads, patch=14, pretrain_img=518, ffn="mlp",
                 num_register_tokens=0, in_ch=3):
        super().__init__()
        self.patch = patch
        self.dim = dim
        self.num_register_tokens = num_register_tokens
        grid = pretrain_img // patch
        self.patch_embed = TorchPatchEmbed(dim, patch, in_ch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        if num_register_tokens:
            self.register_tokens = nn.Parameter(torch.zeros(1, num_register_tokens, dim))
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, num_heads, ffn=ffn) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pretrain_grid = grid

    def interpolate_pos_encoding(self, ph, pw):
        m = self.pretrain_grid
        if (ph, pw) == (m, m):
            return self.pos_embed
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:].reshape(1, m, m, self.dim).permute(0, 3, 1, 2)
        patch_pos = F.interpolate(
            patch_pos, size=(ph, pw), mode="bicubic", align_corners=False,
            antialias=False,
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, ph * pw, self.dim)
        return torch.cat([cls_pos, patch_pos], dim=1)

    def get_intermediate_layers(self, x, idxs, return_class_token=True,
                                raw_idxs=()):
        B = x.shape[0]
        ph, pw = x.shape[2] // self.patch, x.shape[3] // self.patch
        x = self.patch_embed(x).flatten(2).transpose(1, 2)  # B, N, D
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.interpolate_pos_encoding(ph, pw)
        if self.num_register_tokens:
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(B, -1, -1), x[:, 1:]], dim=1
            )
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in idxs:
                y = x if i in raw_idxs else self.norm(x)
                outs.append((y[:, 1 + self.num_register_tokens :], y[:, 0]))
        return outs


class TorchResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        out = F.relu(x)
        out = self.conv1(out)
        out = F.relu(out)
        out = self.conv2(out)
        return out + x


class TorchFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.out_conv = nn.Conv2d(features, features, 1)
        self.resConfUnit1 = TorchResidualConvUnit(features)
        self.resConfUnit2 = TorchResidualConvUnit(features)

    def forward(self, *xs, size=None):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        if size is None:
            out = F.interpolate(out, scale_factor=2, mode="bilinear", align_corners=True)
        else:
            out = F.interpolate(out, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(out)


class TorchScratch(nn.Module):
    def __init__(self, out_channels, features):
        super().__init__()
        self.layer1_rn = nn.Conv2d(out_channels[0], features, 3, 1, 1, bias=False)
        self.layer2_rn = nn.Conv2d(out_channels[1], features, 3, 1, 1, bias=False)
        self.layer3_rn = nn.Conv2d(out_channels[2], features, 3, 1, 1, bias=False)
        self.layer4_rn = nn.Conv2d(out_channels[3], features, 3, 1, 1, bias=False)
        self.refinenet1 = TorchFusionBlock(features)
        self.refinenet2 = TorchFusionBlock(features)
        self.refinenet3 = TorchFusionBlock(features)
        self.refinenet4 = TorchFusionBlock(features)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True),
        )


class TorchDPTHead(nn.Module):
    def __init__(self, in_ch, features, out_channels, patch=14, metric=False):
        super().__init__()
        self.patch = patch
        self.metric = metric
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_ch, oc, 1) for oc in out_channels]
        )
        self.resize_layers = nn.ModuleList(
            [
                nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, 4),
                nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, 2),
                nn.Identity(),
                nn.Conv2d(out_channels[3], out_channels[3], 3, 2, 1),
            ]
        )
        self.scratch = TorchScratch(out_channels, features)
        if metric:
            self.scratch.output_conv2 = nn.Sequential(
                nn.Conv2d(features // 2, 32, 3, 1, 1),
                nn.ReLU(True),
                nn.Conv2d(32, 1, 1),
                nn.Sigmoid(),
            )

    def forward(self, out_features, ph, pw):
        out = []
        for i, (tokens, _cls) in enumerate(out_features):
            B, N, D = tokens.shape
            x = tokens.permute(0, 2, 1).reshape(B, D, ph, pw)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            out.append(x)
        l1, l2, l3, l4 = out
        l1 = self.scratch.layer1_rn(l1)
        l2 = self.scratch.layer2_rn(l2)
        l3 = self.scratch.layer3_rn(l3)
        l4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = F.interpolate(
            out, (ph * self.patch, pw * self.patch), mode="bilinear", align_corners=True
        )
        return self.scratch.output_conv2(out)


class TorchDepthAnythingV2(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518, metric=False, max_depth=20.0, ffn="mlp"):
        super().__init__()
        self.idxs = idxs
        self.metric = metric
        self.max_depth = max_depth
        self.pretrained = TorchDinoViT(
            dim, depth, num_heads, patch, pretrain_img, ffn=ffn
        )
        self.depth_head = TorchDPTHead(dim, features, out_channels, patch, metric)

    def forward(self, x):
        ph, pw = x.shape[2] // 14, x.shape[3] // 14
        feats = self.pretrained.get_intermediate_layers(x, self.idxs)
        depth = self.depth_head(feats, ph, pw)
        if self.metric:
            return depth.squeeze(1) * self.max_depth
        return F.relu(depth.squeeze(1))
