"""Torch mirror of Video Depth Anything (DINOv2 + temporal-attention DPT).

Defines the state-dict layout ``weights/convert.py::convert_vda`` consumes
(the reference ``later/Video_Depth_Anything/`` is README-only — it wires no
code — so the topology of the published model (arXiv:2501.12375) is frozen
by this mirror: DA-V2 encoder + DPT pyramid with a pre-norm residual
temporal attention block after each refinenet stage).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT
from torch_mirror_flashdepth import _Scratch


def temporal_pe(t, dim):
    pos = torch.arange(t, dtype=torch.float32)[:, None]
    i = torch.arange(dim // 2, dtype=torch.float32)[None, :]
    freq = pos / torch.pow(torch.tensor(10000.0), 2.0 * i / dim)
    pe = torch.zeros(t, dim)
    pe[:, 0::2] = torch.sin(freq)
    pe[:, 1::2] = torch.cos(freq)
    return pe


class TorchTemporalBlock(nn.Module):
    def __init__(self, dim, num_heads=8, mlp_ratio=4):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, mlp_ratio * dim)
        self.fc2 = nn.Linear(mlp_ratio * dim, dim)

    def forward(self, x):
        # x: (B, T, C, H, W) — attention over T per spatial location
        b, t, c, h, w = x.shape
        hd = c // self.num_heads
        tok = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, t, c)
        tok = tok + temporal_pe(t, c)[None]

        y = self.norm1(tok)
        qkv = self.qkv(y).reshape(-1, t, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, j].transpose(1, 2) for j in range(3))
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(-1, t, c)
        tok = tok + self.proj(o)
        tok = tok + self.fc2(F.gelu(self.fc1(self.norm2(tok))))

        return tok.reshape(b, h, w, t, c).permute(0, 3, 4, 1, 2)


class TorchVDAHead(nn.Module):
    def __init__(self, in_ch, features, out_channels, patch=14, num_heads=8):
        super().__init__()
        self.patch = patch
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
        self.scratch = _Scratch(out_channels, features)
        self.temporal4 = TorchTemporalBlock(features, num_heads)
        self.temporal3 = TorchTemporalBlock(features, num_heads)
        self.temporal2 = TorchTemporalBlock(features, num_heads)
        self.temporal1 = TorchTemporalBlock(features, num_heads)

    def _t(self, block, p, T):
        bt, c, h, w = p.shape
        v = p.reshape(bt // T, T, c, h, w)
        return block(v).reshape(bt, c, h, w)

    def forward(self, out_features, ph, pw, T):
        outs = []
        for i, (tokens, _cls) in enumerate(out_features):
            B, N, D = tokens.shape
            x = tokens.permute(0, 2, 1).reshape(B, D, ph, pw)
            outs.append(self.resize_layers[i](self.projects[i](x)))
        l1, l2, l3, l4 = outs
        l1 = self.scratch.layer1_rn(l1)
        l2 = self.scratch.layer2_rn(l2)
        l3 = self.scratch.layer3_rn(l3)
        l4 = self.scratch.layer4_rn(l4)

        p4 = self._t(self.temporal4,
                     self.scratch.refinenet4(l4, size=l3.shape[2:]), T)
        p3 = self._t(self.temporal3,
                     self.scratch.refinenet3(p4, l3, size=l2.shape[2:]), T)
        p2 = self._t(self.temporal2,
                     self.scratch.refinenet2(p3, l2, size=l1.shape[2:]), T)
        p1 = self._t(self.temporal1, self.scratch.refinenet1(p2, l1), T)

        out = self.scratch.output_conv1(p1)
        out = F.interpolate(out, (ph * self.patch, pw * self.patch),
                            mode="bilinear", align_corners=True)
        return F.relu(self.scratch.output_conv2(out))


class TorchVDA(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518, temporal_heads=8):
        super().__init__()
        self.idxs = idxs
        self.pretrained = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.depth_head = TorchVDAHead(dim, features, out_channels, patch,
                                       temporal_heads)

    def forward(self, video):
        """video: (B, T, 3, H, W) -> depth (B, T, H, W)."""
        B, T, _, H, W = video.shape
        ph, pw = H // 14, W // 14
        frames = video.reshape(B * T, 3, H, W)
        feats = self.pretrained.get_intermediate_layers(frames, self.idxs)
        d = self.depth_head(feats, ph, pw, T)
        return d.squeeze(1).reshape(B, T, H, W)
