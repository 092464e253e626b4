"""Test-only torch mirror of the NeuFlow v2 reconstruction.

Upstream NeuFlow_v2 is gitignored in the reference (``NeuFlow/wrapper.py:9``
imports it; only the corr blocks are vendored). State-dict naming here is
the layout ``weights/convert.py::convert_neuflow`` consumes.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror_raft import TorchSepConvGRU
from torch_mirror_raft_sampler import bilinear_sample_nchw


class TorchConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1)
        self.norm1 = nn.GroupNorm(8, out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1)
        self.norm2 = nn.GroupNorm(8, out_ch)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        return F.relu(self.norm2(self.conv2(x)))


class TorchNeuFlowBackbone(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.block1 = TorchConvBlock(3, 64, 2)
        self.block2 = TorchConvBlock(64, 96, 2)
        self.block8 = TorchConvBlock(96, dim, 2)
        self.block16 = TorchConvBlock(dim, dim, 2)

    def forward(self, x):
        x = self.block1(x)
        x = self.block2(x)
        f8 = self.block8(x)
        f16 = self.block16(f8)
        return f8, f16


class TorchCrossAttention(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.dim = dim
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def _attend(self, x, ctx):
        B, C, H, W = x.shape
        xt = x.permute(0, 2, 3, 1).reshape(B, H * W, C)
        ct = ctx.permute(0, 2, 3, 1).reshape(B, H * W, C)
        s = torch.einsum("bqc,bkc->bqk", self.q(xt), self.k(ct)) / math.sqrt(self.dim)
        o = torch.einsum("bqk,bkc->bqc", s.softmax(dim=-1), self.v(ct))
        y = self.norm(xt + self.proj(o))
        return y.reshape(B, H, W, C).permute(0, 3, 1, 2)

    def forward(self, fa, fb):
        return self._attend(fa, fb), self._attend(fb, fa)


class TorchRefineStage(nn.Module):
    def __init__(self, dim=128, iters=8, radius=4):
        super().__init__()
        self.iters = iters
        self.radius = radius
        self.init = nn.Conv2d(dim, dim, 3, 1, 1)
        self.gru = TorchSepConvGRU(hidden=dim, input_dim=dim)
        # corr window is (2r+1)^2 channels + 2 flow channels
        self.enc = nn.Conv2d((2 * radius + 1) ** 2 + 2, dim, 1)
        self.head1 = nn.Conv2d(dim, 256, 3, 1, 1)
        self.head2 = nn.Conv2d(256, 2, 3, 1, 1)

    def forward(self, f1, corr_lookup_fn, flow, coords0):
        net = torch.tanh(self.init(f1))
        for _ in range(self.iters):
            corr = corr_lookup_fn(coords0 + flow)
            inp = torch.cat([corr, flow], dim=1)
            net = self.gru(net, self.enc(inp))
            flow = flow + self.head2(F.relu(self.head1(net)))
        return net, flow


def corr_pyramid_1(f1, f2):
    b, c, h, w = f1.shape
    corr = torch.matmul(
        f1.view(b, c, h * w).transpose(1, 2), f2.view(b, c, h * w)
    ) / (c**0.5)
    return [corr.view(b * h * w, 1, h, w)]


def make_lookup(pyr, r=4):
    def lookup(coords):
        coords_p = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords_p.shape
        d = torch.arange(-r, r + 1).float()
        off0, off1 = torch.meshgrid(d, d, indexing="ij")
        out = []
        for lvl, corr in enumerate(pyr):
            centroid = coords_p.reshape(b * h * w, 1, 1, 2) / (2**lvl)
            xg = centroid[..., 0] + off0[None]
            yg = centroid[..., 1] + off1[None]
            sampled = bilinear_sample_nchw(corr, xg, yg)
            out.append(sampled.reshape(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2)

    return lookup


class TorchNeuFlow(nn.Module):
    """Mirror of models/flow/neuflow.py::NeuFlow."""

    def __init__(self, dim=128, iters16=2, iters8=2, radius=4):
        super().__init__()
        self.dim = dim
        self.radius = radius
        self.backbone = TorchNeuFlowBackbone(dim)
        self.cross_attn = TorchCrossAttention(dim)
        self.refine16 = TorchRefineStage(dim, iters16, radius)
        self.refine8 = TorchRefineStage(dim, iters8, radius)
        self.merge8 = nn.Conv2d(dim, dim, 3, 1, 1)
        self.mask8 = nn.Conv2d(dim, 64 * 9, 1)

    def _coords_grid(self, b, h, w):
        y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        return torch.stack([x, y], dim=0).float()[None].repeat(b, 1, 1, 1)

    def forward(self, image1, image2):
        img1 = 2 * (image1 / 255.0) - 1.0
        img2 = 2 * (image2 / 255.0) - 1.0
        f8_1, f16_1 = self.backbone(img1)
        f8_2, f16_2 = self.backbone(img2)
        f16_1, f16_2 = self.cross_attn(f16_1, f16_2)

        b, c, h16, w16 = f16_1.shape
        fa = f16_1.view(b, c, h16 * w16).transpose(1, 2)
        fb = f16_2.view(b, c, h16 * w16).transpose(1, 2)
        corr = torch.einsum("bpc,bqc->bpq", fa, fb) / math.sqrt(c)
        prob = corr.softmax(dim=-1)
        grid = self._coords_grid(b, h16, w16).view(b, 2, -1).transpose(1, 2)
        matched = torch.einsum("bpq,bqc->bpc", prob, grid)
        flow16 = (matched - grid).transpose(1, 2).reshape(b, 2, h16, w16)

        lookup16 = make_lookup(corr_pyramid_1(f16_1, f16_2), self.radius)
        coords0_16 = self._coords_grid(b, h16, w16)
        _, flow16 = self.refine16(f16_1, lookup16, flow16, coords0_16)

        b8, _, h8, w8 = f8_1.shape
        flow8 = 2.0 * F.interpolate(flow16, (h8, w8), mode="bilinear")
        merged = F.relu(self.merge8(f8_1))
        lookup8 = make_lookup(corr_pyramid_1(f8_1, f8_2), self.radius)
        coords0_8 = self._coords_grid(b, h8, w8)
        net8, flow8 = self.refine8(merged, lookup8, flow8, coords0_8)

        mask = 0.25 * self.mask8(net8)
        m = mask.view(b, 1, 9, 8, 8, h8, w8).softmax(dim=2)
        up = F.unfold(8 * flow8, [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h8, w8)
        flow_up = torch.sum(m * up, dim=2)
        return flow_up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h8, 8 * w8)
