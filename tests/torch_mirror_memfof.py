"""Test-only torch mirror of MEMFOF (SEA-RAFT + GMA at 1/16, 3 frames).

Mirrors reference ``MEMFOF/wrapper.py:136-293`` forward structure; upstream
``memfof.core.memfof`` is gitignored there. State-dict naming is the layout
``weights/convert.py::convert_memfof`` consumes.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror_raft import (
    TorchResidualBlock,
    TorchSepConvGRU,
    norm_layer,
)
from torch_mirror_raft_sampler import bilinear_sample_nchw


class TorchDown16Encoder(nn.Module):
    """BasicEncoder trunk (in_ch-parametric) + stride-2 conv to 1/16."""

    def __init__(self, in_ch, output_dim, kind):
        super().__init__()

        class Enc8(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3)
                self.norm1 = norm_layer(kind, 64)
                self.layer1 = nn.Sequential(
                    TorchResidualBlock(64, 64, kind, 1),
                    TorchResidualBlock(64, 64, kind, 1),
                )
                self.layer2 = nn.Sequential(
                    TorchResidualBlock(64, 96, kind, 2),
                    TorchResidualBlock(96, 96, kind, 1),
                )
                self.layer3 = nn.Sequential(
                    TorchResidualBlock(96, 128, kind, 2),
                    TorchResidualBlock(128, 128, kind, 1),
                )
                self.conv2 = nn.Conv2d(128, output_dim, 1)

            def forward(self, x):
                x = F.relu(self.norm1(self.conv1(x)))
                x = self.layer1(x)
                x = self.layer2(x)
                x = self.layer3(x)
                return self.conv2(x)

        self.enc8 = Enc8()
        self.down = nn.Conv2d(output_dim, output_dim, 3, 2, 1)

    def forward(self, x):
        return self.down(self.enc8(x))


class TorchGMAAttention(nn.Module):
    def __init__(self, dim, dim_head):
        super().__init__()
        self.dim_head = dim_head
        self.to_q = nn.Linear(dim, dim_head, bias=False)
        self.to_k = nn.Linear(dim, dim_head, bias=False)

    def forward(self, context):
        B, C, H, W = context.shape
        t = context.permute(0, 2, 3, 1).reshape(B, H * W, C)
        q = self.to_q(t)
        k = self.to_k(t)
        s = torch.einsum("bqd,bkd->bqk", q, k) / math.sqrt(self.dim_head)
        return s.softmax(dim=-1)


class TorchMEMFOFMotionEncoder(nn.Module):
    def __init__(self, cor_planes):
        super().__init__()
        self.convc1 = nn.Conv2d(cor_planes, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(4, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 4, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class TorchMEMFOFUpdateBlock(nn.Module):
    def __init__(self, dim, cor_planes):
        super().__init__()
        self.encoder = TorchMEMFOFMotionEncoder(cor_planes)
        self.aggregator_to_v = nn.Linear(128, 128, bias=False)
        self.aggregator_gamma = nn.Parameter(torch.zeros(1))
        self.gru = TorchSepConvGRU(hidden=dim, input_dim=dim + 128 + 128)

    def forward(self, net, context, corr, flow, attention):
        motion = self.encoder(flow, corr)
        B, C, H, W = motion.shape
        v = self.aggregator_to_v(motion.permute(0, 2, 3, 1).reshape(B, H * W, C))
        glob = torch.einsum("bqk,bkc->bqc", attention, v)
        glob = glob.reshape(B, H, W, C).permute(0, 3, 1, 2)
        motion_global = motion + self.aggregator_gamma * glob
        x = torch.cat([context, motion, motion_global], dim=1)
        return self.gru(net, x)


def corr_pyramid(f1, f2, levels):
    b, c, h, w = f1.shape
    corr = torch.matmul(
        f1.view(b, c, h * w).transpose(1, 2), f2.view(b, c, h * w)
    ) / (c**0.5)
    corr = corr.view(b * h * w, 1, h, w)
    pyr = [corr]
    for _ in range(levels - 1):
        corr = F.avg_pool2d(corr, 2, 2)
        pyr.append(corr)
    return pyr


def corr_lookup(pyr, coords, r):
    coords = coords.permute(0, 2, 3, 1)
    b, h, w, _ = coords.shape
    d = torch.arange(-r, r + 1).float()
    off0, off1 = torch.meshgrid(d, d, indexing="ij")
    out = []
    for lvl, corr in enumerate(pyr):
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2**lvl)
        xg = centroid[..., 0] + off0[None]
        yg = centroid[..., 1] + off1[None]
        sampled = bilinear_sample_nchw(corr, xg, yg)
        out.append(sampled.reshape(b, h, w, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2)


def upsample_convex_16_torch(x, mask, scale=16.0):
    B, C, h, w = x.shape
    m = mask.view(B, 1, 9, 16, 16, h, w).softmax(dim=2)
    up = F.unfold(scale * x, [3, 3], padding=1)
    up = up.view(B, C, 9, 1, 1, h, w)
    up = torch.sum(m * up, dim=2)  # (B, C, 16, 16, h, w)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, C, 16 * h, 16 * w)
    return up


class TorchMEMFOF(nn.Module):
    """Mirror of models/flow/memfof.py::MEMFOF."""

    def __init__(self, iters=2, dim=128, corr_levels=4, corr_radius=4):
        super().__init__()
        self.iters = iters
        self.dim = dim
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        cor_planes = 2 * corr_levels * (2 * corr_radius + 1) ** 2
        self.cnet = TorchDown16Encoder(9, 256, "instance")
        self.init_conv = nn.Conv2d(256, 2 * dim, 3, 1, 1)
        self.att = TorchGMAAttention(dim, dim)
        self.fnet = TorchDown16Encoder(3, 256, "instance")
        self.update_block = TorchMEMFOFUpdateBlock(dim, cor_planes)
        self.flow_head = nn.Sequential(
            nn.Conv2d(dim, 256, 3, 1, 1), nn.ReLU(True), nn.Conv2d(256, 12, 3, 1, 1)
        )
        self.upsample_weight = nn.Sequential(
            nn.Conv2d(dim, 256, 3, 1, 1), nn.ReLU(True),
            nn.Conv2d(256, 2 * 256 * 9, 1),
        )

    def _coords_grid(self, b, h, w):
        y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        return torch.stack([x, y], dim=0).float()[None].repeat(b, 1, 1, 1)

    def forward(self, images):
        B, _, C, H, W = images.shape
        x = 2 * (images / 255.0) - 1.0
        cnet = self.cnet(torch.cat([x[:, 0], x[:, 1], x[:, 2]], dim=1))
        cnet = self.init_conv(cnet)
        net, context = torch.split(cnet, [self.dim, self.dim], dim=1)
        attention = self.att(context)

        fu = self.flow_head(net).float()
        flow21, flow23 = fu[:, 0:2], fu[:, 6:8]

        f1 = self.fnet(x[:, 0]).float()
        f2 = self.fnet(x[:, 1]).float()
        f3 = self.fnet(x[:, 2]).float()
        pyr21 = corr_pyramid(f2, f1, self.corr_levels)
        pyr23 = corr_pyramid(f2, f3, self.corr_levels)

        b, _, h16, w16 = f2.shape
        coords0 = self._coords_grid(b, h16, w16)
        for _ in range(self.iters):
            c21 = corr_lookup(pyr21, coords0 + flow21, self.corr_radius)
            c23 = corr_lookup(pyr23, coords0 + flow23, self.corr_radius)
            corr = torch.cat([c21, c23], dim=1)
            flow16 = torch.cat([flow21, flow23], dim=1)
            net = self.update_block(net, context, corr, flow16, attention)
            fu = self.flow_head(net).float()
            flow21 = flow21 + fu[:, 0:2]
            flow23 = flow23 + fu[:, 6:8]

        w16x = 0.25 * self.upsample_weight(net).float()
        up21 = upsample_convex_16_torch(flow21, w16x[:, : 256 * 9])
        up23 = upsample_convex_16_torch(flow23, w16x[:, 256 * 9 :])
        return torch.stack([up21, up23], dim=1)  # (B, 2, 2, H, W)
