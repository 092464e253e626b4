"""Torch mirror of CoTracker3 (windowed online point tracking).

Defines the state-dict layout ``weights/convert.py::convert_cotracker3``
consumes (the reference loads the hub model, ``later/CoTracker3/infer.py:19``).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror_raft_sampler import bilinear_sample_nchw


class TorchTrackerEncoder(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.conv2 = nn.Conv2d(64, 64, 3, 1, 1)
        self.conv3 = nn.Conv2d(64, 96, 3, 2, 1)
        self.conv4 = nn.Conv2d(96, 96, 3, 1, 1)
        self.conv5 = nn.Conv2d(96, dim, 1)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = F.relu(self.conv4(x))
        return self.conv5(x)


def torch_corr_features(fmaps, coords, track_feat, levels=4, radius=3):
    """fmaps (BT, C, h, w); coords (BT, N, 2) grid (x, y); track_feat
    (BT, N, C) -> (BT, N, levels*(2r+1)^2)."""
    k = 2 * radius + 1
    dy = torch.arange(k, dtype=torch.float32) - radius
    dx = torch.arange(k, dtype=torch.float32) - radius
    oy, ox = torch.meshgrid(dy, dx, indexing="ij")
    ox = ox.reshape(-1)
    oy = oy.reshape(-1)
    c = fmaps.shape[1]
    outs = []
    fm = fmaps
    for lvl in range(levels):
        scale = 2.0**lvl
        x = coords[..., 0:1] / scale + ox[None, None]
        y = coords[..., 1:2] / scale + oy[None, None]
        patches = bilinear_sample_nchw(fm, x, y)  # (BT, C, N, K)
        corr = torch.einsum(
            "bcnk,bnc->bnk", patches, track_feat
        ) / math.sqrt(c)
        outs.append(corr)
        if lvl + 1 < levels:
            fm = F.avg_pool2d(fm, 2)
    return torch.cat(outs, dim=-1)


class TorchFactorizedBlock(nn.Module):
    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.norm_time = nn.LayerNorm(dim, eps=1e-6)
        self.time_qkv = nn.Linear(dim, 3 * dim)
        self.time_proj = nn.Linear(dim, dim)
        self.norm_track = nn.LayerNorm(dim, eps=1e-6)
        self.track_qkv = nn.Linear(dim, 3 * dim)
        self.track_proj = nn.Linear(dim, dim)
        self.norm_mlp = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim, 4 * dim)
        self.mlp_fc2 = nn.Linear(4 * dim, dim)

    def _attn(self, x, qkv_mod, proj_mod):
        b, n, d = x.shape
        hd = d // self.num_heads
        qkv = qkv_mod(x).reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(hd)
        att = att.softmax(dim=-1)
        o = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, d)
        return proj_mod(o)

    def forward(self, x):
        b, t, n, d = x.shape
        h = self.norm_time(x).permute(0, 2, 1, 3).reshape(b * n, t, d)
        h = self._attn(h, self.time_qkv, self.time_proj)
        x = x + h.reshape(b, n, t, d).permute(0, 2, 1, 3)
        h = self.norm_track(x).reshape(b * t, n, d)
        h = self._attn(h, self.track_qkv, self.track_proj)
        x = x + h.reshape(b, t, n, d)
        h = self.norm_mlp(x)
        return x + self.mlp_fc2(F.gelu(self.mlp_fc1(h)))


class TorchCoTracker3(nn.Module):
    def __init__(self, dim=128, d_model=256, iters=4, blocks=3, levels=4,
                 radius=3, num_heads=8, stride=4):
        super().__init__()
        self.dim, self.iters = dim, iters
        self.levels, self.radius, self.stride = levels, radius, stride
        k2 = levels * (2 * radius + 1) ** 2
        self.encoder = TorchTrackerEncoder(dim)
        self.in_proj = nn.Linear(k2 + 3 + dim, d_model)
        self.blocks = nn.ModuleList(
            [TorchFactorizedBlock(d_model, num_heads) for _ in range(blocks)]
        )
        self.head_coord = nn.Linear(d_model, 2)
        self.head_vis = nn.Linear(d_model, 1)
        self.head_feat = nn.Linear(d_model, dim)

    def forward(self, frames, queries):
        # frames (B, T, 3, H, W) in [0, 1]; queries (B, N, 2) pixel (x, y)
        b, t, _, H, W = frames.shape
        n = queries.shape[1]
        fmaps = self.encoder(frames.reshape(b * t, 3, H, W) * 2.0 - 1.0)
        h, w = fmaps.shape[2:]
        q_grid = queries / self.stride
        f0 = fmaps.reshape(b, t, self.dim, h, w)[:, 0]
        track_feat = bilinear_sample_nchw(
            f0, q_grid[..., 0:1].permute(0, 2, 1), q_grid[..., 1:2].permute(0, 2, 1)
        )[:, :, 0].permute(0, 2, 1)  # (B, N, C)
        coords = q_grid[:, None].expand(b, t, n, 2).contiguous()
        vis = torch.zeros(b, t, n)

        tf_rep = track_feat.repeat_interleave(t, dim=0)
        for _ in range(self.iters):
            corr = torch_corr_features(
                fmaps, coords.reshape(b * t, n, 2), tf_rep,
                self.levels, self.radius,
            )
            rel = (coords - coords[:, :1]) / torch.tensor([w, h]).float()
            tokens = torch.cat(
                [
                    corr.reshape(b, t, n, -1),
                    rel,
                    vis.unsqueeze(-1),
                    track_feat[:, None].expand(b, t, n, self.dim),
                ],
                dim=-1,
            )
            z = self.in_proj(tokens)
            for blk in self.blocks:
                z = blk(z)
            coords = coords + self.head_coord(z)
            vis = vis + self.head_vis(z)[..., 0]
            track_feat = track_feat + self.head_feat(z.mean(dim=1))
            tf_rep = track_feat.repeat_interleave(t, dim=0)

        return coords * self.stride, torch.sigmoid(vis).unsqueeze(-1)
