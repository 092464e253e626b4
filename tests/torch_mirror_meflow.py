"""Test-only torch mirror of MeFlow (alternating 1D correlations).

Implements the reference wrapper's forward (``MeFlow/wrapper.py:238-305``)
with the gather-based bilinear sampling formulation — independent of the
flax matmul formulation — so parity gates both the architecture and the
separable-correlation math. State-dict naming is the layout
``weights/convert.py::convert_meflow`` consumes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror_raft import TorchBasicEncoder, TorchUpdateBlock
from torch_mirror_raft_sampler import bilinear_sample_nchw


class TorchWindow1DAttention(nn.Module):
    """Reference Attention1DOnnx (wrapper.py:11-79) with pad+stack windows
    instead of the one-hot grouped conv (identical math)."""

    def __init__(self, channels, horizontal=True, r=4):
        super().__init__()
        self.horizontal = horizontal
        self.r = r
        self.channels = channels
        self.query_conv = nn.Conv2d(channels, channels, 1)
        self.key_conv = nn.Conv2d(channels, channels, 1)

    def forward(self, feature):
        b, c, h, w = feature.shape
        q = self.query_conv(feature)
        k = self.key_conv(feature)
        t = 2 * self.r + 1
        if self.horizontal:
            k_pad = F.pad(k, (self.r, self.r, 0, 0))
            v_pad = F.pad(feature, (self.r, self.r, 0, 0))
            k_win = torch.stack([k_pad[:, :, :, i : i + w] for i in range(t)], dim=2)
            v_win = torch.stack([v_pad[:, :, :, i : i + w] for i in range(t)], dim=2)
        else:
            k_pad = F.pad(k, (0, 0, self.r, self.r))
            v_pad = F.pad(feature, (0, 0, self.r, self.r))
            k_win = torch.stack([k_pad[:, :, i : i + h] for i in range(t)], dim=2)
            v_win = torch.stack([v_pad[:, :, i : i + h] for i in range(t)], dim=2)
        scale = float(c) ** 0.5
        scores = (q.unsqueeze(2) * k_win).sum(dim=1, keepdim=True) / scale
        attention = torch.softmax(scores, dim=2)
        return (attention * v_win).sum(dim=2)


def _alternate_corr_1d(fmap1, fmap2, fmap2_d1, fmap2_d2, coords, r, h_corr):
    """Reference AlternateCorr1DOnnx.__call__ (wrapper.py:162-230)."""
    coords = coords.permute(0, 2, 3, 1)
    c = fmap1.shape[1]
    x_base = coords[..., 0]
    y_base = coords[..., 1]
    d = torch.linspace(-r, r, 2 * r + 1)
    warped = []
    for i in range(2 * r + 1):
        if h_corr:
            s = bilinear_sample_nchw(fmap2, x_base + d[i], y_base)
        else:
            s = bilinear_sample_nchw(fmap2, x_base, y_base + d[i])
        warped.append(s.unsqueeze(2))
    warped = torch.cat(warped, dim=2)  # (B, C, 2r+1, H, W)

    delta_d = torch.stack((d[0:2], d[-2:]), dim=0).reshape(-1)
    w_d1, w_d2 = [], []
    for i in range(4):
        if h_corr:
            w_d1.append(bilinear_sample_nchw(
                fmap2_d1, x_base / 2.0 + delta_d[i], y_base / 2.0).unsqueeze(2))
            w_d2.append(bilinear_sample_nchw(
                fmap2_d2, x_base / 4.0 + delta_d[i], y_base / 4.0).unsqueeze(2))
        else:
            w_d1.append(bilinear_sample_nchw(
                fmap2_d1, x_base / 2.0, y_base / 2.0 + delta_d[i]).unsqueeze(2))
            w_d2.append(bilinear_sample_nchw(
                fmap2_d2, x_base / 4.0, y_base / 4.0 + delta_d[i]).unsqueeze(2))
    w_d1 = torch.cat(w_d1, dim=2)
    w_d2 = torch.cat(w_d2, dim=2)
    warped = torch.cat(
        (w_d2[:, :, 0:2], w_d1[:, :, 0:2], warped, w_d1[:, :, -2:], w_d2[:, :, -2:]),
        dim=2,
    )
    corr = (fmap1[:, :, None, :, :] * warped).sum(dim=1)
    return corr / (c**0.5)


class TorchMeFlow(nn.Module):
    """Mirror of models/flow/meflow.py::MeFlow."""

    def __init__(self, iters=2, dim=128, radius=4):
        super().__init__()
        self.iters = iters
        self.dim = dim
        self.radius = radius
        self.fnet = TorchBasicEncoder(128, "instance")
        self.cnet = TorchBasicEncoder(2 * dim, "batch")
        self.attn_h = TorchWindow1DAttention(128, True, radius)
        self.attn_v = TorchWindow1DAttention(128, False, radius)
        self.update_block = TorchUpdateBlock(cor_planes=2 * (2 * radius + 1 + 8))

    def _coords_grid(self, b, h, w):
        y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        return torch.stack([x, y], dim=0).float()[None].repeat(b, 1, 1, 1)

    def forward(self, image1, image2):
        img1 = 2 * (image1 / 255.0) - 1.0
        img2 = 2 * (image2 / 255.0) - 1.0
        f1 = self.fnet(img1).float()
        f2 = self.fnet(img2).float()

        f2_attn_h = self.attn_h(f2)
        f2_attn_v = self.attn_v(f2)
        f2_d1 = F.avg_pool2d(f2, 2, 2)
        f2_attn_h_d1 = self.attn_h(f2_d1)
        f2_attn_v_d1 = self.attn_v(f2_d1)
        f2_d2 = F.avg_pool2d(f2_d1, 2, 2)
        f2_attn_h_d2 = self.attn_h(f2_d2)
        f2_attn_v_d2 = self.attn_v(f2_d2)

        cnet = self.cnet(img1)
        net, inp = torch.split(cnet, [self.dim, self.dim], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)

        b, _, h8, w8 = f1.shape
        coords0 = self._coords_grid(b, h8, w8)
        coords1 = coords0.clone()
        mask = None
        for _ in range(self.iters):
            flow = coords1 - coords0
            corr_h = _alternate_corr_1d(f1, f2_attn_v, f2_attn_v_d1, f2_attn_v_d2,
                                        coords1, self.radius, True)
            corr_v = _alternate_corr_1d(f1, f2_attn_h, f2_attn_h_d1, f2_attn_h_d2,
                                        coords1, self.radius, False)
            corr = torch.cat((corr_h, corr_v), dim=1)
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta

        flow_low = coords1 - coords0
        m = mask.view(b, 1, 9, 8, 8, h8, w8).softmax(dim=2)
        up = F.unfold(8 * flow_low, [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h8, w8)
        flow_up = torch.sum(m * up, dim=2)
        flow_up = flow_up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h8, 8 * w8)
        return flow_low, flow_up
