"""Torch mirror of WAFT (warping-alone flow on a DINOv2 backbone).

Defines the state-dict layout ``weights/convert.py::convert_waft`` consumes
(the reference ``later/WAFT/`` is README-only — it vendors no code — so the
topology of the published model (arXiv:2506.21526) is frozen by this
mirror). The warp uses the same four-gather zero-pad bilinear formulation as
``ops/flow_sampler.py`` (the reference's own ONNX-friendly sampler spec,
``RAFT/wrapper.py:11-70``).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT
from torch_mirror_raft import TorchSepConvGRU

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
UP = 7


def bilinear_sample_nchw(fmap, x, y):
    """Zero-pad bilinear gather at pixel coords; fmap (B,C,H,W), x/y (B,h,w)."""
    b, c, hh, ww = fmap.shape
    x0 = torch.floor(x)
    y0 = torch.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx, wy = x - x0, y - y0
    ws = [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy]
    flat = fmap.flatten(2)  # (B, C, H*W)
    out = 0
    for (yc, xc), wgt in zip([(y0, x0), (y0, x1), (y1, x0), (y1, x1)], ws):
        valid = ((xc >= 0) & (xc <= ww - 1) & (yc >= 0) & (yc <= hh - 1)).float()
        idx = (yc.clamp(0, hh - 1) * ww + xc.clamp(0, ww - 1)).long()
        v = torch.gather(
            flat, 2, idx.flatten(1).unsqueeze(1).expand(-1, c, -1)
        ).view(b, c, *x.shape[1:])
        out = out + v * (wgt * valid).unsqueeze(1)
    return out


def upsample_flow_convex_k(flow, mask, k):
    b, _, h, w = flow.shape
    m = torch.softmax(mask.view(b, 9, k * k, h, w), dim=1)
    fl = F.unfold(float(k) * flow, 3, padding=1).view(b, 2, 9, h, w)
    up = torch.einsum("bqkhw,bcqhw->bckhw", m, fl)  # (B,2,k*k,h,w)
    up = up.view(b, 2, k, k, h, w).permute(0, 1, 4, 2, 5, 3)
    return up.reshape(b, 2, k * h, k * w)


class TorchWarpUpdateBlock(nn.Module):
    def __init__(self, hidden=128):
        super().__init__()
        self.enc_conv1 = nn.Conv2d(128 * 3 + 2, 192, 3, padding=1)
        self.enc_conv2 = nn.Conv2d(192, 126, 3, padding=1)
        self.gru = TorchSepConvGRU(hidden, 256)
        self.flow_head_conv1 = nn.Conv2d(hidden, 256, 3, padding=1)
        self.flow_head_conv2 = nn.Conv2d(256, 2, 3, padding=1)
        self.mask_conv0 = nn.Conv2d(hidden, 256, 3, padding=1)
        self.mask_conv2 = nn.Conv2d(256, UP * UP * 9, 1)

    def forward(self, net, inp, f1, warped, flow):
        cost = f1 * warped
        x = torch.cat([f1, warped, cost, flow], dim=1)
        m = F.relu(self.enc_conv1(x))
        m = F.relu(self.enc_conv2(m))
        motion = torch.cat([m, flow], dim=1)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        d = F.relu(self.flow_head_conv1(net))
        delta = self.flow_head_conv2(d)
        mk = F.relu(self.mask_conv0(net))
        mask = 0.25 * self.mask_conv2(mk)
        return net, mask, delta


class TorchWAFT(nn.Module):
    def __init__(self, dim, depth, num_heads, iters=8, hidden=128,
                 patch=14, pretrain_img=518):
        super().__init__()
        self.iters = iters
        self.hidden = hidden
        self.idxs = (depth // 2 - 1, depth - 1)
        self.pretrained = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.feat_proj = nn.Conv2d(2 * dim, 256, 1)
        self.feat_up = nn.ConvTranspose2d(256, 128, 2, 2)
        self.ctx_proj = nn.Conv2d(2 * dim, 256, 1)
        self.ctx_up = nn.ConvTranspose2d(256, 256, 2, 2)
        self.update_block = TorchWarpUpdateBlock(hidden)

    def forward(self, image1, image2):
        b, _, H, W = image1.shape
        ph, pw = H // 14, W // 14
        h, w = 2 * ph, 2 * pw

        x = torch.cat([image1, image2], dim=0) / 255.0
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        x = (x - mean) / std

        taps = self.pretrained.get_intermediate_layers(x, self.idxs)
        tok = torch.cat([t[0] for t in taps], dim=-1)  # (2B, N, 2D)
        grid = tok.permute(0, 2, 1).reshape(2 * b, -1, ph, pw)

        feat = self.feat_up(self.feat_proj(grid))
        f1, f2 = feat[:b], feat[b:]
        ctx = self.ctx_up(self.ctx_proj(grid[:b]))
        net = torch.tanh(ctx[:, : self.hidden])
        inp = F.relu(ctx[:, self.hidden:])

        gy, gx = torch.meshgrid(
            torch.arange(h, dtype=torch.float32),
            torch.arange(w, dtype=torch.float32), indexing="ij",
        )
        gx = gx[None].expand(b, -1, -1)
        gy = gy[None].expand(b, -1, -1)
        flow = torch.zeros(b, 2, h, w)
        mask = None
        for _ in range(self.iters):
            warped = bilinear_sample_nchw(f2, gx + flow[:, 0], gy + flow[:, 1])
            net, mask, delta = self.update_block(net, inp, f1, warped, flow)
            flow = flow + delta

        flow_up = upsample_flow_convex_k(flow, mask, UP)
        return flow, flow_up
