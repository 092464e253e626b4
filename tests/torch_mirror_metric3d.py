"""Test-only torch mirror of the Metric3D V2 reconstruction.

Upstream Metric3D is gitignored in the reference (it imports
``Metric3DExportModel``, ``Metric3D_V2/onnx_export.py:37-38``); parity is
established against this independent torch implementation of the
reconstructed RAFT-DPT decoder (see models/metric3d_v2.py). State-dict
naming here is the layout ``weights/convert.py::convert_metric3d_v2``
consumes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchFusionBlock


def convex_upsample_torch(x, mask, k):
    """x (B, C, h, w), mask (B, 9*k*k, h, w) -> (B, C, k*h, k*w)."""
    B, C, h, w = x.shape
    m = mask.view(B, 9, k * k, h, w).softmax(dim=1)
    patches = F.unfold(F.pad(x, (1, 1, 1, 1)), 3)  # (B, C*9, h*w)
    patches = patches.view(B, C, 9, 1, h, w)
    up = (m.unsqueeze(1) * patches).sum(dim=2)  # (B, C, k*k, h, w)
    up = up.view(B, C, k, k, h, w).permute(0, 1, 4, 2, 5, 3)
    return up.reshape(B, C, k * h, k * w)


class TorchConvGRU(nn.Module):
    def __init__(self, hidden, in_ch):
        super().__init__()
        self.convz = nn.Conv2d(hidden + in_ch, hidden, 3, 1, 1)
        self.convr = nn.Conv2d(hidden + in_ch, hidden, 3, 1, 1)
        self.convq = nn.Conv2d(hidden + in_ch, hidden, 3, 1, 1)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = self.convz(hx).sigmoid()
        r = self.convr(hx).sigmoid()
        q = self.convq(torch.cat([r * h, x], dim=1)).tanh()
        return (1 - z) * h + z * q


class TorchDPTNeck(nn.Module):
    def __init__(self, in_ch, features, out_channels):
        super().__init__()
        self.projects = nn.ModuleList([nn.Conv2d(in_ch, oc, 1) for oc in out_channels])
        self.resize_layers = nn.ModuleList(
            [
                nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, 4),
                nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, 2),
                nn.Identity(),
                nn.Conv2d(out_channels[3], out_channels[3], 3, 2, 1),
            ]
        )
        self.layer1_rn = nn.Conv2d(out_channels[0], features, 3, 1, 1, bias=False)
        self.layer2_rn = nn.Conv2d(out_channels[1], features, 3, 1, 1, bias=False)
        self.layer3_rn = nn.Conv2d(out_channels[2], features, 3, 1, 1, bias=False)
        self.layer4_rn = nn.Conv2d(out_channels[3], features, 3, 1, 1, bias=False)
        self.refinenet4 = TorchFusionBlock(features)
        self.refinenet3 = TorchFusionBlock(features)
        self.refinenet2 = TorchFusionBlock(features)

    def forward(self, feats, ph, pw):
        out = []
        for i, (tokens, _cls) in enumerate(feats):
            B, N, D = tokens.shape
            x = tokens.permute(0, 2, 1).reshape(B, D, ph, pw)
            x = self.resize_layers[i](self.projects[i](x))
            out.append(x)
        l1, l2, l3, l4 = out
        l1 = self.layer1_rn(l1)
        l2 = self.layer2_rn(l2)
        l3 = self.layer3_rn(l3)
        l4 = self.layer4_rn(l4)
        p4 = self.refinenet4(l4, size=l3.shape[2:])
        p3 = self.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.refinenet2(p3, l2, size=(2 * ph, 2 * pw))
        return p2


class TorchMetric3DV2(nn.Module):
    DEPTH_RANGE = (0.3, 150.0)

    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 hidden=128, iters=4, k=7, patch=14, pretrain_img=518):
        super().__init__()
        self.idxs = idxs
        self.iters = iters
        self.k = k
        self.patch = patch
        self.encoder = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img,
                                    num_register_tokens=4)
        self.neck = TorchDPTNeck(dim, features, out_channels)
        self.context_conv = nn.Conv2d(features, 2 * hidden, 3, 1, 1)
        self.init_head = nn.Conv2d(features, 4, 3, 1, 1)
        self.gru = TorchConvGRU(hidden, 2 * hidden)
        self.pred_encoder = nn.Conv2d(4, hidden, 3, 1, 1)
        self.delta_head = nn.Conv2d(hidden, 4, 3, 1, 1)
        self.mask_head = nn.Conv2d(hidden, 9 * k * k, 1)
        self.conf_head = nn.Conv2d(hidden, 1, 3, 1, 1)
        self.hidden = hidden

    def forward(self, x):
        B, _, H, W = x.shape
        ph, pw = H // self.patch, W // self.patch
        feats = self.encoder.get_intermediate_layers(x, self.idxs)
        ctx = self.neck(feats, ph, pw)
        cnet = self.context_conv(ctx)
        h, inp = torch.split(cnet, [self.hidden, self.hidden], dim=1)
        h = h.tanh()
        inp = F.relu(inp)
        pred = self.init_head(ctx).float()
        for _ in range(self.iters):
            e = F.relu(self.pred_encoder(pred))
            h = self.gru(h, torch.cat([inp, e], dim=1))
            pred = pred + self.delta_head(h).float()
        mask = self.mask_head(h)
        conf = self.conf_head(h).float()
        up = convex_upsample_torch(
            torch.cat([pred, conf], dim=1), mask, self.k
        ).float()
        d_min, d_max = self.DEPTH_RANGE
        depth = d_min + (d_max - d_min) * up[:, 0].sigmoid()
        normal = up[:, 1:4]
        normal = normal / normal.norm(dim=1, keepdim=True).clamp_min(1e-6)
        confidence = up[:, 4].sigmoid()
        return depth, normal, confidence
