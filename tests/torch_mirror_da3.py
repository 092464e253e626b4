"""Test-only torch mirror of the DA-V3 reconstruction (dual DPT head).

Upstream ``depth_anything_3`` is gitignored in the reference
(``Depth_Anything_V3/infer.py:11``). State-dict naming here is the layout
``weights/convert.py::convert_depth_anything_v3`` consumes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchFusionBlock


class TorchDualDPTHead(nn.Module):
    def __init__(self, in_ch, features, out_channels, patch=14):
        super().__init__()
        self.patch = patch
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
        self.refinenet1 = TorchFusionBlock(features)
        self.refinenet2 = TorchFusionBlock(features)
        self.refinenet3 = TorchFusionBlock(features)
        self.refinenet4 = TorchFusionBlock(features)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        half = features // 2
        self.depth_branch = nn.Sequential(
            nn.Conv2d(half, 32, 3, 1, 1), nn.ReLU(True), nn.Conv2d(32, 1, 1)
        )
        self.sky_branch = nn.Sequential(
            nn.Conv2d(half, 32, 3, 1, 1), nn.ReLU(True), nn.Conv2d(32, 1, 1)
        )

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
        p2 = self.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.refinenet1(p2, l1)
        y = self.output_conv1(p1)
        y = F.interpolate(y, (ph * self.patch, pw * self.patch), mode="bilinear",
                          align_corners=True)
        return self.depth_branch(y)[:, 0], self.sky_branch(y)[:, 0]


class TorchDepthAnythingV3(nn.Module):
    """Mirror of models/depth_anything_v3.py::DepthAnythingV3."""

    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518):
        super().__init__()
        self.idxs = idxs
        self.patch = patch
        self.backbone = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.head = TorchDualDPTHead(dim, features, out_channels, patch)

    def forward(self, x):
        ph, pw = x.shape[2] // self.patch, x.shape[3] // self.patch
        feats = self.backbone.get_intermediate_layers(x, self.idxs)
        depth, sky = self.head(feats, ph, pw)
        return depth.float().exp(), sky.float().sigmoid()
