"""Torch mirror of Prior Depth Anything (frozen MDE + conditioned refiner).

Defines the state-dict layout ``weights/convert.py::convert_prior_depth``
consumes (the reference gitignores the upstream repo; the plugin API it pins
is ``PriorDARefiner.predict(image, depth_map, confidence)``,
``later/Prior_Depth_Anything/infer.py:210-216``).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchDPTHead
from torch_mirror_flashdepth import _Scratch


class TorchResidualDPTHead(nn.Module):
    """DA-V2 DPT layout with NO terminal activation (log-residual head);
    ``n_out`` widens the final conv for multi-channel field heads."""

    def __init__(self, in_ch, features, out_channels, patch=14, n_out=1):
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
        self.scratch = _Scratch(out_channels, features, n_out)

    def forward(self, out_features, ph, pw):
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
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = F.interpolate(out, (ph * self.patch, pw * self.patch),
                            mode="bilinear", align_corners=True)
        return self.scratch.output_conv2(out)


def torch_scale_shift_align(pred, prior, weight, eps=1e-6):
    w = weight
    sw = w.sum(dim=(1, 2)) + eps
    swp = (w * pred).sum(dim=(1, 2))
    swq = (w * prior).sum(dim=(1, 2))
    swpp = (w * pred * pred).sum(dim=(1, 2))
    swpq = (w * pred * prior).sum(dim=(1, 2))
    det = sw * swpp - swp * swp
    det = torch.where(det.abs() < eps, torch.full_like(det, eps), det)
    s = (sw * swpq - swp * swq) / det
    t = (swpp * swq - swp * swpq) / det
    return s, t


class TorchPriorDARefiner(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518):
        super().__init__()
        self.idxs = idxs
        self.mde = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.mde_head = TorchDPTHead(dim, features, out_channels, patch,
                                     metric=False)
        self.cond = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img,
                                 in_ch=6)
        self.refine_head = TorchResidualDPTHead(dim, features, out_channels,
                                                patch)

    def forward(self, image, prior, confidence):
        # image (B, 3, H, W); prior/confidence (B, H, W)
        ph, pw = image.shape[2] // 14, image.shape[3] // 14
        feats = self.mde.get_intermediate_layers(image, self.idxs)
        mde = F.relu(self.mde_head(feats, ph, pw).squeeze(1))

        conf = confidence.clamp(min=0.0)
        s, t = torch_scale_shift_align(mde, prior, conf)
        aligned = s[:, None, None] * mde + t[:, None, None]
        b = conf / (conf.amax(dim=(1, 2), keepdim=True) + 1e-6)
        comp = b * prior + (1.0 - b) * aligned

        def _norm(x):
            return x / (x.amax(dim=(1, 2), keepdim=True) + 1e-6)

        cond = torch.cat(
            [image, _norm(comp)[:, None], b[:, None], _norm(mde)[:, None]],
            dim=1,
        )
        cfeats = self.cond.get_intermediate_layers(cond, self.idxs)
        r = self.refine_head(cfeats, ph, pw).squeeze(1)
        return comp * torch.exp(r.clamp(-3.0, 3.0))
