"""Torch mirror of SIDepth (SSI estimator + SI conditioning network).

Defines the state-dict layout ``weights/convert.py::convert_sidepth``
consumes (the reference ``later/SIDepth/`` is README-only — it vendors no
code — so the two-stage topology of the published method (SIGGRAPH 2024
"Scale-Invariant Monocular Depth Estimation via SSI Depth") is frozen by
this mirror).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchDPTHead
from torch_mirror_prior import TorchResidualDPTHead


class TorchSIDepth(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518):
        super().__init__()
        self.idxs = idxs
        self.ssi = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.ssi_head = TorchDPTHead(dim, features, out_channels, patch,
                                     metric=False)
        self.si = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img,
                               in_ch=4)
        self.si_head = TorchResidualDPTHead(dim, features, out_channels, patch)

    def forward(self, image):
        ph, pw = image.shape[2] // 14, image.shape[3] // 14
        feats = self.ssi.get_intermediate_layers(image, self.idxs)
        ssi = F.relu(self.ssi_head(feats, ph, pw).squeeze(1))

        norm = ssi / (ssi.amax(dim=(1, 2), keepdim=True) + 1e-6)
        cond = torch.cat([image, norm[:, None]], dim=1)
        cfeats = self.si.get_intermediate_layers(cond, self.idxs)
        r = self.si_head(cfeats, ph, pw).squeeze(1)
        return ssi, torch.exp(r.clamp(-6.0, 6.0))
