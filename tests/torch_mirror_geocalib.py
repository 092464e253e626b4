"""Torch mirror of the GeoCalib perspective-field network.

Defines the state-dict layout ``weights/convert.py::convert_geocalib``
consumes (the solver itself is parameter-free math, tested separately
against synthetic cameras in ``test_parity_geocalib.py``).
"""

import math

import torch
import torch.nn as nn

from torch_mirror import TorchDinoViT
from torch_mirror_prior import TorchResidualDPTHead


class TorchGeoCalib(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518):
        super().__init__()
        self.idxs = idxs
        self.backbone = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.head = TorchResidualDPTHead(dim, features, out_channels, patch,
                                         n_out=5)

    def forward(self, x):
        ph, pw = x.shape[2] // 14, x.shape[3] // 14
        feats = self.backbone.get_intermediate_layers(x, self.idxs)
        out = self.head(feats, ph, pw).permute(0, 2, 3, 1)  # (B, H, W, 5)
        up = out[..., 0:2]
        up = up / (up.norm(dim=-1, keepdim=True) + 1e-8)
        lat = (math.pi / 2.0) * torch.tanh(out[..., 2])
        return {
            "up_field": up,
            "latitude_field": lat,
            "up_confidence": torch.sigmoid(out[..., 3]),
            "latitude_confidence": torch.sigmoid(out[..., 4]),
        }
