"""Torch mirror of Align3R (DUSt3R-style two-view decoder + depth priors).

Defines the state-dict layout ``weights/convert.py::convert_align3r``
consumes (the reference ``later/Align3R/`` is README-only — it vendors no
code — so the topology of the published model (arXiv:2412.03079) is frozen
by this mirror).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT
from torch_mirror_vggt import TorchVGGTDPT

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class TorchCrossBlock(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_q = nn.Linear(dim, dim)
        self.self_kv = nn.Linear(dim, 2 * dim)
        self.self_proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.cross_q = nn.Linear(dim, dim)
        self.cross_kv = nn.Linear(dim, 2 * dim)
        self.cross_proj = nn.Linear(dim, dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def _attn(self, q_tok, kv_tok, wq, wkv, wproj):
        b, n, c = q_tok.shape
        hd = c // self.num_heads
        q = wq(q_tok).reshape(b, n, self.num_heads, hd).transpose(1, 2)
        kv = wkv(kv_tok).reshape(b, -1, 2, self.num_heads, hd)
        k, v = kv[:, :, 0].transpose(1, 2), kv[:, :, 1].transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, c)
        return wproj(o)

    def forward(self, x, other):
        h = self.norm1(x)
        x = x + self._attn(h, h, self.self_q, self.self_kv, self.self_proj)
        x = x + self._attn(self.norm2(x), self.norm_y(other),
                           self.cross_q, self.cross_kv, self.cross_proj)
        x = x + self.fc2(F.gelu(self.fc1(self.norm3(x))))
        return x


class TorchAlign3R(nn.Module):
    def __init__(self, enc_dim, enc_depth, enc_heads, dec_dim, dec_depth,
                 dec_heads, features, out_channels, out_indices,
                 patch=16, pretrain_img=64):
        super().__init__()
        self.patch = patch
        self.out_indices = tuple(out_indices)
        self.encoder = TorchDinoViT(enc_dim, enc_depth, enc_heads, patch,
                                    pretrain_img)
        self.decoder_embed = nn.Linear(enc_dim, dec_dim)
        self.prior_embed = nn.Conv2d(1, dec_dim, patch, patch)
        self.dec1 = nn.ModuleList(
            [TorchCrossBlock(dec_dim, dec_heads) for _ in range(dec_depth)]
        )
        self.dec2 = nn.ModuleList(
            [TorchCrossBlock(dec_dim, dec_heads) for _ in range(dec_depth)]
        )
        self.head1 = TorchVGGTDPT(dec_dim, features, out_channels,
                                  patch=patch, n_out=4)
        self.head2 = TorchVGGTDPT(dec_dim, features, out_channels,
                                  patch=patch, n_out=4)

    @staticmethod
    def _pts_conf(out4):
        xyz = out4[:, :3]
        pts = torch.sign(xyz) * torch.expm1(xyz.abs().clamp(0, 10))
        conf = 1.0 + out4[:, 3].clamp(-10, 10).exp()
        return pts.permute(0, 2, 3, 1), conf

    def forward(self, img1, img2, prior1, prior2):
        b, _, H, W = img1.shape
        p = self.patch
        ph, pw = H // p, W // p

        x = torch.cat([img1, img2], dim=0) / 255.0
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        x = (x - mean) / std
        enc = self.encoder.get_intermediate_layers(
            x, (self.encoder_depth - 1,)
        )[0][0]
        tok = self.decoder_embed(enc)

        pri = torch.cat([prior1, prior2], dim=0).unsqueeze(1).float()
        mu = pri.mean(dim=(1, 2, 3), keepdim=True)
        sd = pri.std(dim=(1, 2, 3), unbiased=False, keepdim=True) + 1e-6
        pri = (pri - mu) / sd
        pri_tok = self.prior_embed(pri).flatten(2).transpose(1, 2)
        tok = tok + pri_tok

        x1, x2 = tok[:b], tok[b:]
        taps1, taps2 = [], []
        for i, (b1, b2) in enumerate(zip(self.dec1, self.dec2)):
            n1 = b1(x1, x2)
            n2 = b2(x2, x1)
            x1, x2 = n1, n2
            if i in self.out_indices:
                taps1.append(x1)
                taps2.append(x2)

        pts1, conf1 = self._pts_conf(self.head1(taps1, ph, pw))
        pts2, conf2 = self._pts_conf(self.head2(taps2, ph, pw))
        return pts1, conf1, pts2, conf2

    @property
    def encoder_depth(self):
        return len(self.encoder.blocks)
