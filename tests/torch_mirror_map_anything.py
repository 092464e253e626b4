"""Torch mirror of MapAnything (multi-view rays x depth-along-ray x scale).

Defines the state-dict layout ``weights/convert.py::convert_map_anything``
consumes. Reuses the VGGT mirror trunk (aggregator / camera head / DPT) —
upstream MapAnything shares that multi-view alternating-attention design.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror_vggt import TorchAggregator, TorchCameraHead, TorchVGGTDPT


class TorchMapAnythingDenseHead(nn.Module):
    def __init__(self, in_ch, features, out_channels):
        super().__init__()
        self.dpt = TorchVGGTDPT(in_ch, features, out_channels, n_out=6)

    def forward(self, agg_tokens, ph, pw, num_special):
        B, S = agg_tokens[0].shape[:2]
        feats = [
            t[:, :, num_special:].reshape(B * S, ph * pw, t.shape[-1])
            for t in agg_tokens
        ]
        out = self.dpt(feats, ph, pw).float().permute(0, 2, 3, 1)  # (B*S,H,W,6)
        ray = torch.cat(
            [out[..., 0:2], F.softplus(out[..., 2:3]) + 1e-3], dim=-1
        )
        ray = ray / ray.norm(dim=-1, keepdim=True)
        dar = out[..., 3].clamp(-10, 10).exp()
        conf = 1.0 + out[..., 4].clamp(-10, 10).exp()
        logits = out[..., 5]
        H, W = ph * 14, pw * 14
        return (
            ray.reshape(B, S, H, W, 3),
            dar.reshape(B, S, H, W),
            conf.reshape(B, S, H, W),
            logits.reshape(B, S, H, W),
        )


class TorchMapAnything(nn.Module):
    def __init__(self, vit_dim, vit_depth, vit_heads, dim, depth, num_heads,
                 head_layers, grid_hw, num_register_tokens=4,
                 head_features=16, head_out_channels=(8, 16, 32, 32),
                 pretrain_img=70):
        super().__init__()
        self.num_special = 1 + num_register_tokens
        self.grid_hw = grid_hw
        self.aggregator = TorchAggregator(
            vit_dim, vit_depth, vit_heads, dim, depth, num_heads,
            num_register_tokens, head_layers, grid_hw, pretrain_img,
        )
        self.dense_head = TorchMapAnythingDenseHead(
            2 * dim, head_features, head_out_channels
        )
        self.camera_head = TorchCameraHead(2 * dim, trunk_depth=4,
                                           num_heads=num_heads)
        self.scale_fc1 = nn.Linear(2 * dim, 256)
        self.scale_fc2 = nn.Linear(256, 1)

    def forward(self, views):
        agg = self.aggregator(views)
        ph, pw = self.grid_hw
        ray, dar, conf, logits = self.dense_head(agg, ph, pw, self.num_special)
        pose = self.camera_head(agg[-1])
        pooled = agg[-1][:, :, 0].float().mean(dim=1)
        msf = self.scale_fc2(F.gelu(self.scale_fc1(pooled)))
        msf = msf[..., 0].clamp(-10, 10).exp()
        return ray, dar, conf, logits, pose, msf
