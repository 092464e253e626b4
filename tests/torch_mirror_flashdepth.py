"""Torch mirror of FlashDepth (DINOv2 + temporal-Mamba DPT).

Defines the state-dict layout ``weights/convert.py::convert_flashdepth``
consumes (the reference gitignores the upstream FlashDepth repo; the wrapper
pins only the serving contract, ``later/FlashDepth/wrapper.py:9-25``).
Mamba parameter names follow the official ``mamba_ssm`` block (in_proj,
conv1d, x_proj, dt_proj, A_log, D, out_proj).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchFusionBlock


class TorchMambaBlock(nn.Module):
    def __init__(self, d_model, d_state=16, d_conv=4, expand=2):
        super().__init__()
        self.d_model, self.d_state, self.d_conv = d_model, d_state, d_conv
        self.d_inner = expand * d_model
        self.dt_rank = math.ceil(d_model / 16)
        self.in_proj = nn.Linear(d_model, 2 * self.d_inner, bias=False)
        self.conv1d = nn.Conv1d(self.d_inner, self.d_inner, d_conv,
                                groups=self.d_inner, bias=True)
        self.x_proj = nn.Linear(self.d_inner,
                                self.dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(self.dt_rank, self.d_inner)
        self.A_log = nn.Parameter(
            torch.log(torch.arange(1, d_state + 1, dtype=torch.float32))
            .expand(self.d_inner, d_state).contiguous()
        )
        self.D = nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=False)

    def init_state(self, batch, n):
        return {
            "conv": torch.zeros(batch, n, self.d_conv - 1, self.d_inner),
            "ssm": torch.zeros(batch, n, self.d_inner, self.d_state),
        }

    def forward(self, x, state):
        # x: (B, N, d_model) — one time step
        xz = self.in_proj(x)
        xi, z = xz.chunk(2, dim=-1)
        window = torch.cat([state["conv"], xi.unsqueeze(2)], dim=2)
        w = self.conv1d.weight[:, 0, :].t()  # (d_conv, d_inner)
        xc = torch.einsum("bnkd,kd->bnd", window, w) + self.conv1d.bias
        xc = F.silu(xc)
        new_conv = window[:, :, 1:]

        dbc = self.x_proj(xc)
        dt, B, C = torch.split(
            dbc, [self.dt_rank, self.d_state, self.d_state], dim=-1
        )
        dt = F.softplus(self.dt_proj(dt))
        A = -torch.exp(self.A_log)
        h = state["ssm"]
        dA = torch.exp(dt.unsqueeze(-1) * A)
        dBx = dt.unsqueeze(-1) * B.unsqueeze(2) * xc.unsqueeze(-1)
        h = dA * h + dBx
        y = torch.einsum("bnds,bns->bnd", h, C) + self.D * xc
        y = y * F.silu(z)
        return self.out_proj(y), {"conv": new_conv, "ssm": h}


class _Scratch(nn.Module):
    """DA-V2 scratch naming, final head WITHOUT a terminal activation
    (the wrapper clips at 0 outside, wrapper.py:23). ``n_out`` widens the
    final 1x1 conv (multi-channel heads, e.g. GeoCalib's 5 fields)."""

    def __init__(self, out_channels, features, n_out=1):
        super().__init__()
        self.layer1_rn = nn.Conv2d(out_channels[0], features, 3, 1, 1, bias=False)
        self.layer2_rn = nn.Conv2d(out_channels[1], features, 3, 1, 1, bias=False)
        self.layer3_rn = nn.Conv2d(out_channels[2], features, 3, 1, 1, bias=False)
        self.layer4_rn = nn.Conv2d(out_channels[3], features, 3, 1, 1, bias=False)
        self.refinenet1 = TorchFusionBlock(features)
        self.refinenet2 = TorchFusionBlock(features)
        self.refinenet3 = TorchFusionBlock(features)
        self.refinenet4 = TorchFusionBlock(features)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, n_out, 1),
        )


class TorchTemporalDPTHead(nn.Module):
    def __init__(self, in_ch, features, out_channels, patch=14,
                 d_state=16, d_conv=4, expand=2):
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
        self.scratch = _Scratch(out_channels, features)
        self.temporal_norm = nn.LayerNorm(features, eps=1e-6)
        self.mamba = TorchMambaBlock(features, d_state, d_conv, expand)

    def forward(self, out_features, ph, pw, state):
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

        b, c, hh, ww = p4.shape
        tok = p4.flatten(2).permute(0, 2, 1)  # (B, N, C)
        m, new_state = self.mamba(self.temporal_norm(tok), state)
        p4 = (tok + m).permute(0, 2, 1).reshape(b, c, hh, ww)

        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = F.interpolate(out, (ph * self.patch, pw * self.patch),
                            mode="bilinear", align_corners=True)
        return self.scratch.output_conv2(out), new_state


class TorchFlashDepth(nn.Module):
    def __init__(self, dim, depth, num_heads, features, out_channels, idxs,
                 patch=14, pretrain_img=518, d_state=16, d_conv=4, expand=2):
        super().__init__()
        self.idxs = idxs
        self.pretrained = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.depth_head = TorchTemporalDPTHead(
            dim, features, out_channels, patch, d_state, d_conv, expand
        )

    def init_state(self, batch, ph, pw):
        return self.depth_head.mamba.init_state(batch, ph * pw)

    def forward(self, frames, state=None):
        """frames: (B, S, 3, H, W) -> depths (B, S, H, W), final state.
        Streams one frame at a time (later/FlashDepth/infer.py:104-130)."""
        B, S, _, H, W = frames.shape
        ph, pw = H // 14, W // 14
        if state is None:
            state = self.init_state(B, ph, pw)
        depths = []
        for s in range(S):
            feats = self.pretrained.get_intermediate_layers(
                frames[:, s], self.idxs
            )
            d, state = self.depth_head(feats, ph, pw, state)
            depths.append(torch.clip(d.squeeze(1), min=0))
        return torch.stack(depths, dim=1), state
