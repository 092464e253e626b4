"""Test-only torch mirror of VGGT (aggregator + depth/camera heads).

Upstream VGGT is gitignored in the reference (``VGGT/onnx_export.py`` imports
it after rope.py surgery); parity is established against this independent
torch implementation of the alternating-attention aggregator with 2D RoPE,
the single 2-channel DPT depth head, and the iterative adaLN camera head
(see models/vggt.py). State-dict naming is the layout
``weights/convert.py::convert_vggt`` consumes.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchFusionBlock, TorchLayerScale, TorchMlp


def rope_2d_tables(ph, pw, head_dim, base=100.0):
    d4 = head_dim // 4
    freqs = 1.0 / (base ** (torch.arange(d4, dtype=torch.float32) / d4))
    ys = torch.arange(ph, dtype=torch.float32).repeat_interleave(pw)
    xs = torch.arange(pw, dtype=torch.float32).repeat(ph)
    ang = torch.cat([ys[:, None] * freqs[None], xs[:, None] * freqs[None]], dim=-1)
    return ang.cos(), ang.sin()


def apply_rope_torch(q, cos, sin):
    q1 = q[..., 0::2]
    q2 = q[..., 1::2]
    rq1 = q1 * cos - q2 * sin
    rq2 = q1 * sin + q2 * cos
    return torch.stack([rq1, rq2], dim=-1).reshape(q.shape)


class TorchRopeAttention(nn.Module):
    def __init__(self, dim, num_heads, num_special, grid_hw):
        super().__init__()
        self.num_heads = num_heads
        self.num_special = num_special
        self.grid_hw = grid_hw
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, views=1):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, H, N, d)
        ph, pw = self.grid_hw
        n_per_view = self.num_special + ph * pw
        cos, sin = rope_2d_tables(ph, pw, hd)

        def rotate(t):
            tv = t.reshape(B, self.num_heads, views, n_per_view, hd)
            special = tv[:, :, :, : self.num_special]
            patches = apply_rope_torch(tv[:, :, :, self.num_special :], cos, sin)
            return torch.cat([special, patches], dim=3).reshape(t.shape)

        q = rotate(q)
        k = rotate(k)
        s = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        p = s.softmax(dim=-1)
        o = (p @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(o)


class TorchAABlock(nn.Module):
    def __init__(self, dim, num_heads, num_special, grid_hw):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchRopeAttention(dim, num_heads, num_special, grid_hw)
        self.ls1 = TorchLayerScale(dim, init=0.01)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, dim * 4)
        self.ls2 = TorchLayerScale(dim, init=0.01)

    def forward(self, x, views=1):
        x = x + self.ls1(self.attn(self.norm1(x), views))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchAggregator(nn.Module):
    def __init__(self, vit_dim, vit_depth, vit_heads, dim, depth, num_heads,
                 num_register_tokens, head_layers, grid_hw, pretrain_img=518):
        super().__init__()
        self.head_layers = head_layers
        self.depth = depth
        self.num_register_tokens = num_register_tokens
        self.grid_hw = grid_hw
        self.patch_embed = TorchDinoViT(vit_dim, vit_depth, vit_heads,
                                        pretrain_img=pretrain_img)
        self.vit_depth = vit_depth
        if vit_dim != dim:
            self.input_proj = nn.Linear(vit_dim, dim)
        else:
            self.input_proj = None
        self.camera_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.register_tokens = nn.Parameter(torch.zeros(1, num_register_tokens, dim))
        num_special = 1 + num_register_tokens
        self.frame_blocks = nn.ModuleList(
            [TorchAABlock(dim, num_heads, num_special, grid_hw) for _ in range(depth)]
        )
        self.global_blocks = nn.ModuleList(
            [TorchAABlock(dim, num_heads, num_special, grid_hw) for _ in range(depth)]
        )

    def forward(self, views):
        B, S, C, H, W = views.shape
        flat = views.reshape(B * S, C, H, W)
        patch_tokens, _cls = self.patch_embed.get_intermediate_layers(
            flat, (self.vit_depth - 1,)
        )[0]
        if self.input_proj is not None:
            patch_tokens = self.input_proj(patch_tokens)
        dim = patch_tokens.shape[-1]
        tokens = torch.cat(
            [
                self.camera_token.expand(B * S, -1, -1),
                self.register_tokens.expand(B * S, -1, -1),
                patch_tokens,
            ],
            dim=1,
        )
        n_view = tokens.shape[1]
        saved = {}
        x = tokens
        for i in range(self.depth):
            x = self.frame_blocks[i](x, views=1)
            frame_out = x
            xg = x.reshape(B, S * n_view, dim)
            xg = self.global_blocks[i](xg, views=S)
            x = xg.reshape(B * S, n_view, dim)
            if i in set(self.head_layers):
                cat = torch.cat([frame_out, x], dim=-1)
                saved[i] = cat.reshape(B, S, n_view, 2 * dim)
        return [saved[i] for i in self.head_layers]


class TorchVGGTDPT(nn.Module):
    """DPT trunk with an ``n_out``-channel output, no final act
    (VGGT depth+conf = 2; MapAnything dense head = 6)."""

    def __init__(self, in_ch, features, out_channels, patch=14, n_out=2):
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
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, n_out, 1),
        )

    def forward(self, feats, ph, pw):
        out = []
        for i, tokens in enumerate(feats):
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
        return self.output_conv2(y)


class TorchVGGTDepthHead(nn.Module):
    def __init__(self, in_ch, features=256, out_channels=(256, 512, 1024, 1024)):
        super().__init__()
        self.dpt = TorchVGGTDPT(in_ch, features, out_channels)

    def forward(self, agg_tokens, ph, pw, num_special):
        B, S = agg_tokens[0].shape[:2]
        feats = [
            t[:, :, num_special:].reshape(B * S, ph * pw, t.shape[-1])
            for t in agg_tokens
        ]
        out = self.dpt(feats, ph, pw).float()  # (B*S, 2, H, W)
        depth = out[:, 0].clamp(-10, 10).exp()
        conf = 1.0 + out[:, 1].clamp(-10, 10).exp()
        H, W = ph * 14, pw * 14
        return depth.reshape(B, S, H, W), conf.reshape(B, S, H, W)


class TorchVGGTPointHead(nn.Module):
    """Upstream point head: pts3d (sign-preserving inv_log) + conf (expp1)."""

    def __init__(self, in_ch, features=256, out_channels=(256, 512, 1024, 1024)):
        super().__init__()
        self.dpt = TorchVGGTDPT(in_ch, features, out_channels, n_out=4)

    def forward(self, agg_tokens, ph, pw, num_special):
        B, S = agg_tokens[0].shape[:2]
        feats = [
            t[:, :, num_special:].reshape(B * S, ph * pw, t.shape[-1])
            for t in agg_tokens
        ]
        out = self.dpt(feats, ph, pw).float()  # (B*S, 4, H, W)
        xyz = out[:, :3]
        pts = torch.sign(xyz) * torch.expm1(xyz.abs().clamp(0, 10))
        conf = 1.0 + out[:, 3].clamp(-10, 10).exp()
        H, W = ph * 14, pw * 14
        return (pts.permute(0, 2, 3, 1).reshape(B, S, H, W, 3),
                conf.reshape(B, S, H, W))


class TorchPoseBranch(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim // 2)
        self.fc2 = nn.Linear(dim // 2, 9)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchCameraBlock(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.ls1 = TorchLayerScale(dim, init=0.01)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, dim * 4)
        self.ls2 = TorchLayerScale(dim, init=0.01)

    def forward(self, x):
        B, S, D = x.shape
        hd = D // self.num_heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, S, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = torch.einsum("bshd,bthd->bhst", q, k) / math.sqrt(hd)
        p = s.softmax(dim=-1)
        o = torch.einsum("bhst,bthd->bshd", p, v).reshape(B, S, D)
        x = x + self.ls1(self.proj(o))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchCameraHead(nn.Module):
    def __init__(self, dim, trunk_depth=4, num_heads=16, num_iterations=4):
        super().__init__()
        self.num_iterations = num_iterations
        self.token_norm = nn.LayerNorm(dim, eps=1e-6)
        self.embed_pose = nn.Linear(9, dim)
        self.poseLN_modulation = nn.Linear(dim, 3 * dim)
        self.adaln_norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.trunk = nn.ModuleList(
            [TorchCameraBlock(dim, num_heads) for _ in range(trunk_depth)]
        )
        self.pose_branch = TorchPoseBranch(dim)

    def forward(self, tokens):
        cam = tokens[:, :, 0]
        B, S, D = cam.shape
        pose_tokens = self.token_norm(cam)
        pred = torch.zeros(B, S, 9)
        for _ in range(self.num_iterations):
            emb = F.silu(self.embed_pose(pred))
            shift, scale, gate = self.poseLN_modulation(emb).chunk(3, dim=-1)
            mod = gate * (self.adaln_norm(pose_tokens) * (1.0 + scale) + shift)
            x = pose_tokens + mod
            for blk in self.trunk:
                x = blk(x)
            pred = pred + self.pose_branch(x).float()
        t, quat, fov = pred[..., :3], pred[..., 3:7], pred[..., 7:9]
        return torch.cat([t, quat, F.relu(fov)], dim=-1)


class TorchVGGT(nn.Module):
    """Mirror of models/vggt.py::VGGT."""

    def __init__(self, vit_dim, vit_depth, vit_heads, dim, depth, num_heads,
                 head_layers, grid_hw, num_register_tokens=4,
                 head_features=16, head_out_channels=(8, 16, 32, 32),
                 pretrain_img=70, with_point_head=False):
        super().__init__()
        self.num_special = 1 + num_register_tokens
        self.grid_hw = grid_hw
        self.aggregator = TorchAggregator(
            vit_dim, vit_depth, vit_heads, dim, depth, num_heads,
            num_register_tokens, head_layers, grid_hw, pretrain_img,
        )
        self.depth_head = TorchVGGTDepthHead(2 * dim, head_features,
                                             head_out_channels)
        if with_point_head:
            self.point_head = TorchVGGTPointHead(2 * dim, head_features,
                                                 head_out_channels)
        self.camera_head = TorchCameraHead(2 * dim, trunk_depth=4,
                                           num_heads=num_heads)

    def forward(self, views):
        agg = self.aggregator(views)
        ph, pw = self.grid_hw
        depth, conf = self.depth_head(agg, ph, pw, self.num_special)
        pose = self.camera_head(agg[-1])
        if hasattr(self, "point_head"):
            pts, pconf = self.point_head(agg, ph, pw, self.num_special)
            return depth, conf, pose, pts, pconf
        return depth, conf, pose
