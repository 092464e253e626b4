"""Test-only torch mirrors of the camera-aware 3D family.

UniDepth V2 / UniK3D / MoGe-2 upstream repos are gitignored in the reference
(`Uni_Depth_V2/onnx_export.py:9`, `UniK3D/onnx_export.py:8`,
`MoGe_2/onnx_export.py:10`), so parity is established against these
independent torch implementations of the reconstructed decoder topology
(see models/geometric.py / models/moge2.py docstrings). The state-dict
naming here is the layout `weights/convert.py::convert_geometric` /
`convert_moge2` consume — the same dual role tests/torch_mirror.py plays
for DA-V2.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT


def real_sh_torch(xyz: torch.Tensor, lmax: int = 8) -> torch.Tensor:
    """Real SH basis, same convention as ops/spherical_harmonics.py
    (orthonormal, no Condon-Shortley, (l, m) ordering)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    c_m = torch.ones_like(x)
    s_m = torch.zeros_like(x)
    sh = {}
    pmm = torch.ones_like(x)

    def k_norm(l, m):
        return math.sqrt(
            (2 * l + 1) / (4 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
        )

    for m in range(lmax + 1):
        if m > 0:
            pmm = pmm * (2 * m - 1)
            c_m, s_m = x * c_m - y * s_m, x * s_m + y * c_m
        p_prev = pmm
        p_curr = (2 * m + 1) * z * pmm if m < lmax else None
        for l in range(m, lmax + 1):
            if l == m:
                p = p_prev
            elif l == m + 1:
                p = p_curr
            else:
                p = ((2 * l - 1) * z * p_curr - (l + m - 1) * p_prev) / (l - m)
                p_prev, p_curr = p_curr, p
            k = k_norm(l, m)
            if m == 0:
                sh[(l, 0)] = k * p
            else:
                s2 = math.sqrt(2.0) * k
                sh[(l, m)] = s2 * p * c_m
                sh[(l, -m)] = s2 * p * s_m
    out = [sh[(l, m)] for l in range(lmax + 1) for m in range(-l, l + 1)]
    return torch.stack(out, dim=-1)


class TorchXAttnBlock(nn.Module):
    def __init__(self, dim, num_heads, cross=False):
        super().__init__()
        self.num_heads = num_heads
        self.cross = cross
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if cross:
            self.norm_context = nn.LayerNorm(dim, eps=1e-6)
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x, context=None):
        h = self.norm1(x)
        c = self.norm_context(context) if context is not None else h
        B, Nq, D = h.shape
        Nk = c.shape[1]
        hd = D // self.num_heads
        q = self.q(h).reshape(B, Nq, self.num_heads, hd)
        kv = self.kv(c).reshape(B, Nk, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        p = s.softmax(dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, Nq, D)
        x = x + self.proj(o)
        x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x


class TorchCameraModule(nn.Module):
    def __init__(self, dim, num_heads, input_hw):
        super().__init__()
        self.input_hw = input_hw
        self.latents = nn.Parameter(torch.zeros(1, 4, dim))
        self.cross = TorchXAttnBlock(dim, num_heads, cross=True)
        self.self_block = TorchXAttnBlock(dim, num_heads)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.out = nn.Linear(dim, 1)

    def forward(self, tokens):
        B = tokens.shape[0]
        x = self.latents.expand(B, -1, -1)
        x = self.cross(x, tokens)
        x = self.self_block(x)
        p = self.out(self.norm(x))[..., 0].float()  # (B, 4)
        h, w = self.input_hw
        fx = 0.5 * w * p[:, 0].exp()
        fy = 0.5 * h * p[:, 1].exp()
        cx = w * p[:, 2].sigmoid()
        cy = h * p[:, 3].sigmoid()
        K = torch.zeros(B, 3, 3)
        K[:, 0, 0] = fx
        K[:, 1, 1] = fy
        K[:, 0, 2] = cx
        K[:, 1, 2] = cy
        K[:, 2, 2] = 1.0
        return K


def patch_center_rays_torch(K, input_hw, patch_hw):
    H, W = input_hw
    ph, pw = patch_hw
    sy, sx = H / ph, W / pw
    u = (torch.arange(pw, dtype=torch.float32) + 0.5) * sx
    v = (torch.arange(ph, dtype=torch.float32) + 0.5) * sy
    uu = u[None, :].expand(ph, pw).reshape(-1)
    vv = v[:, None].expand(ph, pw).reshape(-1)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    rx = (uu[None] - cx[:, None]) / fx[:, None]
    ry = (vv[None] - cy[:, None]) / fy[:, None]
    rz = torch.ones_like(rx)
    rays = torch.stack([rx, ry, rz], dim=-1)
    return rays / rays.norm(dim=-1, keepdim=True)


class TorchRayEmbedding(nn.Module):
    def __init__(self, dim, degree=8):
        super().__init__()
        self.degree = degree
        self.fc1 = nn.Linear((degree + 1) ** 2, dim)
        self.fc2 = nn.Linear(dim, dim)

    def forward(self, rays):
        sh = real_sh_torch(rays, self.degree)
        return self.fc2(F.gelu(self.fc1(sh)))


class TorchDepthModule(nn.Module):
    def __init__(self, dim, num_heads, layers=2):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TorchXAttnBlock(dim, num_heads) for _ in range(layers)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.up1 = nn.ConvTranspose2d(dim, dim // 2, 2, 2)
        self.conv1 = nn.Conv2d(dim // 2, dim // 2, 3, 1, 1)
        self.up2 = nn.ConvTranspose2d(dim // 2, dim // 4, 2, 2)
        self.conv2 = nn.Conv2d(dim // 4, dim // 4, 3, 1, 1)
        self.out = nn.Conv2d(dim // 4, 2, 1)

    def forward(self, tokens, ray_emb, patch_hw, out_hw):
        ph, pw = patch_hw
        x = tokens + ray_emb
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        B, N, D = x.shape
        g = x.transpose(1, 2).reshape(B, D, ph, pw)
        g = F.gelu(self.conv1(self.up1(g)))
        g = F.gelu(self.conv2(self.up2(g)))
        out = self.out(g).float()
        out = F.interpolate(out, out_hw, mode="bilinear", align_corners=False)
        value = out[:, 0].clamp(-10, 10).exp()
        confidence = out[:, 1].sigmoid()
        return value, confidence


class TorchRaysModule(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.block0 = TorchXAttnBlock(dim, num_heads)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.out = nn.Linear(dim, 3)

    def forward(self, tokens, ray_emb, patch_hw, out_hw):
        ph, pw = patch_hw
        x = self.block0(tokens + ray_emb)
        r = self.out(self.norm(x)).float()
        B, N, _ = r.shape
        r = r.transpose(1, 2).reshape(B, 3, ph, pw)
        r = F.interpolate(r, out_hw, mode="bilinear", align_corners=False)
        r = r.permute(0, 2, 3, 1)
        return r / r.norm(dim=-1, keepdim=True).clamp_min(1e-6)


class TorchGeometricModel(nn.Module):
    """Mirror of models/geometric.py::GeometricDepthModel."""

    def __init__(self, dim, depth, num_heads, decoder_dim, idxs, mode="unidepth",
                 patch=14, pretrain_img=518):
        super().__init__()
        self.mode = mode
        self.idxs = idxs
        self.patch = patch
        self.pixel_encoder = TorchDinoViT(
            dim, depth, num_heads, patch, pretrain_img, num_register_tokens=4
        )
        dec_heads = max(decoder_dim // 64, 1)
        self.adapters = nn.ModuleList(
            [nn.Linear(dim, decoder_dim) for _ in idxs]
        )
        self.adapter_norm = nn.LayerNorm(decoder_dim, eps=1e-6)
        self.camera = None  # set in forward (needs input size); see build()
        self._dec = (decoder_dim, dec_heads)
        self.ray_embed = TorchRayEmbedding(decoder_dim)
        self.depth_module = TorchDepthModule(decoder_dim, dec_heads)
        if mode == "unik3d":
            self.rays_module = TorchRaysModule(decoder_dim, dec_heads)

    def build_camera(self, input_hw):
        dim, heads = self._dec
        self.camera = TorchCameraModule(dim, heads, input_hw)

    def forward(self, x):
        B, _, H, W = x.shape
        ph, pw = H // self.patch, W // self.patch
        feats = self.pixel_encoder.get_intermediate_layers(x, self.idxs)
        tokens = 0.0
        for adapter, (patch_tokens, _cls) in zip(self.adapters, feats):
            tokens = tokens + adapter(patch_tokens)
        tokens = self.adapter_norm(tokens)

        K = self.camera(tokens)
        rays = patch_center_rays_torch(K, (H, W), (ph, pw))
        ray_emb = self.ray_embed(rays)
        value, confidence = self.depth_module(tokens, ray_emb, (ph, pw), (H, W))

        if self.mode == "unik3d":
            dense_rays = self.rays_module(tokens, ray_emb, (ph, pw), (H, W))
            pts = dense_rays * value.unsqueeze(-1)
        else:
            u = torch.arange(W, dtype=torch.float32)[None, :].expand(H, W)
            v = torch.arange(H, dtype=torch.float32)[:, None].expand(H, W)
            fx, fy = K[:, 0, 0], K[:, 1, 1]
            cx, cy = K[:, 0, 2], K[:, 1, 2]
            rx = (u[None] - cx[:, None, None]) / fx[:, None, None]
            ry = (v[None] - cy[:, None, None]) / fy[:, None, None]
            pts = torch.stack([rx * value, ry * value, value], dim=-1)
        return pts, confidence, K


class TorchMoGeHead(nn.Module):
    def __init__(self, num_levels, dim_in, proj_dim, up_dims, predict_normal):
        super().__init__()
        from torch_mirror import TorchResidualConvUnit

        self.predict_normal = predict_normal
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, proj_dim, 1) for _ in range(num_levels)]
        )
        blocks = []
        prev = proj_dim
        for d in up_dims:
            blocks.append(
                nn.Sequential(
                    nn.ConvTranspose2d(prev, d, 2, 2), TorchResidualConvUnit(d)
                )
            )
            prev = d
        self.upsample_blocks = nn.ModuleList(blocks)
        last = up_dims[-1]
        self.points_out = nn.Sequential(
            nn.Conv2d(last, last, 3, 1, 1), nn.ReLU(True), nn.Conv2d(last, 3, 1)
        )
        if predict_normal:
            self.normal_out = nn.Sequential(
                nn.Conv2d(last, last, 3, 1, 1), nn.ReLU(True), nn.Conv2d(last, 3, 1)
            )
        self.mask_out = nn.Sequential(
            nn.Conv2d(last, last, 3, 1, 1), nn.ReLU(True), nn.Conv2d(last, 1, 1)
        )

    def forward(self, feats, patch_hw, out_hw):
        gh, gw = patch_hw
        x = 0.0
        for proj, (patch_tokens, _cls) in zip(self.projects, feats):
            B, N, D = patch_tokens.shape
            t = patch_tokens.transpose(1, 2).reshape(B, D, gh, gw)
            x = x + proj(t)
        for blk in self.upsample_blocks:
            x = blk(x)

        def to_out(y):
            return F.interpolate(
                y.float(), out_hw, mode="bilinear", align_corners=False
            )

        outs = {"points": to_out(self.points_out(x))}
        if self.predict_normal:
            outs["normal"] = to_out(self.normal_out(x))
        outs["mask"] = to_out(self.mask_out(x))
        return outs


class TorchMoGe2(nn.Module):
    """Mirror of models/moge2.py::MoGe2."""

    def __init__(self, dim, depth, num_heads, idxs, proj_dim=512,
                 up_dims=(256, 128, 64), predict_normal=True,
                 patch=14, pretrain_img=518, num_tokens=1800):
        super().__init__()
        self.idxs = idxs
        self.patch = patch
        self.num_tokens = num_tokens
        self.predict_normal = predict_normal
        self.backbone = TorchDinoViT(dim, depth, num_heads, patch, pretrain_img)
        self.head = TorchMoGeHead(len(idxs), dim, proj_dim, up_dims, predict_normal)
        self.scale_head = nn.Sequential(
            nn.Linear(dim, 256), nn.GELU(), nn.Linear(256, 1)
        )

    def forward(self, x):
        from monocular_depth_estimation_trt_tpu.models.moge2 import grid_for_tokens

        B, _, H, W = x.shape
        gh, gw = grid_for_tokens(H, W, self.num_tokens, self.patch)
        xin = F.interpolate(
            x, (gh * self.patch, gw * self.patch), mode="bilinear",
            align_corners=False,
        )
        feats = self.backbone.get_intermediate_layers(xin, self.idxs)
        dense = self.head(feats, (gh, gw), (H, W))

        points = dense["points"].permute(0, 2, 3, 1)
        points = torch.cat(
            [points[..., :2], points[..., 2:].clamp(-10, 10).exp()], dim=-1
        )
        out = {"points": points}
        if self.predict_normal:
            n = dense["normal"].permute(0, 2, 3, 1)
            out["normal"] = n / n.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        out["mask"] = dense["mask"][:, 0].sigmoid()
        cls_token = feats[-1][1]
        out["metric_scale"] = (
            self.scale_head(cls_token)[:, 0].float().clamp(-10, 10).exp()
        )
        return out
