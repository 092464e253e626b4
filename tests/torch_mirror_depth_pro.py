"""Test-only torch mirror of the Depth Pro reconstruction.

Upstream apple ml-depth-pro is gitignored in the reference
(``Depth_Pro/onnx_export.py`` imports it). Mirrors models/depth_pro.py:
3-scale pyramid, overlapping-window split through one shared ViT pass,
seam-cropped merge, project+upsample encoder blocks, multires fusion
decoder, upconv depth head and the FoV head. State-dict naming is the
layout ``weights/convert.py::convert_depth_pro`` consumes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_mirror import TorchDinoViT, TorchFusionBlock


def split_overlapping_torch(x, patch, stride):
    b, c, h, w = x.shape
    k = (h - patch) // stride + 1
    rows = []
    for i in range(k):
        for j in range(k):
            rows.append(x[:, :, i * stride : i * stride + patch,
                          j * stride : j * stride + patch])
    return torch.cat(rows, dim=0)


def merge_overlapping_torch(feats, k, stride_f):
    kk, c, h, _ = feats.shape
    p = (h - stride_f) // 2
    out_rows = []
    for i in range(k):
        tiles = []
        for j in range(k):
            f = feats[i * k + j]
            t = 0 if i == 0 else p
            b = h if i == k - 1 else h - p
            l = 0 if j == 0 else p
            r = h if j == k - 1 else h - p
            tiles.append(f[:, t:b, l:r])
        out_rows.append(torch.cat(tiles, dim=2))
    return torch.cat(out_rows, dim=1)[None]


class TorchProjectUpsample(nn.Module):
    def __init__(self, dim_in, dim_out, upsamples):
        super().__init__()
        self.proj = nn.Conv2d(dim_in, dim_out, 1, bias=False)
        self.ups = nn.ModuleList(
            [nn.ConvTranspose2d(dim_out, dim_out, 2, 2) for _ in range(upsamples)]
        )

    def forward(self, x):
        x = self.proj(x)
        for up in self.ups:
            x = up(x)
        return x


class TorchMultiresDecoder(nn.Module):
    def __init__(self, dims_in, features):
        super().__init__()
        self.convs = nn.ModuleDict()
        for i, d in enumerate(dims_in):
            if d != features:
                self.convs[str(i)] = nn.Conv2d(d, features, 3, 1, 1, bias=False)
        self.fusions = nn.ModuleList(
            [TorchFusionBlock(features) for _ in range(len(dims_in))]
        )

    def forward(self, levels):
        projected = []
        for i, x in enumerate(levels):
            if str(i) in self.convs:
                x = self.convs[str(i)](x)
            projected.append(x)
        n = len(projected)
        out = self.fusions[n - 1](projected[-1], size=projected[-2].shape[2:])
        for i in range(n - 2, 0, -1):
            out = self.fusions[i](out, projected[i],
                                  size=projected[i - 1].shape[2:])
        out = self.fusions[0](out, projected[0], size=projected[0].shape[2:])
        return out


class TorchFOVNetwork(nn.Module):
    def __init__(self, features, vit_dim, flat):
        super().__init__()
        f = features
        self.down0 = nn.Conv2d(f, f // 2, 3, 2, 1)
        self.fov_proj = nn.Linear(vit_dim, f // 2)
        self.down1 = nn.Conv2d(f // 2, f // 4, 3, 2, 1)
        self.down2 = nn.Conv2d(f // 4, f // 8, 3, 2, 1)
        self.head = nn.Linear(flat, 1)

    def forward(self, decoder_feat, fov_global, grid_hw):
        x = F.relu(self.down0(decoder_feat))
        x = F.interpolate(x, grid_hw, mode="bilinear", align_corners=False)
        g = self.fov_proj(fov_global)
        x = x + g[:, :, None, None]
        x = F.relu(self.down1(x))
        x = F.relu(self.down2(x))
        return self.head(x.reshape(x.shape[0], -1))[:, 0].float()


class TorchDepthPro(nn.Module):
    """Mirror of models/depth_pro.py::DepthPro."""

    def __init__(self, img_size, window, stride0, stride1,
                 vit_dim, vit_depth, vit_heads, vit_patch, hook_ids,
                 decoder_features, dims_encoder):
        super().__init__()
        self.img_size = img_size
        self.window = window
        self.stride0 = stride0
        self.stride1 = stride1
        self.hook_ids = hook_ids
        self.vit_depth = vit_depth
        self.g = window // vit_patch
        self.s0f = stride0 // vit_patch
        self.s1f = stride1 // vit_patch
        self.k0 = (img_size - window) // stride0 + 1
        self.k1 = (img_size // 2 - window) // stride1 + 1

        self.patch_encoder = TorchDinoViT(vit_dim, vit_depth, vit_heads,
                                          patch=vit_patch, pretrain_img=window)
        self.image_encoder = TorchDinoViT(vit_dim, vit_depth, vit_heads,
                                          patch=vit_patch, pretrain_img=window)
        de = dims_encoder
        self.upsample_latent0 = TorchProjectUpsample(vit_dim, de[0], 3)
        self.upsample_latent1 = TorchProjectUpsample(vit_dim, de[0], 2)
        self.upsample0 = TorchProjectUpsample(vit_dim, de[1], 1)
        self.upsample1 = TorchProjectUpsample(vit_dim, de[2], 1)
        self.upsample2 = TorchProjectUpsample(vit_dim, de[3], 1)
        self.upsample_lowres = nn.ConvTranspose2d(vit_dim, de[3], 2, 2)
        self.fuse_lowres = nn.Conv2d(2 * de[3], de[3], 1)
        self.decoder = TorchMultiresDecoder(
            [de[0], de[0], de[1], de[2], de[3]], decoder_features
        )
        f = decoder_features
        self.head_conv0 = nn.Conv2d(f, f // 2, 3, 1, 1)
        self.head_up = nn.ConvTranspose2d(f // 2, f // 2, 2, 2)
        self.head_conv1 = nn.Conv2d(f // 2, 32, 3, 1, 1)
        self.head_conv2 = nn.Conv2d(32, 1, 1)
        flat = (f // 8) * (self.g // 4) * (self.g // 4)
        self.fov = TorchFOVNetwork(f, vit_dim, flat)

    def forward(self, x):
        x0 = x
        half = self.img_size // 2
        x1 = F.interpolate(x, (half, half), mode="bilinear", align_corners=False)
        x2 = F.interpolate(x, (self.window, self.window), mode="bilinear",
                           align_corners=False)
        p0 = split_overlapping_torch(x0, self.window, self.stride0)
        p1 = split_overlapping_torch(x1, self.window, self.stride1)
        patches = torch.cat([p0, p1, x2], dim=0)

        final_idx = self.vit_depth - 1
        taps = self.patch_encoder.get_intermediate_layers(
            patches, (*self.hook_ids, final_idx), raw_idxs=self.hook_ids
        )
        (h0, _), (h1, _), (fin, _) = taps

        g = self.g

        def grid(t):
            return t.transpose(1, 2).reshape(t.shape[0], -1, g, g)

        n0, n1 = self.k0 * self.k0, self.k1 * self.k1
        latent0 = merge_overlapping_torch(grid(h0[:n0]), self.k0, self.s0f)
        latent1 = merge_overlapping_torch(grid(h1[:n0]), self.k0, self.s0f)
        f0 = merge_overlapping_torch(grid(fin[:n0]), self.k0, self.s0f)
        f1 = merge_overlapping_torch(grid(fin[n0 : n0 + n1]), self.k1, self.s1f)
        f_global = grid(fin[n0 + n1 :])

        img_feat, img_cls = self.image_encoder.get_intermediate_layers(
            x2, (final_idx,)
        )[0]
        img_feat = grid(img_feat)

        lvl0 = self.upsample_latent0(latent0)
        lvl1 = self.upsample_latent1(latent1)
        lvl2 = self.upsample0(f0)
        lvl3 = self.upsample1(f1)
        lvl4 = self.upsample2(f_global)
        img_up = self.upsample_lowres(img_feat)
        lvl4 = self.fuse_lowres(torch.cat([lvl4, img_up], dim=1))

        dec = self.decoder([lvl0, lvl1, lvl2, lvl3, lvl4])

        y = self.head_conv0(dec)
        y = self.head_up(y)
        y = F.relu(self.head_conv1(y))
        y = F.relu(self.head_conv2(y))
        cid = y[:, 0].float()
        fov = self.fov(dec, img_cls, (g, g))
        return cid, fov
