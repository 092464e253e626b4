"""Test-only torch mirror of RAFT with upstream checkpoint naming.

Validates ``weights/convert.py::convert_raft`` end-to-end: the module names
(``fnet.layer2.0.downsample.0`` / ``update_block.gru.convz1`` /
``update_block.mask.0`` ...) match the published RAFT checkpoints, so
converting this mirror's state dict exercises the exact mapping used for
``raft-things.pth``, including BatchNorm folding and InstanceNorm parity.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def norm_layer(kind, planes):
    if kind == "instance":
        return nn.InstanceNorm2d(planes)  # affine=False, no running stats
    if kind == "batch":
        return nn.BatchNorm2d(planes)
    return nn.Identity()


class TorchResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, kind, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1)
        self.norm1 = norm_layer(kind, planes)
        self.norm2 = norm_layer(kind, planes)
        if stride != 1 or in_planes != planes:
            mods = [nn.Conv2d(in_planes, planes, 1, stride)]
            mods.append(norm_layer(kind, planes))
            self.downsample = nn.Sequential(*mods)
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TorchBasicEncoder(nn.Module):
    def __init__(self, output_dim, kind):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.norm1 = norm_layer(kind, 64)
        self.layer1 = nn.Sequential(
            TorchResidualBlock(64, 64, kind, 1), TorchResidualBlock(64, 64, kind, 1)
        )
        self.layer2 = nn.Sequential(
            TorchResidualBlock(64, 96, kind, 2), TorchResidualBlock(96, 96, kind, 1)
        )
        self.layer3 = nn.Sequential(
            TorchResidualBlock(96, 128, kind, 2),
            TorchResidualBlock(128, 128, kind, 1),
        )
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.conv2(x)


class TorchMotionEncoder(nn.Module):
    def __init__(self, cor_planes=4 * 81):
        super().__init__()
        self.convc1 = nn.Conv2d(cor_planes, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class TorchSepConvGRU(nn.Module):
    def __init__(self, hidden=128, input_dim=256):
        super().__init__()
        self.convz1 = nn.Conv2d(hidden + input_dim, hidden, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hidden + input_dim, hidden, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hidden + input_dim, hidden, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hidden + input_dim, hidden, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hidden + input_dim, hidden, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hidden + input_dim, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class TorchFlowHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(128, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class TorchUpdateBlock(nn.Module):
    def __init__(self, cor_planes=4 * 81):
        super().__init__()
        self.encoder = TorchMotionEncoder(cor_planes)
        self.gru = TorchSepConvGRU()
        self.flow_head = TorchFlowHead()
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 64 * 9, 1),
        )

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta


class TorchRAFT(nn.Module):
    """Matches upstream RAFT naming; forward mirrors RAFT/wrapper.py."""

    def __init__(self, iters=2):
        super().__init__()
        self.iters = iters
        self.fnet = TorchBasicEncoder(256, "instance")
        self.cnet = TorchBasicEncoder(256, "batch")
        self.update_block = TorchUpdateBlock()

    def _coords_grid(self, b, h, w):
        y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        return (
            torch.stack([x, y], dim=0).float()[None].repeat(b, 1, 1, 1)
        )  # (B, 2(x,y), H, W)

    def _corr_pyramid(self, f1, f2, levels=4):
        b, c, h, w = f1.shape
        corr = torch.matmul(
            f1.view(b, c, h * w).transpose(1, 2), f2.view(b, c, h * w)
        ) / (c**0.5)
        corr = corr.view(b * h * w, 1, h, w)
        pyr = [corr]
        for _ in range(levels - 1):
            corr = F.avg_pool2d(corr, 2, 2)
            pyr.append(corr)
        return pyr

    def _lookup(self, pyr, coords, r=4):
        # reference RAFT/wrapper.py:87-115 (x offset varies along tap axis 0)
        coords = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords.shape
        d = torch.arange(-r, r + 1).float()
        off0, off1 = torch.meshgrid(d, d, indexing="ij")
        out = []
        for lvl, corr in enumerate(pyr):
            centroid = coords.reshape(b * h * w, 1, 1, 2) / (2**lvl)
            xg = centroid[..., 0] + off0[None]
            yg = centroid[..., 1] + off1[None]
            from torch_mirror_raft_sampler import bilinear_sample_nchw

            sampled = bilinear_sample_nchw(corr, xg, yg)
            out.append(sampled.reshape(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2)

    def forward(self, image1, image2):
        img1 = 2 * (image1 / 255.0) - 1
        img2 = 2 * (image2 / 255.0) - 1
        f1 = self.fnet(img1).float()
        f2 = self.fnet(img2).float()
        pyr = self._corr_pyramid(f1, f2)
        cnet = self.cnet(img1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)
        b, _, h8, w8 = f1.shape
        coords0 = self._coords_grid(b, h8, w8)
        coords1 = coords0.clone()
        for _ in range(self.iters):
            corr = self._lookup(pyr, coords1)
            flow = coords1 - coords0
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        flow_low = coords1 - coords0
        # convex upsample (RAFT upsample_flow)
        m = mask.view(b, 1, 9, 8, 8, h8, w8)
        m = torch.softmax(m, dim=2)
        up = F.unfold(8 * flow_low, [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h8, w8)
        flow_up = torch.sum(m * up, dim=2)
        flow_up = flow_up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h8, 8 * w8)
        return flow_low, flow_up
