"""Gather-bilinear sampler for the torch RAFT mirror (the reference's
``_bilinear_sample`` formulation, RAFT/wrapper.py:11-70)."""

import torch


def bilinear_sample_nchw(fmap, x, y):
    b, c, hf, wf = fmap.shape
    hg, wg = x.shape[-2:]
    x0 = torch.floor(x)
    x1 = x0 + 1
    y0 = torch.floor(y)
    y1 = y0 + 1
    wx = x - x0
    wy = y - y0
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    vx0 = (x0 >= 0) & (x0 <= wf - 1)
    vx1 = (x1 >= 0) & (x1 <= wf - 1)
    vy0 = (y0 >= 0) & (y0 <= hf - 1)
    vy1 = (y1 >= 0) & (y1 <= hf - 1)
    x0c = x0.clamp(0, wf - 1).long()
    x1c = x1.clamp(0, wf - 1).long()
    y0c = y0.clamp(0, hf - 1).long()
    y1c = y1.clamp(0, hf - 1).long()
    flat = fmap.reshape(b, c, hf * wf)

    def take(idx):
        return torch.gather(
            flat, 2, idx.reshape(b, 1, -1).expand(b, c, hg * wg)
        ).reshape(b, c, hg, wg)

    v00 = take(y0c * wf + x0c)
    v01 = take(y0c * wf + x1c)
    v10 = take(y1c * wf + x0c)
    v11 = take(y1c * wf + x1c)
    m = lambda vx, vy: (vx & vy).to(fmap.dtype).unsqueeze(1)
    return (
        v00 * w00.unsqueeze(1) * m(vx0, vy0)
        + v01 * w01.unsqueeze(1) * m(vx1, vy0)
        + v10 * w10.unsqueeze(1) * m(vx0, vy1)
        + v11 * w11.unsqueeze(1) * m(vx1, vy1)
    )
