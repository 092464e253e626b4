"""Flow ops + RAFT tests: sampler parity vs the reference formulation,
correlation pyramid vs torch, RAFT forward contract."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    avg_pool2x2,
    bilinear_sample_nhwc,
    build_corr_pyramid,
    corr_lookup,
)


def _reference_bilinear_sample(fmap_nchw, x, y):
    """Direct numpy port of the reference gather-bilinear spec
    (RAFT/wrapper.py:11-70)."""
    t = torch.from_numpy(fmap_nchw)
    xc = torch.from_numpy(x)
    yc = torch.from_numpy(y)
    b, c, hf, wf = t.shape
    x0 = torch.floor(xc); x1 = x0 + 1; y0 = torch.floor(yc); y1 = y0 + 1
    wx = xc - x0; wy = yc - y0
    w00 = (1 - wx) * (1 - wy); w01 = wx * (1 - wy); w10 = (1 - wx) * wy; w11 = wx * wy
    vx0 = (x0 >= 0) & (x0 <= wf - 1); vx1 = (x1 >= 0) & (x1 <= wf - 1)
    vy0 = (y0 >= 0) & (y0 <= hf - 1); vy1 = (y1 >= 0) & (y1 <= hf - 1)
    x0c = x0.clamp(0, wf - 1).long(); x1c = x1.clamp(0, wf - 1).long()
    y0c = y0.clamp(0, hf - 1).long(); y1c = y1.clamp(0, hf - 1).long()
    flat = t.reshape(b, c, hf * wf)
    hg, wg = x.shape[-2:]

    def take(idx):
        return torch.gather(flat, 2, idx.reshape(b, 1, -1).expand(b, c, hg * wg)).reshape(b, c, hg, wg)

    v00 = take(y0c * wf + x0c); v01 = take(y0c * wf + x1c)
    v10 = take(y1c * wf + x0c); v11 = take(y1c * wf + x1c)
    m = lambda vx, vy: (vx & vy).to(t.dtype).unsqueeze(1)
    out = (v00 * w00.unsqueeze(1) * m(vx0, vy0) + v01 * w01.unsqueeze(1) * m(vx1, vy0)
           + v10 * w10.unsqueeze(1) * m(vx0, vy1) + v11 * w11.unsqueeze(1) * m(vx1, vy1))
    return out.numpy()


def test_bilinear_sample_matches_reference(rng):
    b, c, h, w = 2, 3, 10, 12
    fmap = rng.standard_normal((b, c, h, w)).astype(np.float32)
    x = (rng.random((b, 7, 9)).astype(np.float32) * (w + 2)) - 1.5  # incl. OOB
    y = (rng.random((b, 7, 9)).astype(np.float32) * (h + 2)) - 1.5
    ref = _reference_bilinear_sample(fmap, x, y)  # (b, c, 7, 9)
    ours = bilinear_sample_nhwc(
        jnp.asarray(fmap.transpose(0, 2, 3, 1)), jnp.asarray(x), jnp.asarray(y)
    )  # (b, 7, 9, c)
    assert np.max(np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - ref)) < 1e-5


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ours = np.asarray(avg_pool2x2(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2)
    assert np.max(np.abs(ours - ref.numpy().transpose(0, 2, 3, 1))) < 1e-6


def test_corr_pyramid_matches_reference(rng):
    b, h, w, c = 1, 8, 8, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    # reference corr (RAFT/wrapper.py:117-126)
    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2))
    corr = torch.matmul(
        t1.reshape(b, c, h * w).transpose(1, 2), t2.reshape(b, c, h * w)
    ) / np.sqrt(c)
    corr = corr.reshape(b * h * w, 1, h, w)
    assert np.max(np.abs(np.asarray(pyr[0])[..., 0] - corr[:, 0].numpy())) < 1e-4
    pooled = F.avg_pool2d(corr, 2, 2)
    assert np.max(np.abs(np.asarray(pyr[1])[..., 0] - pooled[:, 0].numpy())) < 1e-4


def test_corr_lookup_separable_matches_gather(rng):
    from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
        corr_lookup_separable,
    )

    b, h, w, c = 1, 6, 8, 8
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    coords = jnp.asarray(rng.random((b, h, w, 2)).astype(np.float32) * 10 - 1)
    ref = np.asarray(corr_lookup(pyr, coords, radius=3))
    ours = np.asarray(corr_lookup_separable(pyr, coords, radius=3))
    assert ref.shape == ours.shape
    assert np.max(np.abs(ref - ours)) < 1e-4


def test_corr_lookup_shape(rng):
    b, h, w, c = 1, 6, 8, 8
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f1, num_levels=4)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w), np.arange(h))[0:2], axis=-1)
        .astype(np.float32)[None]
    )
    out = corr_lookup(pyr, coords, radius=4)
    assert out.shape == (b, h, w, 4 * 81)
    # self-correlation at the identity coords: level-0 center tap is max
    assert np.isfinite(np.asarray(out)).all()


def test_raft_forward_contract(rng):
    from monocular_depth_estimation_trt_tpu.models.flow.raft import RAFT

    model = RAFT(iters=2)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)["params"]
    flow_low, flow_up = model.apply({"params": params}, img, img)
    assert flow_low.shape == (1, 8, 12, 2)
    assert flow_up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow_up)).all()
    # scanned update block has ONE set of params (broadcast across iters)
    assert "block" in params["update_block"]


def test_upsample_flow_convex_matches_torch(rng):
    from monocular_depth_estimation_trt_tpu.models.flow.raft import (
        upsample_flow_convex,
    )

    b, h, w = 1, 4, 5
    flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = rng.standard_normal((b, h, w, 576)).astype(np.float32)
    ours = np.asarray(upsample_flow_convex(jnp.asarray(flow), jnp.asarray(mask)))

    # torch reference (RAFT upsample_flow)
    tf = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    tm = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    m = tm.view(b, 1, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=2)
    up = F.unfold(8 * tf, [3, 3], padding=1)
    up = up.view(b, 2, 9, 1, 1, h, w)
    out = torch.sum(m * up, dim=2)
    out = out.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h, 8 * w)
    ref = out.numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_flow_to_color(rng):
    from monocular_depth_estimation_trt_tpu.ops.flow_viz import flow_to_color

    flow = jnp.asarray(rng.standard_normal((16, 16, 2)).astype(np.float32) * 3)
    rgb = np.asarray(flow_to_color(flow))
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
