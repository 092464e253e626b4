"""NeuFlow v2 parity: Flax vs torch mirror through convert_neuflow.

Gates the reconstruction end to end: double-conv backbone (GroupNorm),
bidirectional cross-attention at 1/16, softmax-expectation global matching,
both ConvGRU refinement stages with single-level r=4 correlation, and the
learned 8x convex upsampling.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.neuflow import NeuFlow
from monocular_depth_estimation_trt_tpu.weights.convert import convert_neuflow

from torch_mirror_neuflow import TorchNeuFlow


def test_neuflow_parity(rng):
    torch.manual_seed(29)
    tm = TorchNeuFlow(dim=128, iters16=2, iters8=2)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = NeuFlow(dim=128, refine_iters_16=2, refine_iters_8=2,
                 dtype=jnp.float32)
    params = convert_neuflow(tm.state_dict())

    x1 = rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
    x2 = rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x1).permute(0, 3, 1, 2),
            torch.from_numpy(x2).permute(0, 3, 1, 2),
        ).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x1), jnp.asarray(x2))
    ours = np.moveaxis(np.asarray(out), -1, 1)

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 2e-3, f"flow rel err {err:.2e}"
