"""MeFlow parity: Flax (separable matmul correlation) vs torch mirror
(gather-bilinear formulation) through convert_meflow.

Gates the full wrapper structure: 1D window attention per pooled scale,
cross-direction corr pairing, the 17+17-tap profiles, the RAFT update block
at 34 correlation channels, and the learned 8x convex upsampling. The two
correlation formulations are mathematically identical; agreement here proves
it end to end.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.meflow import MeFlow
from monocular_depth_estimation_trt_tpu.weights.convert import convert_meflow

from torch_mirror_meflow import TorchMeFlow


@pytest.mark.parametrize("use_scan", [False, True])
def test_meflow_parity(rng, use_scan):
    torch.manual_seed(23)
    tm = TorchMeFlow(iters=2)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = MeFlow(iters=2, use_scan=use_scan, dtype=jnp.float32)
    params = convert_meflow(tm.state_dict())
    if use_scan:
        pass  # same tree: scan broadcasts the 'step' params

    x1 = rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
    x2 = rng.integers(0, 255, size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref_low, ref_up = tm(
            torch.from_numpy(x1).permute(0, 3, 1, 2),
            torch.from_numpy(x2).permute(0, 3, 1, 2),
        )
    low, up = fm.apply({"params": params}, jnp.asarray(x1), jnp.asarray(x2))

    for ours, ref, name in [
        (np.moveaxis(np.asarray(low), -1, 1), ref_low.numpy(), "flow_low"),
        (np.moveaxis(np.asarray(up), -1, 1), ref_up.numpy(), "flow_up"),
    ]:
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"
