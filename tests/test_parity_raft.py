"""RAFT end-to-end parity: torch mirror -> convert_raft -> Flax model.

Validates the full converter path (conv transposes, InstanceNorm exactness,
BatchNorm folding from running stats, GRU/motion-encoder/mask naming) and the
separable correlation lookup against the gather formulation, through real
recurrent iterations.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.raft import RAFT
from monocular_depth_estimation_trt_tpu.weights.convert import convert_raft

from torch_mirror_raft import TorchRAFT


def test_raft_converter_parity(rng):
    torch.manual_seed(11)
    tm = TorchRAFT(iters=2)
    # randomize BatchNorm running stats so folding is actually exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.add_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.mul_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.75
                )
            if isinstance(mod, torch.nn.Conv2d):
                mod.weight.mul_(0.5)  # tame activations for tight comparison
    tm.eval()

    params = convert_raft(tm.state_dict())
    fm = RAFT(iters=2, dtype=jnp.float32)

    img1 = rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32)
    img2 = rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        t_low, t_up = tm(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        )
    f_low, f_up = fm.apply(
        {"params": params}, jnp.asarray(img1), jnp.asarray(img2)
    )

    ref_low = t_low.numpy().transpose(0, 2, 3, 1)
    ref_up = t_up.numpy().transpose(0, 2, 3, 1)
    err_low = np.max(np.abs(np.asarray(f_low) - ref_low))
    err_up = np.max(np.abs(np.asarray(f_up) - ref_up))
    scale = max(np.max(np.abs(ref_up)), 1e-3)
    assert err_low / scale < 5e-3, f"flow_low rel err {err_low / scale:.2e}"
    assert err_up / scale < 5e-3, f"flow_up rel err {err_up / scale:.2e}"
