"""MEMFOF parity: Flax vs torch mirror through convert_memfof.

Gates the SEA-RAFT+GMA-at-1/16 reconstruction (9ch context net, single-head
GMA attention, bidirectional correlation, 12ch flow head, double 16x convex
upsampling) and the fmap-cache contract.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.memfof import MEMFOF
from monocular_depth_estimation_trt_tpu.weights.convert import convert_memfof

from torch_mirror_memfof import TorchMEMFOF


def test_memfof_parity(rng):
    torch.manual_seed(17)
    tm = TorchMEMFOF(iters=2)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = MEMFOF(iters=2, dtype=jnp.float32)
    params = convert_memfof(tm.state_dict())

    # 1/16 grid must survive the 4-level pyramid: 128x192 -> 8x12 -> ... -> 1x1
    x = rng.integers(0, 255, size=(1, 3, 128, 192, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    ours = np.moveaxis(np.asarray(out["flow"]), -1, 2)  # (B,2,2,H,W)

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 2e-3, f"flow rel err {err:.2e}"


def test_memfof_cache_reuse(rng):
    """Video mode: passing the previous step's fmaps must equal recompute."""
    fm = MEMFOF(iters=1, dtype=jnp.float32)
    x = jnp.asarray(
        rng.integers(0, 255, size=(1, 3, 64, 96, 3)).astype(np.float32)
    )
    import jax

    params = jax.jit(fm.init)(jax.random.PRNGKey(0), x)["params"]
    out1 = fm.apply({"params": params}, x)
    out2 = fm.apply({"params": params}, x, out1["fmap_cache"])
    assert np.allclose(np.asarray(out1["flow"]), np.asarray(out2["flow"]),
                       atol=1e-5)
