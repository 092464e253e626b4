"""CoTracker3 parity: Flax vs torch mirror through ``convert_cotracker3``
(tiny config, fp32, CPU).

Covers: the stride-4 encoder, query-point feature sampling, multi-scale
windowed correlation (zero-padded OOB), the factorized time/track attention
blocks, and the iterative coordinate/visibility/feature updates.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.cotracker3 import CoTracker3
from monocular_depth_estimation_trt_tpu.weights.convert import convert_cotracker3

from torch_mirror_cotracker import TorchCoTracker3

CFG = dict(dim=16, d_model=32, iters=2, blocks=2, levels=2, radius=2,
           num_heads=4)


def test_cotracker3_parity_vs_torch():
    torch.manual_seed(17)
    tm = TorchCoTracker3(**CFG).eval()
    fm = CoTracker3(**CFG, dtype=jnp.float32)
    params = convert_cotracker3(tm.state_dict(), blocks=CFG["blocks"])

    rng = np.random.default_rng(6)
    frames = rng.uniform(0, 1, (1, 4, 32, 48, 3)).astype(np.float32)
    queries = rng.uniform(6, 26, (1, 5, 2)).astype(np.float32)

    with torch.no_grad():
        t_tracks, t_vis = tm(
            torch.from_numpy(frames).permute(0, 1, 4, 2, 3),
            torch.from_numpy(queries),
        )
    out = fm.apply({"params": params}, jnp.asarray(frames),
                   jnp.asarray(queries))

    tracks = np.asarray(out["tracks"])
    vis = np.asarray(out["visibility"])
    assert tracks.shape == tuple(t_tracks.shape) == (1, 4, 5, 2)
    assert vis.shape == tuple(t_vis.shape) == (1, 4, 5, 1)
    scale = np.abs(t_tracks.numpy()).max() + 1e-6
    assert np.max(np.abs(tracks - t_tracks.numpy())) / scale < 2e-3
    assert np.max(np.abs(vis - t_vis.numpy())) < 2e-3


def test_cotracker3_static_point_stays():
    """A static scene: tracks should stay close to the queries (structural
    sanity — random weights, but frame-0 coords ARE the queries and deltas
    are identical across identical frames)."""
    torch.manual_seed(3)
    fm = CoTracker3(**CFG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    frame = rng.uniform(0, 1, (1, 1, 32, 48, 3)).astype(np.float32)
    frames = np.repeat(frame, 3, axis=1)
    queries = rng.uniform(8, 24, (1, 4, 2)).astype(np.float32)
    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(frames),
                     jnp.asarray(queries))["params"]
    out = fm.apply({"params": params}, jnp.asarray(frames),
                   jnp.asarray(queries))
    tracks = np.asarray(out["tracks"])
    # identical frames -> identical per-frame estimates
    np.testing.assert_allclose(tracks[:, 0], tracks[:, 1], atol=1e-4)
    np.testing.assert_allclose(tracks[:, 1], tracks[:, 2], atol=1e-4)
