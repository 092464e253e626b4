"""NeuFlow / MeFlow / MEMFOF contract tests (tiny inputs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_neuflow_contract(rng):
    from monocular_depth_estimation_trt_tpu.models.flow.neuflow import NeuFlow

    model = NeuFlow(refine_iters_16=1, refine_iters_8=1)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)["params"]
    flow = model.apply({"params": params}, img, img)
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_meflow_contract(rng):
    from monocular_depth_estimation_trt_tpu.models.flow.meflow import MeFlow

    model = MeFlow(iters=2)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)["params"]
    flow_low, flow_up = model.apply({"params": params}, img, img)
    assert flow_low.shape == (1, 8, 12, 2)
    assert flow_up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_meflow_corr_1d_identity(rng):
    """1D lookup at integer self-coordinates returns the self-correlation on
    the center tap."""
    from monocular_depth_estimation_trt_tpu.models.flow.meflow import (
        _corr_matrix,
        meflow_corr,
    )
    from monocular_depth_estimation_trt_tpu.models.flow.raft import coords_grid
    from monocular_depth_estimation_trt_tpu.ops.flow_sampler import avg_pool2x2

    f = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    pyr = (_corr_matrix(f, f), _corr_matrix(f, avg_pool2x2(f)),
           _corr_matrix(f, avg_pool2x2(avg_pool2x2(f))))
    coords = coords_grid(1, 8, 8)
    out = np.asarray(meflow_corr(pyr, coords, 4, True))
    assert out.shape == (1, 8, 8, 17)
    # center tap (index 4+4=8) is the diagonal self-correlation
    self_corr = np.einsum("hwc,hwc->hw", np.asarray(f[0]), np.asarray(f[0])) / 4.0
    assert np.allclose(out[0, :, :, 8], self_corr, atol=1e-4)


def test_memfof_contract_and_cache(rng):
    from monocular_depth_estimation_trt_tpu.models.flow.memfof import MEMFOF

    model = MEMFOF(iters=1)
    frames = jnp.asarray(rng.integers(0, 255, (1, 3, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames)["params"]
    out = model.apply({"params": params}, frames)
    assert out["flow"].shape == (1, 2, 64, 96, 2)
    assert len(out["fmap_cache"]) == 3
    # reuse of the cache must reproduce the same flow (same frames)
    out2 = model.apply({"params": params}, frames, out["fmap_cache"])
    assert np.allclose(np.asarray(out["flow"]), np.asarray(out2["flow"]), atol=1e-5)
