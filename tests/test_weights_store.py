"""Param store: orbax save/load round-trip + the cache-then-convert policy."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.weights.store import (
    get_or_convert_params,
    load_params,
    save_params,
)


def test_save_load_roundtrip(rng, tmp_path, monkeypatch):
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    params = {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)),
                  "bias": jnp.zeros((8,), jnp.float32)},
        "scale": jnp.float32(2.5),
    }
    save_params("test_model_rt", params)
    loaded = load_params("test_model_rt", like=params)
    assert np.allclose(np.asarray(loaded["dense"]["kernel"]),
                       np.asarray(params["dense"]["kernel"]))
    assert float(loaded["scale"]) == 2.5


def test_load_missing_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    assert load_params("never_saved") is None


def test_get_or_convert_uses_cache(rng, tmp_path, monkeypatch):
    """Policy order: cached params win over converter and random init."""
    import flax.linen as nn

    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    model = Toy()
    example = jnp.zeros((1, 5))
    # first call: random init (no cache, no ckpt)
    p1 = get_or_convert_params("toy_model", model, example)
    save_params("toy_model", p1)
    # second call must hit the cache and return identical values
    p2 = get_or_convert_params("toy_model", model, example, seed=999)
    assert np.allclose(np.asarray(p1["Dense_0"]["kernel"]),
                       np.asarray(p2["Dense_0"]["kernel"]))
