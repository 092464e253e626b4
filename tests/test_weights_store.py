"""Param store: orbax save/load round-trip + the cache-then-convert policy."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.weights.store import (
    MissingCheckpointError,
    allow_random_weights,
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


def _toy():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    return Toy(), jnp.zeros((1, 5))


def test_strict_policy_errors_on_missing_checkpoint(tmp_path, monkeypatch):
    """Production default: no cache + no ckpt -> error, never silent random
    weights (VERDICT round-1 item 9)."""
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    model, example = _toy()
    with allow_random_weights(False):
        with pytest.raises(MissingCheckpointError):
            get_or_convert_params("toy_strict", model, example)
        # explicit per-call opt-in overrides the strict policy
        p = get_or_convert_params("toy_strict", model, example,
                                  allow_random=True)
        assert "Dense_0" in p


def test_strict_policy_errors_on_bad_ckpt_path(tmp_path, monkeypatch):
    """A mistyped --checkpoint path must raise even when random weights are
    globally allowed (a typo must not silently produce garbage depth)."""
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    model, example = _toy()
    with pytest.raises(MissingCheckpointError):
        get_or_convert_params(
            "toy_badpath", model, example,
            torch_ckpt=str(tmp_path / "nope.pth"), converter=lambda sd: {},
        )
