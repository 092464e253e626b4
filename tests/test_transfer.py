"""Chunked host<->device transfer correctness."""

import numpy as np

import jax

from monocular_depth_estimation_trt_tpu.runtime.transfer import (
    device_get_chunked,
    device_put_chunked,
    tree_get_chunked,
)


def test_put_roundtrip_small(rng):
    a = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    d = device_put_chunked(a)
    assert np.array_equal(np.asarray(d), a)


def test_put_scalar_keeps_rank(rng):
    """0-d arrays must stay 0-d: np.ascontiguousarray promotes them to
    (1,), which broke exported modules with scalar param leaves."""
    a = np.float32(0.5).reshape(())  # 0-d
    d = device_put_chunked(np.asarray(a))
    assert d.shape == () and float(d) == 0.5


def test_put_roundtrip_chunked(rng):
    a = rng.standard_normal((64, 100, 100)).astype(np.float32)  # 2.5 MB
    d = device_put_chunked(a, max_bytes=200_000)
    assert isinstance(d, jax.Array)
    assert np.array_equal(np.asarray(d), a)


def test_get_chunked(rng):
    a = rng.standard_normal((32, 300, 10)).astype(np.float32)
    d = jax.device_put(a)
    out = device_get_chunked(d, max_bytes=100_000)
    assert np.array_equal(out, a)


def test_tree_get(rng):
    t = {
        "x": jax.device_put(rng.standard_normal((4, 4)).astype(np.float32)),
        "y": 3,
    }
    out = tree_get_chunked(t)
    assert isinstance(out["x"], np.ndarray) and out["y"] == 3


def test_odd_row_sizes(rng):
    # rows larger than max_bytes: one row per chunk still round-trips
    a = rng.standard_normal((3, 500, 200)).astype(np.float32)  # 400KB rows
    d = device_put_chunked(a, max_bytes=100_000)
    assert np.array_equal(np.asarray(d), a)
    out = device_get_chunked(jax.device_put(a), max_bytes=100_000)
    assert np.array_equal(out, a)
