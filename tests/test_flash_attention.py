"""Pallas flash-attention kernel vs plain XLA attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
    attention_reference,
    flash_attention,
)


@pytest.mark.parametrize("n,d", [(128, 64), (200, 64), (130, 48)])
def test_flash_matches_reference(rng, n, d):
    b, h = 1, 2
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    out = flash_attention(q, k, v, blk_q=128)
    ref = attention_reference(q, k, v)
    assert out.shape == (b, h, n, d)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 5e-4


def test_flash_bf16(rng):
    b, h, n, d = 1, 2, 140, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype=jnp.bfloat16)
    out = np.asarray(flash_attention(q, k, v, blk_q=128), dtype=np.float32)
    ref = np.asarray(attention_reference(q, k, v), dtype=np.float32)
    assert np.max(np.abs(out - ref)) < 3e-2  # bf16 mantissa


def test_flash_no_nan_on_padded_rows(rng):
    q = jnp.asarray(rng.standard_normal((1, 1, 100, 64)).astype(np.float32))
    out = np.asarray(flash_attention(q, q, q, blk_q=128))
    assert np.isfinite(out).all()
