"""Fused w8a8 Pallas matmul (ops/pallas/quant_matmul.py).

Gates: bit-parity with the unfused XLA serve path (same round/clip/int8-dot/
rescale semantics), leading-dim handling, and QuantDense routing under
MDET_W8A8_IMPL. CPU runs the kernel in Pallas interpret mode; the TPU A/B
perf numbers live in docs/QUANT.md (scripts/w8a8_bench.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from monocular_depth_estimation_trt_tpu.ops.pallas.quant_matmul import (  # noqa: E402,E501
    w8a8_matmul,
    w8a8_supported,
)


def _xla_ref(x, kq, qmul, scale, bias):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * qmul), -127, 127).astype(
        jnp.int8)
    y = jax.lax.dot_general(
        xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias
    return y


def _setup(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    qmul = jnp.asarray(rng.uniform(0.5, 30.0, (k,)), jnp.float32)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-2, (n,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    return x, kq, qmul, scale, bias


@pytest.mark.parametrize("m,k,n", [(40, 64, 128), (130, 96, 256), (8, 32, 128)])
def test_matches_xla_serve_path(m, k, n):
    x, kq, qmul, scale, bias = _setup(m, k, n)
    got = w8a8_matmul(x, kq, qmul, scale, bias, out_dtype=jnp.float32)
    want = _xla_ref(x, kq, qmul, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_no_bias_and_bf16_out():
    x, kq, qmul, scale, _ = _setup(24, 64, 128, seed=1)
    got = w8a8_matmul(x, kq, qmul, scale, None, out_dtype=jnp.bfloat16)
    want = _xla_ref(x, kq, qmul, scale, None).astype(jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=1e-2)


def test_leading_dims_preserved():
    x, kq, qmul, scale, bias = _setup(2 * 3 * 10, 64, 128, seed=2)
    x3 = x.reshape(2, 3, 10, 64)
    got = w8a8_matmul(x3, kq, qmul, scale, bias, out_dtype=jnp.float32)
    assert got.shape == (2, 3, 10, 128)
    want = _xla_ref(x, kq, qmul, scale, bias).reshape(2, 3, 10, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_supported_shapes():
    assert w8a8_supported(1024, 4096)      # vitl fc1
    assert w8a8_supported(4096, 1024)      # vitl fc2
    assert w8a8_supported(1024, 3072)      # vitl qkv
    assert not w8a8_supported(1000, 4096)  # K not /32
    assert not w8a8_supported(1024, 100)   # N not /128
    assert not w8a8_supported(8192, 8192)  # weight block exceeds VMEM


def test_quantdense_routes_through_fused_kernel(monkeypatch):
    """QuantDense serve mode gives identical outputs with the fused kernel
    forced on vs the XLA path forced (same math, one program)."""
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        QuantDense,
        build_q8,
        calibrate,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 40, 64)), jnp.float32)

    calib = QuantDense(128, dtype=jnp.float32, mode="calib")
    params = calib.init(jax.random.PRNGKey(0), x)["params"]
    stats = calibrate(calib, {"params": params}, x)
    serve = QuantDense(128, dtype=jnp.float32, mode="serve")
    q8_struct = jax.eval_shape(serve.init, jax.random.PRNGKey(0), x)["q8"]
    q8 = build_q8(q8_struct, params, stats)
    variables = {"params": {"bias": params["bias"]}, "q8": q8}

    monkeypatch.setenv("MDET_W8A8_IMPL", "xla")
    y_xla = serve.apply(variables, x)
    monkeypatch.setenv("MDET_W8A8_IMPL", "pallas")
    y_pl = serve.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-5)
