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


def test_batched_kernel_matches_reference(rng):
    """Batch-gridded variant (blk_b heads per program): exact vs the XLA
    oracle at the Depth-Pro-like many-small-heads shape."""
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        attention_reference,
        flash_attention,
    )

    q = jnp.asarray(rng.standard_normal((2, 4, 77, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 77, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 77, 32)).astype(np.float32))
    ref = attention_reference(q, k, v)
    for bb in (2, 4):
        out = flash_attention(q, k, v, blk_b=bb)
        assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-5, bb


def test_batched_kernel_blk_b_not_dividing_bh_degrades(rng):
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        attention_reference,
        flash_attention,
    )

    # b*h = 6 and blk_b=4 -> kernel must fall back to a legal divisor
    q = jnp.asarray(rng.standard_normal((2, 3, 40, 16)).astype(np.float32))
    ref = attention_reference(q, q, q)
    out = flash_attention(q, q, q, blk_b=4)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-5


def test_max_batch_block_vmem_budget():
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        max_batch_block,
    )

    # Depth Pro windowed shape: 560 heads, N_pad=640, d=64 -> scores tile
    # 640^2*4B = 1.6 MB per head; 8 heads = 13.7 MB > budget, 4 fits
    assert max_batch_block(560, 640, 64) == 4
    # ViT-L shape: N_pad=1408 -> 7.9 MB scores per head; only 1 fits
    assert max_batch_block(16, 1408, 64) == 1


def test_negative_cache_entry_selects_batched(rng, tmp_path, monkeypatch):
    """A -blk_b timing-cache entry routes flash_attention to the batched
    kernel transparently."""
    import monocular_depth_estimation_trt_tpu.ops.pallas.autotune as at
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        attention_reference,
        flash_attention,
    )

    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(at, "_CACHE", {"bh8_n128_d64": -4})
    q = jnp.asarray(rng.standard_normal((2, 4, 100, 32)).astype(np.float32))
    ref = attention_reference(q, q, q)
    out = flash_attention(q, q, q)  # blk resolved from the cache
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 1e-5


def test_head_chunk_long_sequence_guard():
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        head_chunk,
    )

    # short-N shapes never chunk, regardless of total operand size
    assert head_chunk(128, 1408, 64) == 128  # vitl batch=8 serving
    assert head_chunk(560, 640, 64) == 560   # depth pro windowed heads
    # VGGT global attention S=8: 16 heads x 11008 tokens = 22.5 MB operand
    # must split into <=10 MB chunks (kernel-vmem-stack-oom guard)
    c = head_chunk(16, 11008, 64)
    assert c < 16 and 16 % c == 0
    assert c * 11008 * 64 * 2 <= 10 * 1024 * 1024
    # S=4 (11.3 MB total) stays unchunked — the measured-good regime
    assert head_chunk(16, 5504, 64) == 16
    # degenerate: one head bigger than the budget still returns 1
    assert head_chunk(7, 65536, 128) == 1


# ---------- packed-qkv layout kernel ----------


def _packed_ref(qkv, h):
    """Reference from the same packed (B, N, 3*H*d) tensor."""
    b, n, thd = qkv.shape
    d = thd // 3 // h
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def t(x):
        return jnp.swapaxes(x.reshape(b, n, h, d), 1, 2)

    ref = attention_reference(t(q), t(k), t(v))
    return jnp.swapaxes(ref, 1, 2).reshape(b, n, h * d)


@pytest.mark.parametrize("b,n,h", [(1, 1370, 16), (2, 1370, 6), (1, 1024, 2)])
def test_packed_matches_reference(rng, b, n, h):
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    d = 64
    qkv = jnp.asarray(
        rng.standard_normal((b, n, 3 * h * d)).astype(np.float32), jnp.bfloat16
    )
    out = flash_attention_packed(qkv, h, interpret=True)
    ref = _packed_ref(qkv, h)
    assert out.shape == (b, n, h * d)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    assert err < 2e-2  # bf16 mantissa


def test_packed_blk_q_smaller_than_n(rng):
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        flash_attention_packed,
    )

    qkv = jnp.asarray(
        rng.standard_normal((1, 1370, 3 * 4 * 64)).astype(np.float32),
        jnp.bfloat16,
    )
    out = flash_attention_packed(qkv, 4, blk_q=352, interpret=True)
    ref = _packed_ref(qkv, 4)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    assert err < 2e-2


def test_packed_supported_gates():
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        packed_supported,
    )

    assert packed_supported(16, 64, 1370)          # ViT-L @518
    assert packed_supported(6, 64, 1370)           # ViT-S @518
    assert not packed_supported(16, 64, 1370, rope=True)   # UniDepth/DINOv3
    assert not packed_supported(7, 64, 1370)       # odd heads
    assert not packed_supported(16, 128, 1370)     # head_dim != 64
    assert not packed_supported(16, 64, 577)       # Depth Pro windows (short N)
    assert not packed_supported(16, 64, 11008)     # VGGT S=8 (long N: chunked path)


def test_attention_module_packed_impl_matches_xla(rng):
    """Attention(attn_impl='packed') == Attention(attn_impl='xla') — the
    packed routing slots between the same qkv and proj matmuls."""
    from monocular_depth_estimation_trt_tpu.models.vit import Attention

    x = jnp.asarray(
        rng.standard_normal((1, 1370, 128)).astype(np.float32), jnp.bfloat16
    )
    packed = Attention(128, 2, attn_impl="packed")
    xla = Attention(128, 2, attn_impl="xla")
    p = packed.init(jax.random.PRNGKey(0), x)
    a = np.asarray(packed.apply(p, x), np.float32)
    b = np.asarray(xla.apply(p, x), np.float32)
    assert np.max(np.abs(a - b)) < 2e-2


def test_packed_autotune_keyspace():
    from monocular_depth_estimation_trt_tpu.ops.pallas.autotune import best_block

    # packed whole-N while the fp32 score tile fits VMEM...
    assert best_block(16, 1408, 64, jnp.bfloat16, kind="packed") == 1408
    # ...halved q-blocks beyond it (N=2816: 2816^2*4B = 32 MB > 10 MB)
    blk = best_block(16, 2816, 64, jnp.bfloat16, kind="packed")
    assert blk < 2816 and 2816 % blk == 0
    assert blk * 2816 * 4 <= 10 * 1024 * 1024
