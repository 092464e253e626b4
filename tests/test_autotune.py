"""Attention block-size autotuner: candidate legality, defaults, cache."""

import json

import numpy as np

import monocular_depth_estimation_trt_tpu.ops.pallas.autotune as at


def test_candidate_blocks_legal():
    for n_pad in (128, 640, 1408, 2048, 4096):
        cands = at.candidate_blocks(n_pad)
        assert cands, n_pad
        for blk in cands:
            assert n_pad % blk == 0
            assert blk % 8 == 0
            assert blk <= n_pad


def test_default_block_measured_rules():
    # whole-N block up to 2048 tokens at d<=64 (docs/PERF.md sweep)
    assert at.default_block(1408, 64) == 1408
    assert at.default_block(640, 64) == 640
    # large N or wide heads fall back to 256
    assert at.default_block(4096, 64) == 256
    assert at.default_block(1408, 128) == 256


def test_timing_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(at, "_CACHE", None)
    # no entry, no autotune env -> heuristic default
    assert at.best_block(16, 1408, 64, np.float32) == 1408
    # seed a cache entry on disk; a fresh load must honor it
    with open(at._cache_path(), "w") as f:
        json.dump({"bh16_n1408_d64": 352}, f)
    monkeypatch.setattr(at, "_CACHE", None)
    assert at.best_block(16, 1408, 64, np.float32) == 352


def test_flash_attention_resolves_default_block(rng):
    """blk_q=None goes through the autotuner and still matches the oracle."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        attention_reference,
        flash_attention,
    )

    q = jnp.asarray(rng.standard_normal((1, 2, 96, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 96, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 96, 32)).astype(np.float32))
    out = flash_attention(q, k, v)  # interpret mode on CPU
    ref = attention_reference(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_default_block_new_regimes():
    # many-small-heads (Depth Pro windows): batch-gridded default
    assert at.default_block(640, 64, bh=560) == -4
    # few heads on a long sequence (ViT-S): half-N block measured best
    assert at.default_block(1408, 64, bh=6) == 704
    # bh unknown (0): legacy whole-N default preserved
    assert at.default_block(1408, 64) == 1408
