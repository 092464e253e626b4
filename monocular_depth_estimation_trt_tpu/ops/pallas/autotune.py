"""Per-shape block-size autotuning for the flash-attention kernel.

The TRT role model autotunes kernel tactics at engine-build time and
persists a timing cache (reference ``common.py:133-146``). Same idea here:
the first time a (batch*heads, N, d) attention shape is seen on a TPU
backend with autotuning enabled, every legal q-block size is timed and the
winner is persisted to a JSON timing cache under the framework cache dir;
later builds (and later processes) reuse it.

Resolution order for the q-block:
1. explicit ``blk_q`` argument;
2. persistent timing-cache entry for the padded shape;
3. measured-defaults heuristic (v5e, 2026-08): one whole-N block wins for
   N_pad <= 2048 at head_dim 64 (the score tile fits VMEM and avoids grid
   overhead); 256 otherwise.

Enable measurement with ``MDET_AUTOTUNE=1`` (off by default so jit traces
never spend minutes timing; the heuristic defaults are from hardware runs).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

_CACHE: Optional[Dict[str, int]] = None


def _cache_path() -> str:
    from monocular_depth_estimation_trt_tpu.config import cache_dir

    return os.path.join(cache_dir(), "attention_tuning.json")


def _load_cache() -> Dict[str, int]:
    global _CACHE
    if _CACHE is None:
        try:
            with open(_cache_path()) as f:
                _CACHE = {k: int(v) for k, v in json.load(f).items()}
        except Exception:
            _CACHE = {}
    return _CACHE


def _save_cache() -> None:
    if _CACHE is None:
        return
    try:
        with open(_cache_path(), "w") as f:
            json.dump(_CACHE, f, indent=1, sort_keys=True)
    except OSError:
        pass


def candidate_blocks(n_pad: int) -> Tuple[int, ...]:
    """Legal q-block sizes: divide n_pad, multiple of 8, >= 128 lanes of
    work per program (tiny blocks are never competitive)."""
    out = []
    for blk in (128, 176, 256, 352, 512, 704, 1024, 1408, 2048):
        if blk <= n_pad and n_pad % blk == 0:
            out.append(blk)
    if n_pad not in out and n_pad % 8 == 0:
        out.append(n_pad)
    return tuple(out)


def default_block(n_pad: int, d_pad: int, bh: int = 0) -> int:
    """Measured v5e defaults (docs/PERF.md). Negative return = batch-gridded
    kernel with blk_b = -value."""
    if bh >= 256 and n_pad <= 1024 and d_pad <= 64:
        # many-small-heads regime (Depth Pro windowed encoder, 2026-08 runs:
        # flash_b4 2.69 ms vs XLA 3.70 ms at (560, 640, 64)): amortize
        # program overhead over a block of heads
        from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
            max_batch_block,
        )

        bb = max_batch_block(bh, n_pad, d_pad)
        if bb > 1:
            return -bb
    if n_pad <= 2048 and d_pad <= 64:
        # the whole-N block wins for the ViT-L shape — the fp32 score tile
        # (N^2*4B <= 16MB) fits VMEM and per-program overhead dominates;
        # at few heads (ViT-S) a half-N block measured best (q704)
        if 1 <= bh <= 8 and n_pad >= 1280:
            return n_pad // 2
        return n_pad
    return 256


def candidate_batch_blocks(bh: int, n_pad: int, d_pad: int) -> Tuple[int, ...]:
    """Legal heads-per-program blocks for the batch-gridded kernel (many
    small heads): must divide bh and fit the VMEM budget."""
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        max_batch_block,
    )

    top = max_batch_block(bh, n_pad, d_pad)
    return tuple(b for b in (2, 4, 8) if b <= top and bh % b == 0)


def _measure(bh: int, n_pad: int, d_pad: int, dtype) -> int:
    """Time every legal blocking; returns blk_q > 0 for the sequence-gridded
    kernel or -blk_b < 0 for the batch-gridded kernel.

    Candidates are CHAINED inside one program (``lax.scan`` feeding the
    attention output back as the next query): a single kernel launch over
    the remote tunnel costs ~0.4 ms while the kernels themselves run tens
    of microseconds, so per-launch timing would rank candidates on launch
    jitter, not kernel time. Chain length via MDET_AUTOTUNE_CHAIN
    (default 16)."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )

    chain = max(1, int(os.environ.get("MDET_AUTOTUNE_CHAIN", "16")))
    rng = np.random.default_rng(0)
    shape = (1, bh, n_pad, d_pad)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32), dtype)

    def chained(attn):
        def run(q, k, v):
            def step(x, _):
                return attn(x, k, v).astype(x.dtype), None
            out, _ = jax.lax.scan(step, q, None, length=chain)
            return out
        return jax.jit(run)

    def time_fn(fn):
        out = fn(q, k, v)
        np.asarray(out.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(q, k, v)
        np.asarray(out.ravel()[0:1])
        return time.perf_counter() - t0

    best, best_t = None, float("inf")
    for blk in candidate_blocks(n_pad):
        t = time_fn(chained(
            lambda q, k, v, blk=blk: flash_attention(q, k, v, blk_q=blk)
        ))
        if t < best_t:
            best, best_t = blk, t
    for bb in candidate_batch_blocks(bh, n_pad, d_pad):
        t = time_fn(chained(
            lambda q, k, v, bb=bb: flash_attention(q, k, v, blk_b=bb)
        ))
        if t < best_t:
            best, best_t = -bb, t
    return best or default_block(n_pad, d_pad, bh)


def best_block(bh: int, n_pad: int, d_pad: int, dtype,
               kind: str = "bhnd") -> int:
    """Resolve the q-block for a padded attention shape (trace-time).

    ``kind``: "bhnd" = the (B,H,N,d) kernels; "packed" = the packed-qkv
    layout kernel (its own cache keyspace — measured optima differ: packed
    whole-N was best on ViT-L where the per-head kernel preferred N/2)."""
    key = f"bh{bh}_n{n_pad}_d{d_pad}"
    if kind != "bhnd":
        key = f"{kind}_{key}"
    cache = _load_cache()
    if key in cache:
        return cache[key]
    import jax

    if (
        kind == "bhnd"
        and os.environ.get("MDET_AUTOTUNE", "0") == "1"
        and jax.default_backend() == "tpu"
    ):
        blk = _measure(bh, n_pad, d_pad, dtype)
        cache[key] = blk
        _save_cache()
        return blk
    if kind == "packed":
        # measured on v5e (2026-08, /tmp/packed_sweep): whole-N 174.5 us vs
        # q352 176.2 vs q704 213.4 per ViT-L layer — whole-N wins while the
        # fp32 score tile (+exp buffer) fits VMEM; larger N takes the biggest
        # legal q-block under the same ~10 MB budget
        # budget: the fp32 score tile (exp runs in place on it — whole-N at
        # ViT-L's 1408 = 7.9 MB measured-good on hardware)
        if n_pad * n_pad * 4 <= 10 * 1024 * 1024:
            return n_pad
        blk = n_pad
        while blk > 128 and (n_pad % blk or blk * n_pad * 4 > 10 * 1024 * 1024):
            blk //= 2
        return max(blk, 128)
    return default_block(n_pad, d_pad, bh)
