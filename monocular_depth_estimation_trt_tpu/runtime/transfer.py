"""Host<->device transfer helpers.

The development tunnel to the TPU has a hard performance cliff for single
transfers >= ~1 MB (measured: 0.8 MB put ~16 ms, 1 MB put ~1 s, 6.4 MB put
~43 s). :func:`device_put_chunked` splits large host arrays into sub-MB
chunks along the leading axis and reassembles on device — on a sane local
attachment it degrades to a plain ``device_put`` (single chunk).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# stay comfortably under the ~1 MB tunnel cliff
_MAX_CHUNK_BYTES = 900_000


@functools.lru_cache(maxsize=32)
def _concat_fn(n: int):
    return jax.jit(lambda *xs: jnp.concatenate(xs, axis=0))


@functools.lru_cache(maxsize=32)
def _slice_fn(size: int):
    # ``start`` is a traced argument so ONE compiled program serves every
    # chunk offset — keying the cache on (start, size) re-jitted per chunk
    # on >64-chunk arrays, and each compile is expensive over the tunnel.
    return jax.jit(
        lambda x, start: jax.lax.dynamic_slice_in_dim(x, start, size, axis=0)
    )


def device_get_chunked(
    arr: "jax.Array", *, max_bytes: int = _MAX_CHUNK_BYTES
) -> np.ndarray:
    """Fetch a device array to host, splitting >=max_bytes payloads into
    leading-axis chunks (the tunnel's D2H path has the same >=1 MB cliff)."""
    if not isinstance(arr, jax.Array):
        return np.asarray(arr)
    nbytes = arr.size * arr.dtype.itemsize
    if nbytes <= max_bytes or arr.ndim == 0 or arr.shape[0] <= 1:
        return np.asarray(arr)
    row_bytes = nbytes // arr.shape[0]
    rows = max(int(max_bytes // max(row_bytes, 1)), 1)
    n = arr.shape[0]
    parts = []
    for i in range(0, n, rows):
        size = min(rows, n - i)
        parts.append(np.asarray(_slice_fn(size)(arr, i)))
    return np.concatenate(parts, axis=0)


def supports_device_out(fn) -> bool:
    """True if ``fn(..., device_out=True)`` is accepted — the serving
    surfaces (HTTP worker, run_video, run_flow_frames) use this ONE probe
    to pick the pipelined dispatch/fetch path. Works for plain functions
    and for callable instances (``inspect.signature`` resolves __call__)."""
    import inspect

    try:
        return "device_out" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def tree_get_chunked(tree):
    """Chunked host fetch over a pytree of device arrays."""
    return jax.tree_util.tree_map(
        lambda x: device_get_chunked(x) if isinstance(x, jax.Array) else x, tree
    )


def device_put_chunked(
    arr: np.ndarray, *, max_bytes: int = _MAX_CHUNK_BYTES, device=None
) -> jax.Array:
    """Transfer a host array, splitting >=max_bytes payloads into leading-
    axis chunks reassembled on device."""
    if getattr(arr, "ndim", None) == 0:
        # before ascontiguousarray: it promotes 0-d arrays to shape (1,)
        return jax.device_put(arr, device)
    arr = np.ascontiguousarray(arr)
    if arr.nbytes <= max_bytes or arr.shape[0] <= 1:
        return jax.device_put(arr, device)
    row_bytes = arr.nbytes // arr.shape[0]
    rows_per_chunk = max(int(max_bytes // max(row_bytes, 1)), 1)
    n_chunks = -(-arr.shape[0] // rows_per_chunk)
    if n_chunks <= 1:
        return jax.device_put(arr, device)
    chunks = [
        jax.device_put(arr[i * rows_per_chunk : (i + 1) * rows_per_chunk], device)
        for i in range(n_chunks)
    ]
    return _concat_fn(n_chunks)(*chunks)
