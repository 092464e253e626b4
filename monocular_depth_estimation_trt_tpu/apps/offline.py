"""Offline high-throughput processing: native decode ring + batched engines.

The production-serving composition the reference cannot express (its batch
dim is pinned to 1 and decode is single-threaded Python): C++ worker threads
decode and resize frames into stable buffers (``runtime/native.py``), batches
ship to the TPU while the previous batch computes, results stream back
asynchronously. Falls back to cv2 decoding when the native library is
unavailable.
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional

import numpy as np

from monocular_depth_estimation_trt_tpu.utils.logging import log


def process_images_batched(
    pipeline,
    paths: List[str],
    *,
    batch: int = 8,
    decode_hw: Optional[tuple] = None,
    on_result: Optional[Callable[[int, dict], None]] = None,
    decode_threads: int = 4,
) -> dict:
    """Run a DepthPipeline over many images with batched engines.

    Returns throughput stats. ``on_result(start_index, outputs)`` receives
    each batch's host outputs if given (otherwise outputs are discarded after
    materialization — benchmark mode).
    """
    import jax

    decode_hw = decode_hw or (pipeline.spec.height, pipeline.spec.width)

    from monocular_depth_estimation_trt_tpu.runtime import native

    def frames_iter():
        if native.native_available():
            with native.FramePump.from_images(
                paths, decode_hw, ring=batch * 2 + 2, threads=decode_threads
            ) as pump:
                for idx, frame in pump:
                    yield idx, np.copy(frame)
        else:
            import cv2

            for i, p in enumerate(paths):
                img = cv2.imread(p)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (decode_hw[1], decode_hw[0]))
                yield i, img

    eng = pipeline.batch_engine_for(decode_hw, batch)
    eng.compile()

    t0 = time.perf_counter()
    n_frames = 0
    pending = []  # (start_idx, device outputs)
    buf: List[np.ndarray] = []
    start_idx = 0

    def flush():
        nonlocal buf, start_idx
        if not buf:
            return
        while len(buf) < batch:  # pad the tail batch
            buf.append(buf[-1])
        from monocular_depth_estimation_trt_tpu.runtime.transfer import (
            device_put_chunked,
        )

        out = eng(pipeline.params, device_put_chunked(np.stack(buf)))
        pending.append((start_idx, out))
        if len(pending) > 2:  # bounded in-flight batches
            drain(*pending.pop(0))
        buf = []

    def drain(sidx, out):
        from monocular_depth_estimation_trt_tpu.runtime.transfer import (
            tree_get_chunked,
        )

        host = tree_get_chunked(out)
        if on_result is not None:
            on_result(sidx, host)

    for idx, frame in frames_iter():
        if not buf:
            start_idx = idx
        buf.append(frame)
        n_frames += 1
        if len(buf) == batch:
            flush()
    flush()
    for item in pending:
        drain(*item)

    dt = time.perf_counter() - t0
    stats = {
        "frames": n_frames,
        "seconds": round(dt, 3),
        "fps": round(n_frames / dt, 2) if dt > 0 else 0.0,
        "batch": batch,
    }
    log(f"offline: {n_frames} frames in {dt:.2f}s -> {stats['fps']} FPS (batch {batch})")
    return stats
