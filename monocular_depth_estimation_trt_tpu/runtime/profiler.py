"""Profiling / tracing helpers.

The reference's observability is TRT's DETAILED profiling verbosity plus
wall-clock loops (``Depth_Anything_V2/onnx2trt.py:40,199-204``). The TPU
equivalents: XLA cost/memory analyses per engine (``Engine.cost_analysis``),
per-stage wall clock in ``DevicePipeline(profile=True)``, and full hardware
traces via ``jax.profiler`` wrapped here (view in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

from monocular_depth_estimation_trt_tpu.utils.logging import log


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mdet_trace"):
    """Capture a device trace around a block::

        with profiler.trace("/tmp/trace"):
            engine(params, x)
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log(f"trace written -> {logdir} (open with TensorBoard/Perfetto)")


class StageTimer:
    """Accumulating named wall-clock sections (the reference's dual FPS
    counters pattern, ``Depth_Pro/onnx2trt_webcam.py:104,151``)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax
            import numpy as np

            leaves = [
                x for x in jax.tree_util.tree_leaves(sync)
                if isinstance(x, jax.Array)
            ]
            if leaves:
                np.asarray(leaves[-1].ravel()[0:1])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(t, 4),
                "count": self.counts[name],
                "avg_ms": round(t / self.counts[name] * 1e3, 3),
            }
            for name, t in self.totals.items()
        }

    def print(self):
        for name, row in self.report().items():
            log(f"{name}: {row['avg_ms']:.2f} ms avg over {row['count']}")
