"""Warmup + timed-loop benchmark protocol.

Every reference script embeds the same protocol: N warmup iterations, then M
timed iterations with a device sync per iteration, reporting total seconds,
average FPS and average ms (reference ``Depth_Anything_V2/infer.py:21-44`` and
``onnx2trt.py:194-217``). This module is the single shared implementation;
``block_until_ready`` plays the role of ``cudaStreamSynchronize`` /
``torch.cuda.synchronize``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np

from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
from monocular_depth_estimation_trt_tpu.utils.logging import log


@dataclasses.dataclass
class BenchmarkReport:
    name: str
    iterations: int
    total_seconds: float
    times: List[float]
    h2d_ms: Optional[float] = None
    d2h_ms: Optional[float] = None
    mode: str = "sync"
    # Frames produced per dispatched iteration (>1 for windowed video models
    # whose serving unit is a multi-frame program). ``iterations`` always
    # counts actual dispatches; ``fps`` is per-FRAME; latency percentiles
    # remain per-dispatch (one window = one latency).
    frames_per_iteration: int = 1
    # Real per-iteration sync-mode latencies from a separate measured pass
    # (pipelined throughput mode has no honest per-iter timestamps — the N
    # dispatches share one terminal sync, so percentiles are only reported
    # from measured sync iterations, never fabricated from total/N).
    latency_times: Optional[List[float]] = None

    @property
    def avg_seconds(self) -> float:
        return self.total_seconds / max(self.iterations, 1)

    @property
    def fps(self) -> float:
        if self.avg_seconds <= 0:
            return float("inf")
        return self.frames_per_iteration / self.avg_seconds

    @property
    def avg_ms(self) -> float:
        return self.avg_seconds * 1000.0

    def _measured_times(self) -> Optional[List[float]]:
        if self.mode == "sync" and self.times:
            return self.times
        return self.latency_times or None

    def percentile_ms(self, q: float) -> Optional[float]:
        ts = self._measured_times()
        if not ts:
            return None
        return float(np.percentile(np.asarray(ts), q) * 1000.0)

    def print(self) -> None:
        """Reference-format report (``onnx2trt.py:214-217``)."""
        log(f"{self.iterations} iterations time: {self.total_seconds:.4f} [sec]")
        if self.frames_per_iteration > 1:
            log(
                f"Average FPS: {self.fps:.2f} [fps] "
                f"({self.frames_per_iteration} frames/iteration)"
            )
        else:
            log(f"Average FPS: {self.fps:.2f} [fps]")
        log(f"Average inference time: {self.avg_ms:.2f} [msec]")
        p50 = self.percentile_ms(50)
        if self.mode == "pipelined" and p50 is not None:
            log(
                f"sync-mode latency: p50 {p50:.2f} / p99 "
                f"{self.percentile_ms(99):.2f} [msec] "
                f"({len(self.latency_times)} measured iterations)"
            )

    def to_dict(self):
        return {
            "name": self.name,
            "iterations": self.iterations,
            "total_seconds": self.total_seconds,
            "fps": self.fps,
            "avg_ms": self.avg_ms,
            "frames_per_iteration": self.frames_per_iteration,
            "mode": self.mode,
            "p50_ms": self.percentile_ms(50),
            "p99_ms": self.percentile_ms(99),
            "h2d_ms": self.h2d_ms,
            "d2h_ms": self.d2h_ms,
        }


def _sync(result) -> None:
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if isinstance(x, jax.Array) else x, result
    )


def benchmark(
    fn: Callable,
    args: Sequence[Any] = (),
    *,
    config: Optional[BenchmarkConfig] = None,
    name: str = "model",
    host_input: Optional[np.ndarray] = None,
    fetch_output: bool = False,
    mode: str = "auto",  # "auto" | "sync" | "pipelined"
) -> BenchmarkReport:
    """Run the benchmark protocol against ``fn(*args)``.

    Two modes:

    * ``sync`` — the reference's literal loop: one frame at a time, host
      blocks on the result every iteration (``onnx2trt.py:200-204``). Faithful
      when the accelerator is locally attached (sync cost ~µs, as with the
      reference's PCIe GPU).
    * ``pipelined`` — steady-state serving throughput: all iterations are
      dispatched back to back (each with its own H2D when ``host_input`` is
      given), the host syncs once at the end; FPS = N / total. This is the
      representative protocol when the device link has high RTT — on the
      development tunnel used here a single host sync costs ~28 ms, which
      would swamp a ~4 ms model. The device still executes every frame
      serially, so per-frame time is honest.

    ``auto`` picks ``pipelined`` on TPU and ``sync`` elsewhere.
    """
    config = config or BenchmarkConfig()
    if mode == "auto":
        mode = "pipelined" if jax.default_backend() == "tpu" else "sync"

    def dispatch():
        if host_input is not None:
            dev = jax.device_put(host_input)
            return fn(dev, *args)
        return fn(*args)

    def fetch(out):
        if fetch_output:
            return jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, out
            )
        _sync(out)
        # block_until_ready can be a no-op over remote links; force a real
        # sync with a tiny readback of one element.
        leaves = [x for x in jax.tree_util.tree_leaves(out) if isinstance(x, jax.Array)]
        if leaves:
            np.asarray(leaves[-1].ravel()[0:1])
        return out

    for _ in range(config.warmup):
        fetch(dispatch())

    times: List[float] = []
    if mode == "pipelined":
        if host_input is not None:
            # Overlap H2D with compute (the reference's cudaMemcpyAsync
            # overlap, common_runtime.py:164-176): a staging thread keeps a
            # couple of frames in flight ahead of the compute stream.
            import queue as _queue
            import threading

            q: "_queue.Queue" = _queue.Queue(maxsize=3)
            stop = object()

            def stager():
                for _ in range(config.iterations):
                    q.put(jax.device_put(host_input))
                q.put(stop)

            begin = time.perf_counter()
            t = threading.Thread(target=stager, daemon=True)
            t.start()
            out = None
            while True:
                item = q.get()
                if item is stop:
                    break
                out = fn(item, *args)
            fetch(out)
            total = time.perf_counter() - begin
            t.join()
        else:
            begin = time.perf_counter()
            out = None
            for _ in range(config.iterations):
                out = dispatch()
            fetch(out)
            total = time.perf_counter() - begin
        # Separate measured latency pass: real sync-per-iteration timings
        # (the reference's protocol, onnx2trt.py:200-204) so p50/p99 are
        # measured, never synthesized from total/N. On a remote tunnel this
        # includes the link RTT — labeled as sync-mode latency in the report.
        latency_times: List[float] = []
        for _ in range(min(getattr(config, "latency_iterations", 10),
                           config.iterations)):
            begin = time.perf_counter()
            fetch(dispatch())
            latency_times.append(time.perf_counter() - begin)
        return BenchmarkReport(
            name=name,
            iterations=config.iterations,
            total_seconds=total,
            times=[],
            mode="pipelined",
            latency_times=latency_times,
        )
    else:
        total = 0.0
        for _ in range(config.iterations):
            begin = time.perf_counter()
            fetch(dispatch())
            dt = time.perf_counter() - begin
            times.append(dt)
            total += dt

    report = BenchmarkReport(
        name=name, iterations=config.iterations, total_seconds=total, times=times,
        mode="sync",
    )
    return report
