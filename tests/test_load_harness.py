"""In-process serving load harness (scripts/load_harness.py).

Drives DepthServer.submit with closed-loop client threads against a fake
pipeline — gates the measurement mechanics (throughput/latency/batch
accounting) and the backpressure contract (queue-full → rejected, client
backs off, nothing deadlocks), i.e. the cold-bucket class of serving bug
stays covered without hardware.
"""

import importlib.util
import os
import time

import numpy as np

from monocular_depth_estimation_trt_tpu.config import ModelSpec


def _load_harness():
    root = os.path.join(os.path.dirname(__file__), "..", "scripts")
    spec = importlib.util.spec_from_file_location(
        "load_harness", os.path.join(root, "load_harness.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class BatchedFake:
    """Batch-capable fake pipeline: records every launch's batch size."""

    def __init__(self, delay_s: float = 0.002):
        self.spec = ModelSpec(model="fake", input_hw=(16, 16),
                              precision="fp32")
        self.delay_s = delay_s
        self.batch_sizes = []

    def __call__(self, frame, viz=False, device_out=False):
        time.sleep(self.delay_s)
        self.batch_sizes.append(1)
        return {"depth": frame[..., 0].astype(np.float32)}

    def batch_call(self, frames, viz=False, device_out=False):
        time.sleep(self.delay_s)  # one launch regardless of batch size
        self.batch_sizes.append(len(frames))
        return {"depth": frames[..., 0].astype(np.float32)}


def test_run_load_reports_throughput_and_latency():
    h = _load_harness()
    pipe = BatchedFake()
    row = h.run_load(pipe, concurrency=2, max_batch=1, duration_s=1.0,
                     input_hw=(16, 16))
    assert row["ok"] > 0 and row["throughput_fps"] > 0
    assert row["p50_ms"] is not None and row["p99_ms"] >= row["p50_ms"]
    assert row["failed"] == 0 and row["timeouts"] == 0


def test_batching_engages_under_concurrency():
    h = _load_harness()
    pipe = BatchedFake(delay_s=0.01)
    row = h.run_load(pipe, concurrency=8, max_batch=8, duration_s=1.5,
                     input_hw=(16, 16))
    assert row["ok"] > 0
    # with 8 closed-loop clients against a 10 ms launch, groups must form
    assert row["avg_batch"] is not None and row["avg_batch"] > 1.5
    assert max(pipe.batch_sizes) > 1


def test_backpressure_rejects_do_not_deadlock():
    h = _load_harness()
    pipe = BatchedFake(delay_s=0.05)  # slow device, tiny queue
    t0 = time.perf_counter()
    row = h.run_load(pipe, concurrency=8, max_batch=1, duration_s=1.0,
                     input_hw=(16, 16), max_queue=2)
    wall = time.perf_counter() - t0
    assert row["rejected_503"] > 0          # queue-full surfaced as backpressure
    assert row["ok"] > 0                    # yet requests still complete
    assert row["timeouts"] == 0
    assert wall < 30                        # threads all joined (no deadlock)


def test_chip_side_mode_uses_device_frames_and_probe():
    """--chip-side (round-4 verdict item 9): groups launch on the warmup's
    device-resident synthetic batches (no per-request frame stacking) and
    resolve with a 1-element probe instead of the bulk readback."""
    import jax

    h = _load_harness()

    class Recorder(BatchedFake):
        def __init__(self):
            super().__init__(delay_s=0.001)
            self.input_types = []

        def __call__(self, frame, viz=False, device_out=False):
            self.input_types.append(type(frame))
            return super().__call__(frame, viz=viz, device_out=device_out)

        def batch_call(self, frames, viz=False, device_out=False):
            self.input_types.append(type(frames))
            return super().batch_call(frames, viz=viz,
                                      device_out=device_out)

    pipe = Recorder()
    row = h.run_load(pipe, concurrency=4, max_batch=4, duration_s=1.0,
                     input_hw=(16, 16), chip_side=True)
    assert row["ok"] > 0 and row["failed"] == 0
    # warmup compiles with host zeros (6 calls: 2 single + 2x2 buckets);
    # every LIVE launch consumed a pre-uploaded device array
    live = pipe.input_types[6:]
    assert live
    assert all(issubclass(t, jax.Array) for t in live)
