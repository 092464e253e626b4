"""Multi-stage device-resident pipelines.

The reference's only graph-of-engines orchestration is VGGT: an aggregator
engine feeding depth-head and camera-head engines, chained with
``cudaMemcpyAsync`` device-to-device copies on one stream so intermediate
tokens never touch the host (reference ``VGGT/onnx2trt2.py:155-208``).

In JAX, arrays returned by one jitted stage stay on device when passed to the
next, so "D2D chaining" is the default; this module makes the structure
explicit, lets stages be compiled independently (or fused), and gives a place
to attach per-stage profiling. Fusing all stages into one jit is usually
fastest on TPU (XLA schedules the whole graph); per-stage mode mirrors the
reference and is useful when heads run conditionally.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax

from monocular_depth_estimation_trt_tpu.runtime.engine import Engine


@dataclasses.dataclass
class Stage:
    name: str
    fn: Callable  # (carry_dict) -> dict of new/updated tensors
    inputs: Sequence[str]
    outputs: Sequence[str]


class DevicePipeline:
    """Named-tensor dataflow over jitted stages; intermediates stay on device.

    Example (the VGGT pattern)::

        pipe = DevicePipeline([
            Stage("aggregator", agg_fn, ["images"], ["tokens"]),
            Stage("depth_head", depth_fn, ["tokens"], ["depth", "depth_conf"]),
            Stage("camera_head", cam_fn, ["tokens"], ["pose_enc"]),
        ])
        out = pipe({"images": imgs})   # host round-trips: zero
    """

    def __init__(self, stages: Sequence[Stage], *, jit_stages: bool = True):
        self.stages = list(stages)
        self._fns = {}
        for s in self.stages:
            self._fns[s.name] = jax.jit(s.fn) if jit_stages else s.fn
        self.last_stage_ms: Dict[str, float] = {}

    def __call__(
        self, feeds: Dict[str, Any], *, profile: bool = False
    ) -> Dict[str, Any]:
        env = dict(feeds)
        for s in self.stages:
            args = [env[k] for k in s.inputs]
            if profile:
                t0 = time.perf_counter()
            result = self._fns[s.name](*args)
            if profile:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready() if isinstance(x, jax.Array) else x,
                    result,
                )
                self.last_stage_ms[s.name] = (time.perf_counter() - t0) * 1e3
            if not isinstance(result, (tuple, list)):
                result = (result,)
            if len(result) != len(s.outputs):
                raise ValueError(
                    f"stage {s.name!r} returned {len(result)} outputs, "
                    f"declared {len(s.outputs)}"
                )
            env.update(zip(s.outputs, result))
        return env

    def fused(self, output_names: Sequence[str]) -> Callable:
        """Return one jittable function computing ``output_names`` end-to-end.

        On TPU this is the preferred execution mode: XLA sees the whole graph
        and can overlap/fuse across stage boundaries — strictly better than
        the reference's sequential engine enqueues on one stream.
        """

        def run(feeds: Dict[str, Any]):
            env = dict(feeds)
            for s in self.stages:
                result = s.fn(*[env[k] for k in s.inputs])
                if not isinstance(result, (tuple, list)):
                    result = (result,)
                env.update(zip(s.outputs, result))
            return {k: env[k] for k in output_names}

        return run
