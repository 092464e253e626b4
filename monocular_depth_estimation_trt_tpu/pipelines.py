"""End-to-end inference pipelines: decode-on-host, everything-else-on-device.

The reference's per-model ``onnx2trt.py main()`` (e.g.
``Depth_Anything_V2/onnx2trt.py:132-264``) is: host preprocess (cv2/numpy) ->
H2D -> engine execute -> D2H -> host postprocess (torch interpolate, clamp)
-> host colormap. Here one jitted XLA program does preprocess + model +
postprocess (+ optional colormap) in a single device launch per frame; the
host only decodes the image and encodes the outputs.

A pipeline is compiled per (original H, W) — static shapes, like a TRT engine
profile; the reference pins shapes the same way (dynamic shapes were attempted
and abandoned, ``Depth_Anything_V2/onnx_export.py:35``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig, ModelSpec
from monocular_depth_estimation_trt_tpu.ops.colormap import turbo_colormap
from monocular_depth_estimation_trt_tpu.ops.postprocess import (
    inverse_depth_normalize,
    normalize_depth_for_viz,
    upsample_depth,
)
from monocular_depth_estimation_trt_tpu.runtime.benchmark import BenchmarkReport, benchmark
from monocular_depth_estimation_trt_tpu.runtime.engine import Engine
from monocular_depth_estimation_trt_tpu.utils.logging import log


class DepthPipeline:
    """Single-image depth pipeline around a (preprocess, model, postprocess)
    triple fused into one jitted program.

    Parameters
    ----------
    spec: ModelSpec for naming/caching.
    forward: fn(params, image_u8 (H0,W0,3), out_hw) -> dict of outputs; must be
        jit-traceable with static out_hw.
    params: model parameter pytree (already on device).
    """

    def __init__(
        self,
        spec: ModelSpec,
        forward: Callable,
        params: Any,
        *,
        viz: str = "relative",  # "relative" | "metric" | "none"
    ):
        self.spec = spec
        self.params = params
        self._forward = forward
        self.viz = viz
        self._engines: Dict[Tuple, Engine] = {}

    # -- compilation ------------------------------------------------------
    def engine_for(self, in_hw: Tuple[int, int], with_viz: bool = False) -> Engine:
        key = (in_hw, with_viz)
        if key in self._engines:
            return self._engines[key]

        def run(params, img):
            out = self._forward(params, img, in_hw)
            if with_viz and self.viz != "none" and "depth" in out:
                if self.viz == "metric":
                    norm = inverse_depth_normalize(out["depth"])
                else:
                    norm = normalize_depth_for_viz(out["depth"])
                out["viz"] = turbo_colormap(norm)
            return out

        example = jax.ShapeDtypeStruct((in_hw[0], in_hw[1], 3), jnp.uint8)
        name = f"{self.spec.artifact_name()}_in{in_hw[0]}x{in_hw[1]}" + (
            "_viz" if with_viz else ""
        )
        eng = Engine(run, (self.params, example), name=name)
        self._engines[key] = eng
        return eng

    # -- execution --------------------------------------------------------
    def __call__(
        self, image_u8: np.ndarray, *, viz: bool = False, device_out: bool = False
    ) -> Dict[str, Any]:
        """image_u8: (H, W, 3) RGB uint8. Returns dict of host numpy outputs
        (or device arrays if ``device_out``)."""
        h, w = image_u8.shape[:2]
        eng = self.engine_for((h, w), viz)
        out = eng(self.params, jnp.asarray(image_u8))
        if device_out:
            return out
        return {k: np.asarray(v) for k, v in out.items()}

    # -- benchmark --------------------------------------------------------
    def benchmark(
        self,
        in_hw: Tuple[int, int],
        config: Optional[BenchmarkConfig] = None,
        *,
        include_pre_post: bool = True,
    ) -> BenchmarkReport:
        """Reference protocol (``onnx2trt.py:194-217``): warmup then timed
        loop, each iteration = H2D + full program + D2H of the depth map."""
        eng = self.engine_for(in_hw, False)
        eng.compile()
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, size=(in_hw[0], in_hw[1], 3), dtype=np.uint8)

        def step(img_dev):
            return eng(self.params, img_dev)

        report = benchmark(
            step,
            host_input=frame,
            fetch_output=include_pre_post,
            config=config,
            name=self.spec.artifact_name(),
        )
        return report


def depth_forward_factory(
    model_apply: Callable,
    preprocess: Callable,
    *,
    clamp: Optional[Tuple[float, float]] = (1e-3, 1e3),
) -> Callable:
    """Standard single-depth-output forward: preprocess -> model ->
    upsample(align_corners=True) to original -> clamp.

    Matches the reference DA-V2 template postprocess
    (``Depth_Anything_V2/onnx2trt.py:208-211``).
    """

    def forward(params, img_u8, out_hw):
        x = preprocess(img_u8)
        depth = model_apply(params, x)  # (1, h, w)
        depth = upsample_depth(depth, out_hw, clamp=clamp)[0]
        return {"depth": depth}

    return forward
