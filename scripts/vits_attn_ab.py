#!/usr/bin/env python
"""Full-pipeline A/B: DA-V2 vits @518 with XLA vs Pallas-flash attention.

The roofline audit (scripts/roofline.py) shows vits at 92% of the HBM roof
with 3.41 GB accessed/frame; the XLA attention path materializes fp32 score
tensors (~1.6 GB of that). If the flash kernel's compute cost is below the
bytes it saves, the ~280 FPS ceiling moves.

Prints one JSON line per variant with fps and bytes accessed.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main() -> None:
    import numpy as np

    import jax

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    for impl in ("xla", "flash", "packed"):
        pipe = build_pipeline("depth_anything_v2", encoder="vits",
                              attn_impl=impl)
        eng = pipe.engine_for((518, 518))
        eng.compile()
        ca = eng.cost_analysis() or {}
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        byts = float(ca.get("bytes accessed", 0) or 0)
        rng = np.random.default_rng(0)
        frame = jax.device_put(
            rng.integers(0, 255, (518, 518, 3), dtype=np.uint8))
        rep = benchmark(lambda f: eng(pipe.params, f), (frame,),
                        config=BenchmarkConfig(warmup=5, iterations=50),
                        name=f"vits_{impl}")
        print(json.dumps({
            "impl": impl,
            "fps": round(rep.fps, 1),
            "avg_ms": round(rep.avg_ms, 3),
            "gbytes_accessed": round(byts / 1e9, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
