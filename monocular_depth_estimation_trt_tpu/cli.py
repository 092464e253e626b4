"""Command-line interface.

Replaces the reference's "edit constants at the top of the script" workflow
(``Depth_Anything_V2/onnx2trt.py:153-159``) with one typed CLI::

    python -m monocular_depth_estimation_trt_tpu run depth_anything_v2 \
        --encoder vits --image data/example.jpg --out results/

    python -m monocular_depth_estimation_trt_tpu bench depth_anything_v2 --encoder vits
    python -m monocular_depth_estimation_trt_tpu models

Artifacts mirror the reference's outputs: turbo-colormapped ``.jpg``,
compressed ``.npz`` depth, optional ``.ply`` point cloud, and the
``[MDET] max/min`` parity line (``onnx2trt.py:218-245``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from monocular_depth_estimation_trt_tpu.utils.logging import log


def _load_image(path: str) -> np.ndarray:
    import cv2

    raw = cv2.imread(path)
    if raw is None:
        raise FileNotFoundError(f"[MDET] image not found: {path}")
    return cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)


def cmd_run(args) -> int:
    import cv2

    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    img = _load_image(args.image)
    if args.resize:
        img = cv2.resize(img, (args.resize, args.resize))
    log(f"original shape : {img.shape}")

    kw = {}
    if args.encoder:
        kw["encoder"] = args.encoder
    if args.metric:
        kw["metric"] = True
        kw["dataset"] = args.dataset
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    pipe = build_pipeline(args.model, **kw)

    out = pipe(img, viz=True)
    depth = out["depth"]
    log(f"max : {depth.max():0.5f} , min : {depth.min():0.5f}")

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.image))[0]
    name = pipe.spec.artifact_name()
    jpg = os.path.join(args.out, f"{stem}_{name}.jpg")
    if "viz" in out:
        cv2.imwrite(jpg, cv2.cvtColor(out["viz"], cv2.COLOR_RGB2BGR))
        log(f"wrote {jpg}")
    npz = os.path.join(args.out, f"{stem}_{name}.npz")
    np.savez_compressed(npz, depth=depth)
    log(f"wrote {npz}")

    if args.pointcloud:
        from monocular_depth_estimation_trt_tpu.apps.pointcloud import (
            depth_to_pointcloud_file,
        )

        ply = os.path.join(args.out, f"{stem}_{name}.ply")
        depth_to_pointcloud_file(depth, img, ply, focal=args.focal)
        log(f"wrote {ply}")

    if args.benchmark:
        report = pipe.benchmark((img.shape[0], img.shape[1]))
        report.print()
    return 0


def cmd_bench(args) -> int:
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    kw = {"encoder": args.encoder} if args.encoder else {}
    pipe = build_pipeline(args.model, **kw)
    report = pipe.benchmark(
        (args.size, args.size),
        BenchmarkConfig(warmup=args.warmup, iterations=args.iterations),
    )
    report.print()
    return 0


def cmd_models(_args) -> int:
    from monocular_depth_estimation_trt_tpu.registry import list_models

    for name in list_models():
        print(name)
    return 0


def cmd_engines(_args) -> int:
    from monocular_depth_estimation_trt_tpu.runtime.engine import EngineRegistry

    reg = EngineRegistry()
    for name in reg.list():
        entry = reg.load(name) or {}
        bt = entry.get("build_seconds")
        print(f"{name}  build={bt:.2f}s" if bt else name)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mdet", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="single-image inference")
    run.add_argument("model")
    run.add_argument("--encoder", default="")
    run.add_argument("--image", default="data/example.jpg")
    run.add_argument("--out", default="results")
    run.add_argument("--resize", type=int, default=0,
                     help="pre-resize the raw image to a square (reference onnx2trt.py:146)")
    run.add_argument("--metric", action="store_true")
    run.add_argument("--dataset", default="hypersim")
    run.add_argument("--checkpoint", default="")
    run.add_argument("--pointcloud", action="store_true")
    run.add_argument("--focal", type=float, default=470.4,
                     help="focal for unprojection (reference onnx2trt_pointcloud.py)")
    run.add_argument("--benchmark", action="store_true")
    run.set_defaults(fn=cmd_run)

    bench = sub.add_parser("bench", help="benchmark a model config")
    bench.add_argument("model")
    bench.add_argument("--encoder", default="")
    bench.add_argument("--size", type=int, default=518)
    bench.add_argument("--warmup", type=int, default=10)
    bench.add_argument("--iterations", type=int, default=100)
    bench.set_defaults(fn=cmd_bench)

    sub.add_parser("models", help="list registered models").set_defaults(fn=cmd_models)
    sub.add_parser("engines", help="list built engines").set_defaults(fn=cmd_engines)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
