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


def _fov_from_outputs(out, depth_hw):
    """(fov_x_deg, fov_y_deg) from whichever camera estimate the model
    emits, or None. Conventions: MoGe ``focal`` is in normalized view-plane
    units (``ops/camera.py::normalized_view_plane_uv``); Depth Pro ``f_px``
    and UniDepth ``intrinsics`` are in pixels of the ORIGINAL image."""
    import math

    h, w = int(depth_hw[0]), int(depth_hw[1])
    if "focal" in out:  # MoGe normalized focal
        f = float(np.asarray(out["focal"]))
        if f <= 0:
            return None
        diag = math.hypot(h, w)
        return (math.degrees(2 * math.atan((w / diag) / f)),
                math.degrees(2 * math.atan((h / diag) / f)))
    if "f_px" in out:
        f = float(np.asarray(out["f_px"]))
        if f <= 0:
            return None
        return (math.degrees(2 * math.atan(0.5 * w / f)),
                math.degrees(2 * math.atan(0.5 * h / f)))
    if "intrinsics" in out:
        K = np.asarray(out["intrinsics"])
        if K.shape != (3, 3) or K[0, 0] <= 0 or K[1, 1] <= 0:
            return None
        return (math.degrees(2 * math.atan(0.5 * w / K[0, 0])),
                math.degrees(2 * math.atan(0.5 * h / K[1, 1])))
    return None


def _apply_device_mesh(pipe, mesh_str: str):
    """Shard a pipeline over ``--device-mesh DxM`` (data x model axes).

    ``1x1`` (or an absent flag) is the single-chip case and a no-op; on a
    1-device mesh every sharding spec collapses to replication so the same
    program runs unchanged (see parallel/sharding.py)."""
    if not mesh_str:
        return pipe
    import jax

    from monocular_depth_estimation_trt_tpu.parallel.mesh import get_mesh

    try:
        shape = tuple(int(s) for s in mesh_str.lower().split("x"))
    except ValueError:
        raise SystemExit(f"[MDET] bad --device-mesh {mesh_str!r}; want DxM")
    need = 1
    for s in shape:
        need *= s
    devices = jax.devices()
    if need > len(devices):
        raise SystemExit(
            f"[MDET] --device-mesh {mesh_str} needs {need} devices; "
            f"{len(devices)} available"
        )
    mesh = get_mesh(shape, ("data", "model"), devices=devices[:need])
    return pipe.apply_mesh(mesh)


def _calib_images_from(args):
    """--calib-dir: load up to 8 domain images for int8 activation-scale
    calibration (default: the bundled example + synthetic textures,
    registry._calibration_images). Returns None when the flag is absent."""
    d = getattr(args, "calib_dir", "")
    if not d:
        return None
    from monocular_depth_estimation_trt_tpu.utils.files import list_images

    paths = list_images(d)[:8]
    if not paths:
        raise SystemExit(f"[MDET] --calib-dir {d}: no images found")
    log(f"int8 calibration on {len(paths)} images from {d}")
    return [_load_image(p) for p in paths]


def _load_artifact(path, *, surface, need_viz=False, allow_stream_viz=False,
                   need_images=(1,), need_views=None):
    """Validate an .mdeteng against a surface's needs from meta ALONE
    (read_meta is a zip-header read), then load — so a wrong artifact is
    rejected before the weight device-put and module deserialization.
    Returns None after logging when the artifact cannot serve the surface.

    ``need_viz`` counts only per-call (non-stream) viz modules — the
    surfaces that call ``pipe(frame, viz=True)`` directly can't use the
    stream module's viz. ``allow_stream_viz`` additionally accepts a
    stream module (surfaces that route through ``.stream()``, i.e. video)."""
    from monocular_depth_estimation_trt_tpu.runtime.export import (
        load_engine,
        read_meta,
    )

    meta = read_meta(path)
    n = int(meta.get("n_image_args", 1))
    if n not in need_images:
        log(f"{surface} needs a {'/'.join(map(str, need_images))}-image "
            f"artifact; {path} takes {n} image(s) per call", tag="ERROR")
        return None
    mods = list(meta["modules"].values())
    call_viz = any(m["viz"] and not m.get("stream") for m in mods)
    stream_viz = any(m.get("stream") for m in mods)
    if need_viz and not (call_viz or (allow_stream_viz and stream_viz)):
        log(f"{surface} needs a viz module; re-export with --viz or "
            "--serve-bundle", tag="ERROR")
        return None
    if need_views is not None:
        avail = sorted(m["views"] for m in meta["modules"].values()
                       if m.get("views"))
        if need_views not in avail:
            log(f"{surface}: no views module for S={need_views} "
                f"(available: {avail}); re-export with --views",
                tag="ERROR")
            return None
    return load_engine(path)


def cmd_run(args) -> int:
    import cv2

    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    img = _load_image(args.image)
    if args.resize:
        img = cv2.resize(img, (args.resize, args.resize))
    log(f"original shape : {img.shape}")

    if getattr(args, "engine", ""):
        # serve from a serialized .mdeteng artifact — no model code, no
        # checkpoints; the deserialize-and-run consumer the reference gets
        # from TRT plan files (common_runtime.py deserialize_cuda_engine)
        from monocular_depth_estimation_trt_tpu.runtime.export import (
            load_engine,
        )

        eng = load_engine(args.engine)
        log(f"loaded engine: {eng.describe()}")
        # fit up front (not just inside the call) so the artifact-writing
        # tail colors pointclouds from the frame the depth was computed on
        img = eng.fit(img)
        out = eng(img, viz=True)
        name = eng.meta.get("artifact", "engine")
        return _write_run_outputs(args, img, out, name, pipe=eng)

    if not args.model:
        log("run: give a model name (or --engine artifact)", tag="ERROR")
        return 2

    kw = {}
    if args.encoder:
        kw["encoder"] = args.encoder
    if args.metric:
        kw["metric"] = True
        kw["dataset"] = args.dataset
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    if getattr(args, "precision", ""):
        kw["precision"] = args.precision
    ci = _calib_images_from(args)
    if ci is not None:
        kw["calib_images"] = ci
    pipe = build_pipeline(args.model, **kw)
    pipe = _apply_device_mesh(pipe, getattr(args, "device_mesh", ""))

    out = pipe(img, viz=True)
    return _write_run_outputs(args, img, out, pipe.spec.artifact_name(),
                              pipe=pipe)


def _write_run_outputs(args, img, out, name, pipe) -> int:
    """Artifact-writing tail shared by the model path and the serialized-
    engine path of ``mdet run`` (jpg/npz/fov/pointcloud/compare). ``pipe``
    is a registry pipeline or a LoadedEngine — both expose benchmark()."""
    import cv2

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.image))[0]

    if "depth" not in out:
        # calibration-style pipelines (GeoCalib): scalar estimates + fields
        # (reference later/GeoCalib/infer.py:35-39 print format)
        deg = 180.0 / np.pi
        if "roll" in out:
            log(f"Roll:  {float(out['roll']) * deg:.1f}° "
                f"(± {float(out.get('roll_uncertainty', 0)) * deg:.1f})°")
            log(f"Pitch: {float(out['pitch']) * deg:.1f}° "
                f"(± {float(out.get('pitch_uncertainty', 0)) * deg:.1f})°")
            log(f"vFoV:  {float(out['vfov']) * deg:.1f}° "
                f"(± {float(out.get('vfov_uncertainty', 0)) * deg:.1f})°")
            log(f"Focal: {float(out['focal']):.1f} px "
                f"(± {float(out.get('focal_uncertainty', 0)):.1f} px)")
        npz = os.path.join(args.out, f"{stem}_{name}.npz")
        np.savez_compressed(npz, **{k: np.asarray(v) for k, v in out.items()})
        log(f"wrote {npz}")
        if args.benchmark:
            pipe.benchmark((img.shape[0], img.shape[1])).print()
        return 0

    depth = out["depth"]
    log(f"max : {depth.max():0.5f} , min : {depth.min():0.5f}")
    jpg = os.path.join(args.out, f"{stem}_{name}.jpg")
    if "viz" in out:
        cv2.imwrite(jpg, cv2.cvtColor(out["viz"], cv2.COLOR_RGB2BGR))
        log(f"wrote {jpg}")
    npz = os.path.join(args.out, f"{stem}_{name}.npz")
    np.savez_compressed(npz, depth=depth)
    log(f"wrote {npz}")

    fov = _fov_from_outputs(out, depth.shape)
    if fov is not None:
        # dedicated fov artifact (reference MoGe_2/onnx2trt.py:211-213)
        import json

        fov_path = os.path.join(args.out, f"{stem}_{name}_fov.json")
        with open(fov_path, "w") as f:
            json.dump({"fov_x": round(fov[0], 2),
                       "fov_y": round(fov[1], 2)}, f)
        log(f"wrote {fov_path} (fov_x {fov[0]:.2f}°, fov_y {fov[1]:.2f}°)")

    if args.colorbar:
        from monocular_depth_estimation_trt_tpu.apps.pointcloud import (
            save_metric_colorbar_figure,
        )

        bar = os.path.join(args.out, f"{stem}_{name}_depth_bar.jpg")
        save_metric_colorbar_figure(depth, bar)
        log(f"wrote {bar}")

    if args.pointcloud:
        from monocular_depth_estimation_trt_tpu.apps.pointcloud import (
            depth_to_pointcloud_file,
            points_to_mesh_file,
        )

        ext = "glb" if args.mesh_format == "glb" else "ply"
        ply = os.path.join(args.out, f"{stem}_{name}.{ext}")
        if args.mesh and "points" in out:
            # triangulated mesh from the model's point map (MoGe-2 path,
            # reference MoGe_2/onnx2trt.py:269-317)
            points_to_mesh_file(out["points"], img, ply,
                                mask=out.get("mask"))
        else:
            # prefer the model's own camera estimate when it predicts one
            # (Depth Pro f_px, UniDepth intrinsics — reference
            # Depth_Pro/onnx2trt_pointcloud.py:216-230)
            focal = args.focal
            intrinsics = None
            if "f_px" in out:
                focal = float(out["f_px"])
                log(f"using predicted focal length: {focal:.2f} px")
            if "intrinsics" in out:
                intrinsics = out["intrinsics"]
            depth_to_pointcloud_file(depth, img, ply, focal=focal,
                                     intrinsics=intrinsics)
        log(f"wrote {ply}")

    if args.compare:
        # one-flag regression check vs a stored depth npz — replaces the
        # reference's eyeball max/min protocol (README "max : ... min : ...")
        ref = np.load(args.compare)["depth"]
        if ref.shape != depth.shape:
            log(f"compare: shape mismatch ours {depth.shape} vs ref "
                f"{ref.shape}", tag="ERROR")
            return 1
        err = float(np.max(np.abs(np.asarray(depth) - ref)))
        rel = err / max(float(np.max(np.abs(ref))), 1e-6)
        log(f"compare vs {args.compare}: max-abs-err {err:.6f} "
            f"(rel {rel:.2e})")
        if rel > args.compare_tol:
            log(f"compare FAILED (tol {args.compare_tol:g})", tag="ERROR")
            return 1

    if args.benchmark:
        pipe.benchmark((img.shape[0], img.shape[1])).print()
    return 0


def cmd_batch(args) -> int:
    """Batched offline serving over an image directory or video — the
    native-decode-ring + batched-engine path (``apps/offline.py``). The
    reference's analogue is the frame-dir loop at batch=1
    (``RAFT/onnx2trt.py:150-196``, ``Depth_Anything_V2/
    onnx2trt_pointcloud_vis.py:68-93``); here decode threads keep a ring of
    stable buffers ahead of a (B, H, W, 3) engine."""
    import json

    from monocular_depth_estimation_trt_tpu.apps.offline import (
        process_images_batched,
    )
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.utils.files import list_images

    if bool(args.images_dir) == bool(args.video):
        log("batch: give exactly one of --images-dir / --video", tag="ERROR")
        return 2

    if args.video:
        from monocular_depth_estimation_trt_tpu.apps.streaming import (
            extract_frames_from_video,
        )

        frames_dir = os.path.join(args.out, "_frames")
        extract_frames_from_video(args.video, frames_dir,
                                  max_frames=args.max_frames or None)
        paths = list_images(frames_dir)
    else:
        paths = list_images(args.images_dir)
        if args.max_frames:
            paths = paths[: args.max_frames]
    if not paths:
        log("batch: no images found", tag="ERROR")
        return 1

    if getattr(args, "engine", ""):
        from monocular_depth_estimation_trt_tpu.runtime.export import (
            load_engine,
        )

        pipe = load_engine(args.engine)
        log(f"batch-serving from artifact: {pipe.describe()}")
    else:
        if not args.model:
            log("batch: give a model name (or --engine artifact)",
                tag="ERROR")
            return 2
        kw = {"encoder": args.encoder} if args.encoder else {}
        if args.checkpoint:
            kw["checkpoint"] = args.checkpoint
        if getattr(args, "precision", ""):
            kw["precision"] = args.precision
        ci = _calib_images_from(args)
        if ci is not None:
            kw["calib_images"] = ci
        pipe = build_pipeline(args.model, **kw)

    os.makedirs(args.out, exist_ok=True)
    name = pipe.spec.artifact_name()

    on_result = None
    writer_thread = None
    write_q = None
    write_errors: list = []
    if args.save:
        import cv2
        import queue as _queue
        import threading

        from monocular_depth_estimation_trt_tpu.runtime import native

        def _write_batch(start_idx, host):
            depths = np.asarray(host["depth"])
            for j in range(depths.shape[0]):
                i = start_idx + j
                if i >= len(paths):  # tail-batch padding
                    break
                stem = os.path.splitext(os.path.basename(paths[i]))[0]
                np.savez_compressed(
                    os.path.join(args.out, f"{stem}_{name}.npz"),
                    depth=depths[j],
                )
                d = depths[j]
                norm = ((d - d.min()) / max(float(d.max() - d.min()), 1e-6)
                        * 255).astype(np.uint8)
                bgr = cv2.applyColorMap(norm, cv2.COLORMAP_INFERNO)
                jpg = os.path.join(args.out, f"{stem}_{name}.jpg")
                ok = False
                if native.native_available():
                    ok = native.encode_jpg(
                        jpg, np.ascontiguousarray(bgr[..., ::-1]))
                if not ok:  # cv2 fallback also covers a native encode fail
                    ok = bool(cv2.imwrite(jpg, bgr))
                if not ok:
                    raise IOError(f"could not write {jpg}")

        # writes happen OFF the submit loop: a bounded queue + one writer
        # thread keeps savez/colormap/encode from serializing with the
        # next batch's device flush (hostio.cpp does the JPEG encode when
        # the native lib is built)
        write_q = _queue.Queue(maxsize=8)

        def _writer():
            while True:
                item = write_q.get()
                if item is None:
                    return
                try:
                    _write_batch(*item)
                except Exception as e:  # keep the run going, report at end
                    write_errors.append(str(e))
                    log(f"batch write failed: {e}", tag="ERROR")

        writer_thread = threading.Thread(target=_writer, daemon=True)
        writer_thread.start()

        def on_result(start_idx, host):
            write_q.put((start_idx, host))

    try:
        stats = process_images_batched(
            pipe, paths, batch=args.batch, on_result=on_result,
            decode_threads=args.decode_threads,
        )
    finally:
        # flush queued results even when the run raises mid-way — already-
        # computed outputs land on disk instead of dying with the daemon
        if writer_thread is not None:
            write_q.put(None)
            writer_thread.join()
    if args.save and write_errors:
        log(f"batch: {len(write_errors)} write failure(s); first: "
            f"{write_errors[0]}", tag="ERROR")
        return 1
    print(json.dumps({"metric": f"{name}_batched_fps",
                      "value": stats["fps"], "unit": "fps",
                      "batch": stats["batch"], "frames": stats["frames"]}))
    return 0


def _maybe_trace(args):
    """``--trace DIR``: capture a jax.profiler device trace around the
    timed loop (the TRT ``ProfilingVerbosity.DETAILED`` role,
    ``Depth_Anything_V2/onnx2trt.py:40``) — otherwise a no-op context."""
    import contextlib

    logdir = getattr(args, "trace", "")
    if not logdir:
        return contextlib.nullcontext()
    from monocular_depth_estimation_trt_tpu.runtime import profiler

    return profiler.trace(logdir)


def cmd_bench(args) -> int:
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    if getattr(args, "engine", ""):
        from monocular_depth_estimation_trt_tpu.runtime.export import (
            load_engine,
            read_meta,
        )

        meta = read_meta(args.engine)
        if getattr(args, "device_mesh", "") or getattr(args, "precision", ""):
            log("bench --engine: --device-mesh/--precision are baked into "
                "the artifact at export time; flags ignored at load",
                tag="ERROR")
            return 2
        if args.size and (args.size, args.size) != tuple(meta["in_hw"]):
            log(f"bench --engine: artifact is fixed at "
                f"{tuple(meta['in_hw'])}; --size {args.size} cannot apply "
                "(re-export at that size)", tag="ERROR")
            return 2
        eng = load_engine(args.engine)
        log(f"benchmarking artifact: {eng.describe()}")
        cfg = BenchmarkConfig(warmup=args.warmup,
                              iterations=args.iterations)
        with _maybe_trace(args):
            if getattr(args, "views", 0) and args.views > 1:
                eng.benchmark_views(args.views, cfg).print()
            else:
                eng.benchmark(config=cfg).print()
        return 0

    if not args.model:
        log("bench: give a model name (or --engine artifact)", tag="ERROR")
        return 2

    kw = {"encoder": args.encoder} if args.encoder else {}
    if getattr(args, "precision", ""):
        kw["precision"] = args.precision
    pipe = build_pipeline(args.model, **kw)
    pipe = _apply_device_mesh(pipe, getattr(args, "device_mesh", ""))
    cfg = BenchmarkConfig(warmup=args.warmup, iterations=args.iterations)
    with _maybe_trace(args):
        if getattr(args, "views", 0) and args.views > 1:
            if not hasattr(pipe, "benchmark_views"):
                log(f"{args.model} has no multi-view protocol", tag="ERROR")
                return 2
            report = pipe.benchmark_views(args.views, cfg)
        else:
            size = args.size or 518
            report = pipe.benchmark((size, size), cfg)
    report.print()
    return 0


def cmd_flow(args) -> int:
    """Optical flow over consecutive frames of a directory or video
    (reference RAFT/NeuFlow/MeFlow onnx2trt video loops)."""
    import cv2

    from monocular_depth_estimation_trt_tpu.apps.streaming import (
        extract_frames_from_video,
        run_flow_frames,
    )
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    if getattr(args, "engine", ""):
        pipe = _load_artifact(args.engine, surface="flow",
                              need_viz=True, need_images=(2, 3))
        if pipe is None:
            return 2
        log(f"flow from artifact: {pipe.describe()}")
        model_name = pipe.spec.model
        n_imgs = int(pipe.meta.get("n_image_args", 1))
    else:
        if not args.model:
            log("flow: give a model name (or --engine artifact)",
                tag="ERROR")
            return 2
        kw = {}
        if args.iters:
            kw["iters"] = args.iters
        pipe = build_pipeline(args.model, **kw)
        model_name = args.model
        n_imgs = 3 if args.model == "memfof" else 2
    frames_dir = args.frames
    if args.video:
        frames_dir = os.path.join(args.out, "_frames")
        extract_frames_from_video(args.video, frames_dir, max_frames=args.max_frames)
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"{model_name}_flow.mp4")
    if n_imgs == 3:
        from monocular_depth_estimation_trt_tpu.apps.streaming import (
            run_flow_triplets,
        )

        run_flow_triplets(pipe, frames_dir, out_path,
                          max_triplets=args.max_frames or None)
    else:
        run_flow_frames(pipe, frames_dir, out_path,
                        max_pairs=args.max_frames or None)
    return 0


def cmd_video(args) -> int:
    """Depth over a video file -> colorized MP4 (reference
    ``Depth_Pro/onnx2trt_video.py``)."""
    from monocular_depth_estimation_trt_tpu.apps.streaming import run_video
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    if getattr(args, "engine", ""):
        pipe = _load_artifact(args.engine, surface="video", need_viz=True,
                              allow_stream_viz=True)
        if pipe is None:
            return 2
        log(f"video from artifact: {pipe.describe()}")
    else:
        if not args.model:
            log("video: give a model name (or --engine artifact)",
                tag="ERROR")
            return 2
        kw = {"encoder": args.encoder} if args.encoder else {}
        if getattr(args, "precision", ""):
            kw["precision"] = args.precision
        ci = _calib_images_from(args)
        if ci is not None:
            kw["calib_images"] = ci
        pipe = build_pipeline(args.model, **kw)
    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.video))[0]
    out_path = os.path.join(args.out, f"{stem}_{pipe.spec.artifact_name()}.mp4")
    if hasattr(pipe, "video_depth"):
        # windowed batch models (Video Depth Anything): whole-video protocol
        # with globally consistent normalization (upstream run.py)
        from monocular_depth_estimation_trt_tpu.apps.streaming import (
            write_depth_video,
        )

        write_depth_video(pipe, args.video, out_path,
                          max_frames=args.max_frames or None)
    else:
        run_video(pipe, args.video, out_path, max_frames=args.max_frames or None)
    return 0


def cmd_track(args) -> int:
    """Online point tracking over a video -> tracked-points MP4 (reference
    ``later/CoTracker3/infer.py``)."""
    import cv2

    from monocular_depth_estimation_trt_tpu.apps.tracking import visualize_tracks
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    pipe = build_pipeline(args.model, grid_size=args.grid)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise FileNotFoundError(f"[MDET] cannot open video: {args.video}")
    frames = []
    while True:
        ok, f = cap.read()
        if not ok or (args.max_frames and len(frames) >= args.max_frames):
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"[MDET] no frames decoded from {args.video}")
    video = np.stack(frames)
    tracks, vis = pipe.track_video(video)
    # tracks are at the model resolution; rescale to the source video
    ih, iw = pipe.spec.input_hw
    scale = np.asarray([video.shape[2] / iw, video.shape[1] / ih], np.float32)
    tracks = tracks * scale
    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.video))[0]
    out_path = os.path.join(
        args.out, f"{stem}_{pipe.spec.artifact_name()}.mp4"
    )
    visualize_tracks(video, tracks, vis, out_path)
    return 0


def cmd_pair(args) -> int:
    """Two-image 3D reconstruction -> depth JPG + colored point-cloud PLY +
    relative-pose JSON (reference ``later/Align3R/README.md`` contract:
    "two 2d images -> depth, point cloud, Camera pose")."""
    import json

    import cv2

    from monocular_depth_estimation_trt_tpu.apps.ply import write_ply
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    img1 = _load_image(args.image1)
    img2 = _load_image(args.image2)
    if getattr(args, "engine", ""):
        pipe = _load_artifact(args.engine, surface="pair",
                              need_images=(2,))
        if pipe is None:
            return 2
        log(f"pair from artifact: {pipe.describe()}")
        img1, img2 = pipe.fit(img1), pipe.fit(img2)
    else:
        pipe = build_pipeline(args.model)
    out = pipe(img1, img2)

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.image1))[0]
    name = pipe.spec.artifact_name()

    depth = np.asarray(out["depth"])
    log(f"max : {depth.max():.5f} , min : {depth.min():.5f}")
    norm = ((depth - depth.min()) / max(depth.max() - depth.min(), 1e-6)
            * 255).astype(np.uint8)
    jpg = os.path.join(args.out, f"{stem}_{name}.jpg")
    cv2.imwrite(jpg, cv2.applyColorMap(norm, cv2.COLORMAP_INFERNO))
    log(f"wrote {jpg}")

    ih = depth.shape[0]
    c1 = cv2.resize(img1, (ih, ih)).reshape(-1, 3)
    c2 = cv2.resize(img2, (ih, ih)).reshape(-1, 3)
    pts = np.concatenate([np.asarray(out["pts1"]).reshape(-1, 3),
                          np.asarray(out["pts2"]).reshape(-1, 3)])
    ply = os.path.join(args.out, f"{stem}_{name}.ply")
    write_ply(ply, pts, np.concatenate([c1, c2]))
    log(f"wrote {ply}")

    pose = os.path.join(args.out, f"{stem}_{name}_pose.json")
    with open(pose, "w") as f:
        json.dump({"rotation": np.asarray(out["rotation"]).tolist(),
                   "translation": np.asarray(out["translation"]).tolist()},
                  f, indent=2)
    log(f"wrote {pose}")
    return 0


def cmd_webcam(args) -> int:
    """Live depth viewer (reference ``Depth_Pro/onnx2trt_webcam.py``; accepts
    an IP-camera URL)."""
    from monocular_depth_estimation_trt_tpu.apps.streaming import run_webcam
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    if getattr(args, "engine", ""):
        pipe = _load_artifact(args.engine, surface="webcam", need_viz=True)
        if pipe is None:
            return 2
        log(f"webcam from artifact: {pipe.describe()}")
    else:
        if not args.model:
            log("webcam: give a model name (or --engine artifact)",
                tag="ERROR")
            return 2
        kw = {"encoder": args.encoder} if args.encoder else {}
        if getattr(args, "precision", ""):
            kw["precision"] = args.precision
        ci = _calib_images_from(args)
        if ci is not None:
            kw["calib_images"] = ci
        pipe = build_pipeline(args.model, **kw)
    camera = args.camera
    if camera.isdigit():
        camera = int(camera)
    run_webcam(pipe, camera)
    return 0


def cmd_build(args) -> int:
    """Pre-build (AOT compile) an engine for a model config — the reference's
    explicit engine-build step (``onnx2trt.py`` run once to produce the
    ``.engine``), minus the multi-minute builds on a warm cache."""
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    kw = {"encoder": args.encoder} if args.encoder else {}
    if args.metric:
        kw["metric"] = True
    pipe = build_pipeline(args.model, **kw)
    eng = pipe.engine_for((args.size, args.size), args.viz)
    eng.compile()
    log(f"engine ready: {eng.name} (build {eng.build_seconds:.2f}s)")
    fl = eng.flops()
    if fl:
        log(f"program FLOPs: {fl / 1e9:.2f} G")
    return 0


def cmd_export(args) -> int:
    """Write a serialized, shippable engine artifact (.mdeteng): the fused
    pre+model+post program with weights baked in as constants — the TPU
    analogue of the reference writing the TRT plan to disk
    (``Depth_Anything_V2/onnx2trt.py:60-68``), but platform-portable
    StableHLO instead of a GPU-specific binary. Consume with
    ``mdet run --engine file`` (no model zoo / checkpoints needed)."""
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.export import (
        export_pipeline,
    )

    kw = {}
    if args.encoder:
        kw["encoder"] = args.encoder
    if args.metric:
        kw["metric"] = True
        kw["dataset"] = args.dataset
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    if getattr(args, "precision", ""):
        kw["precision"] = args.precision
    ci = _calib_images_from(args)
    if ci is not None:
        kw["calib_images"] = ci
    pipe = build_pipeline(args.model, **kw)
    platforms = tuple(
        p.strip() for p in args.platforms.split(",") if p.strip()
    )
    if args.serve_bundle:
        # everything `mdet serve --engine` needs: power-of-two buckets up
        # to --serve-bundle, each in BOTH colormap variants
        batches, b = [], 1
        while b <= args.serve_bundle:
            batches.append(b)
            b *= 2
        with_viz = "both"
    else:
        batches = [int(x) for x in args.batches.split(",") if x.strip()]
        with_viz = args.viz
    views = [int(x) for x in args.views.split(",") if x.strip()]
    path = export_pipeline(
        pipe,
        (args.size, args.size),
        with_viz=with_viz,
        batches=batches,
        views=views,
        stream_window=args.stream_window,
        path=args.out or None,
        platforms=platforms,
    )
    print(path)
    return 0


def cmd_views(args) -> int:
    """Multi-view 3D reconstruction: N images through ONE S-view VGGT
    program -> per-view depth npz + merged world-space point cloud. The S
    axis is this framework's extension over the reference's S=1 export
    (``VGGT/onnx_export.py:63``)."""
    import cv2

    from monocular_depth_estimation_trt_tpu.apps.vggt_3d import (
        export_multi_view_points,
    )
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    size = args.resize or 518
    imgs = [cv2.resize(_load_image(p), (size, size)) for p in args.images]
    if getattr(args, "engine", ""):
        pipe = _load_artifact(args.engine, surface="views",
                              need_views=len(imgs))
        if pipe is None:
            return 2
        log(f"views from artifact: {pipe.describe()}")
    else:
        if not args.model:
            log("views: give a model name (or --engine artifact)",
                tag="ERROR")
            return 2
        kw = (
            {"precision": args.precision}
            if getattr(args, "precision", "") else {}
        )
        ci = _calib_images_from(args)
        if ci is not None:
            kw["calib_images"] = ci
        pipe = build_pipeline(args.model, **kw)
        pipe = _apply_device_mesh(pipe, getattr(args, "device_mesh", ""))
        if not hasattr(pipe, "multi_view"):
            log(f"{args.model} has no multi-view protocol", tag="ERROR")
            return 2
    out = pipe.multi_view(np.stack(imgs))

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.images[0]))[0]
    name = pipe.spec.artifact_name()
    npz = os.path.join(args.out, f"{stem}_{name}_s{len(imgs)}.npz")
    np.savez_compressed(npz, depth=out["depth"],
                        depth_conf=out["depth_conf"],
                        pose_enc=out.get("pose_enc"))
    log(f"wrote {npz}")
    if "pose_enc" in out:
        ply = os.path.join(args.out, f"{stem}_{name}_s{len(imgs)}.ply")
        export_multi_view_points(out, imgs, ply,
                                 input_size=pipe.spec.input_hw[0])
    return 0


def _load_clip(args) -> list:
    """Frames for the SLAM recipes: ``--video`` (with ``--stride`` /
    ``--max-frames``) or a ``--frames`` directory of images."""
    import cv2

    frames = []
    if args.video:
        cap = cv2.VideoCapture(args.video)
        if not cap.isOpened():
            raise FileNotFoundError(f"[MDET] cannot open video: {args.video}")
        n = 0
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            if n % max(args.stride, 1) == 0:
                frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
                if args.max_frames and len(frames) >= args.max_frames:
                    break
            n += 1
        cap.release()
    else:
        names = sorted(os.listdir(args.frames))
        for nm in names[:: max(args.stride, 1)]:
            p = os.path.join(args.frames, nm)
            if os.path.splitext(nm)[1].lower() in (".jpg", ".jpeg", ".png"):
                frames.append(_load_image(p))
                if args.max_frames and len(frames) >= args.max_frames:
                    break
    if len(frames) < 2:
        raise ValueError(f"[MDET] need >=2 frames, got {len(frames)}")
    return frames


def cmd_slam(args) -> int:
    """Video SLAM recipes — the reference's three README-only staging dirs
    (``later/MegaSaM/README.md``, ``later/VIPE/README.md``,
    ``later/WildGS-SLAM/README.md``) as runnable compositions of the zoo's
    own engines. Writes poses + refined focal + aligned keyframe disparity
    (and, with ``--cvd``, per-frame consistent video depth)."""
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    frames = _load_clip(args)
    pipe = build_pipeline(args.model)
    if not hasattr(pipe, "run"):
        log(f"{args.model} is not a SLAM recipe", tag="ERROR")
        return 2
    res = pipe.run(frames, focal=args.focal or None)

    os.makedirs(args.out, exist_ok=True)
    src = args.video or args.frames
    stem = os.path.splitext(os.path.basename(os.path.normpath(src)))[0]
    name = pipe.spec.artifact_name()
    payload = {
        "poses": res.poses,
        "keyframes": np.asarray(res.keyframe_indices, np.int32),
        "focal_px": np.float32(res.focal),
        "rms_px": np.float32(res.rms_px),
        "keyframe_disparity": np.stack(res.keyframe_disparity),
    }
    if "metric_scale" in res.extras:
        payload["metric_scale"] = np.float32(res.extras["metric_scale"])
    if "rendered_depth" in res.extras:
        payload["rendered_depth"] = np.stack(res.extras["rendered_depth"])
    npz = os.path.join(args.out, f"{stem}_{name}.npz")
    np.savez_compressed(npz, **payload)
    log(f"wrote {npz} (K={len(res.keyframe_indices)}, "
        f"rms {res.rms_px:.2f} px, focal {res.focal:.1f} px)")

    if args.cvd:
        cvd = pipe.consistent_video_depth(frames, res)
        cvd_npz = os.path.join(args.out, f"{stem}_{name}_cvd.npz")
        np.savez_compressed(cvd_npz, disparity=np.stack(cvd))
        log(f"wrote {cvd_npz} ({len(cvd)} frames)")
    return 0


def cmd_serve(args) -> int:
    """HTTP model serving (``apps/server.py``): compiled engine(s) behind
    ONE device-worker thread and a bounded queue; repeated ``--engine``
    flags host several models in one server (POST /v1/models/<name>/depth).
    Beyond the reference's local viewers — its closest surface is the
    webcam app (``Depth_Pro/onnx2trt_webcam.py``)."""
    from monocular_depth_estimation_trt_tpu.apps.server import serve
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    engines = getattr(args, "engine", None) or []
    if isinstance(engines, str):  # tolerate a plain string (Python API use)
        engines = [engines]
    if engines:
        # serve straight from serialized artifacts: the deployment box
        # needs the .mdeteng files only (export with --serve-bundle so the
        # batch buckets + viz variants exist; weights are stored once).
        # Several --engine flags host several models behind ONE server /
        # ONE device-worker thread (POST /v1/models/<name>/depth).
        if getattr(args, "device_mesh", ""):
            log("serve --engine: shardings are baked into the artifact at "
                "export time; --device-mesh ignored", tag="WARN")
        loaded = []
        for p in engines:
            eng = _load_artifact(p, surface="serve", need_images=(1,))
            if eng is None:  # e.g. a 2-image flow artifact
                return 2
            loaded.append(eng)
        fams = [p.spec.model for p in loaded]
        pipes = {}
        for p, fam in zip(loaded, fams):
            # route by family name when unique, full artifact name otherwise
            # (e.g. serving vits AND vitl of one family)
            key = fam if fams.count(fam) == 1 else p.spec.artifact_name()
            if key in pipes:
                log(f"serve: duplicate model {key!r} (same config exported "
                    f"twice?)", tag="ERROR")
                return 2
            pipes[key] = p
            log(f"serving from artifact: {p.describe()}")
        mb = args.max_batch
        largest_top = max(max(p.batches) for p in loaded)
        if mb > largest_top:
            log(f"--max-batch {mb} exceeds every artifact's largest "
                f"exported bucket ({largest_top}); clamping", tag="WARN")
            mb = largest_top
        # models whose artifact exports smaller buckets are capped
        # individually by the server (DepthServer.max_batch_by); a
        # single-entry dict behaves identically to passing the pipeline
        serve(pipes, host=args.host, port=args.port,
              max_queue=args.max_queue,
              max_batch=mb, batch_window_ms=args.batch_window_ms)
        return 0

    if not args.model:
        log("serve: give a model name (or --engine artifact)", tag="ERROR")
        return 2

    kw = {"encoder": args.encoder} if args.encoder else {}
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    if getattr(args, "precision", ""):
        kw["precision"] = args.precision
    ci = _calib_images_from(args)
    if ci is not None:
        kw["calib_images"] = ci
    pipe = build_pipeline(args.model, **kw)
    pipe = _apply_device_mesh(pipe, getattr(args, "device_mesh", ""))
    hw = (args.size, args.size) if args.size else None
    serve(pipe, host=args.host, port=args.port, input_hw=hw,
          max_queue=args.max_queue, max_batch=args.max_batch,
          batch_window_ms=args.batch_window_ms)
    return 0


def cmd_distill(args) -> int:
    """Teacher→student depth distillation on an image directory.

    Beyond the reference (inference-only): a frozen teacher pipeline
    generates disparity pseudo-labels and a student of the same family
    fine-tunes against them with the SSI + gradient-matching objective
    (``training/``). The trained student params are saved as an orbax tree;
    ``--promote`` additionally installs them in the weights cache under the
    student's artifact name so ``mdet run`` serves them directly."""
    import cv2
    import jax
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.training import (
        distill,
        save_train_state,
    )
    from monocular_depth_estimation_trt_tpu.utils.files import list_images
    from monocular_depth_estimation_trt_tpu.weights.store import save_params

    if args.steps < 1:
        log("--steps must be >= 1", tag="ERROR")
        return 1
    size = args.size - args.size % 14  # ViT patch grid
    paths = list_images(args.images_dir)
    if len(paths) < args.batch:
        log(f"need at least --batch={args.batch} images in "
            f"{args.images_dir}; found {len(paths)}", tag="ERROR")
        return 1
    if len(paths) > args.max_images:
        # frames + fp32 teacher labels are held in RAM for the run; cap it
        log(f"capping at --max-images={args.max_images} of {len(paths)} "
            f"images (raise the flag to use more)", tag="WARN")
        paths = paths[: args.max_images]
    tail = len(paths) % args.batch
    if tail:
        log(f"dropping {tail} tail image(s) that don't fill a "
            f"--batch={args.batch} chunk (static shapes, one engine)")
    frames = []
    for p in paths:
        img = _load_image(p)
        frames.append(cv2.resize(img, (size, size)))
    frames = np.stack(frames)
    log(f"distilling from {len(frames) - tail} images @ {size}x{size}")

    teacher = build_pipeline(args.teacher,
                             **({"encoder": args.teacher_encoder}
                                if args.teacher_encoder else {}))

    def teacher_fn(imgs_u8):
        return teacher.batch_call(np.asarray(imgs_u8))["depth"]

    # Student starts from its served (converted) params of the same family.
    # attn_impl is pinned to XLA for the training graph: the Pallas flash
    # kernel has no custom_vjp, so value_and_grad through it would fail for
    # the head/sequence shapes "auto" routes to flash on TPU.
    student_pipe = build_pipeline(args.student, encoder=args.student_encoder)
    # --qat: fake-quant (STE) training so the promoted weights serve well
    # at precision="int8" (ops/quant.py QuantDense mode "qat"); the param
    # tree is unchanged, so promotion and int8 calibration work as-is
    student_model = DepthAnythingV2(
        encoder=args.student_encoder, dtype=jnp.float32, attn_impl="xla",
        quant="qat" if getattr(args, "qat", False) else "none",
    )

    def student_apply(params, imgs_u8):
        x = to_float_rgb(imgs_u8)
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        depth = student_model.apply({"params": params}, x)
        # clamp=None: the serving clamp's zero gradient outside (1e-3, 1e3)
        # would freeze sky/far pixels during training
        return upsample_depth(depth, (size, size), clamp=None)

    def batches():
        for i in range(0, len(frames), args.batch):
            chunk = frames[i : i + args.batch]
            if len(chunk) == args.batch:  # static shapes for one engine
                yield chunk

    state, history = distill(
        teacher_fn,
        student_apply,
        student_pipe.params,
        batches(),
        steps=args.steps,
        learning_rate=args.lr,
        accum_steps=args.accum_steps,
    )
    log(f"distillation done: loss {history[0]:.4f} -> {history[-1]:.4f}")

    os.makedirs(args.out, exist_ok=True)
    ckpt = os.path.join(os.path.abspath(args.out),
                        f"distill_{args.student}_{args.student_encoder}")
    save_train_state(ckpt, state)
    if args.promote:
        import shutil

        from monocular_depth_estimation_trt_tpu.weights.store import _params_dir

        name = student_pipe.spec.artifact_name()
        existing = _params_dir(name)
        if os.path.isdir(existing):
            # never clobber the converted pretrained cache irreversibly
            bak = existing + ".pre-distill-bak"
            if os.path.isdir(bak):
                shutil.rmtree(bak)
            shutil.move(existing, bak)
            log(f"previous params cached at {bak} (move it back to undo "
                f"the promotion)")
        save_params(name, jax.device_get(state.params))
        log(f"promoted distilled params into the weights cache as {name!r}; "
            f"`mdet run --model {args.student} --encoder "
            f"{args.student_encoder}` now serves them")
    return 0


def cmd_quantcheck(args) -> int:
    """One-command int8 accuracy gate: build the SAME config at bf16 and
    int8 (shared converted params), run both on the given images, and print
    ONE JSON line with the int8-vs-bf16 metric suite (δ1/AbsRel/corr).
    Replaces the reference's eyeball max/min protocol for precision
    decisions the reference couldn't even make (fp16-only engines)."""
    import json

    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.training.metrics import (
        depth_metrics,
    )
    from monocular_depth_estimation_trt_tpu.utils.files import list_images

    if args.images:
        paths = list_images(args.images)[: args.max_images]
    else:
        paths = [os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "example.jpg")]
    if not paths:
        log(f"quantcheck: no images under {args.images}", tag="ERROR")
        return 1

    kw = {"encoder": args.encoder} if args.encoder else {}
    if args.checkpoint:
        kw["checkpoint"] = args.checkpoint
    pipe_f = build_pipeline(args.model, precision="bf16", **kw)
    kw_q = dict(kw)
    ci = _calib_images_from(args)
    if ci is not None:
        kw_q["calib_images"] = ci
    pipe_q = build_pipeline(args.model, precision="int8", **kw_q)

    sums, n = {}, 0
    corr = []
    for p in paths:
        img = _load_image(p)
        df = np.asarray(pipe_f(img)["depth"], np.float32)
        dq = np.asarray(pipe_q(img)["depth"], np.float32)
        m = depth_metrics(jnp.asarray(dq)[None], jnp.asarray(df)[None],
                          align="none")
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        corr.append(float(np.corrcoef(dq.ravel(), df.ravel())[0, 1]))
        n += 1

    report = {
        "metric": f"{pipe_q.spec.artifact_name()}_vs_bf16",
        "images": n,
        "corr": round(float(np.mean(corr)), 5),
        **{k: round(v / n, 5) for k, v in sums.items()},
    }
    print(json.dumps(report))
    # δ1 > 0.95 is the same gate tests/test_quant.py holds the tiny configs
    # to; exit nonzero so CI/deploy scripts can gate on it directly
    return 0 if report.get("delta1", 0.0) > args.min_delta1 else 3


def cmd_eval(args) -> int:
    """Evaluate predictions against ground truth with the standard metric
    suites (``training/metrics.py``): AbsRel/RMSE/SiLog/δ-thresholds for
    depth (optionally affine- or median-aligned — the relative-depth
    protocols), EPE/n-px for flow. Replaces the reference's eyeball
    ``[MDET] max/min`` validation with numbers."""
    import json

    import jax
    import numpy as np

    # Host-side arithmetic only — keep it off the remote TPU tunnel, where
    # eager (non-jit) ops cost seconds each (CLAUDE.md; same policy as
    # cmd_convert).
    jax.config.update("jax_platforms", "cpu")

    exts = (".npz", ".npy", ".png", ".pgm", ".tif", ".tiff")

    def load_many(path, key, scale=0.0):
        if os.path.isdir(path):
            files = sorted(
                f for f in os.listdir(path) if f.lower().endswith(exts)
            )
            return {os.path.splitext(f)[0]:
                    _load_arr(os.path.join(path, f), key, scale)
                    for f in files}
        return {os.path.splitext(os.path.basename(path))[0]:
                _load_arr(path, key, scale)}

    def _load_arr(p, key, scale=0.0):
        if p.endswith(".npy"):
            arr = np.load(p)
            scale = 0.0  # .npy/.npz GT is already metric; scale is image-only
        elif p.endswith(".npz"):
            z = np.load(p)
            arr = z[key] if key in z else z[list(z.files)[0]]
            scale = 0.0
        else:
            # dataset ground truth commonly ships as 16-bit PNG/TIFF
            # (KITTI: uint16 = meters*256; 0 = no reading). --gt-scale
            # overrides; the uint16 default follows the KITTI convention.
            import cv2

            arr = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            if arr is None:
                raise IOError(f"unreadable depth image {p}")
            if arr.ndim == 3:
                arr = arr[..., 0]
            if arr.dtype == np.uint16 and scale == 0.0:
                scale = 256.0
        arr = np.squeeze(np.asarray(arr)).astype(np.float32)
        return arr / scale if scale else arr

    preds = load_many(args.pred, args.key)
    gts = load_many(args.gt, args.key, scale=args.gt_scale)
    if len(preds) == 1 and len(gts) == 1:
        pairs = [(next(iter(preds.values())), next(iter(gts.values())))]
    else:
        common = sorted(set(preds) & set(gts))
        if not common:
            log("no matching prediction/ground-truth stems", tag="ERROR")
            return 1
        pairs = [(preds[k], gts[k]) for k in common]

    from monocular_depth_estimation_trt_tpu.training.metrics import (
        depth_metrics,
        flow_metrics,
    )

    sums: dict = {}
    for pred, gt in pairs:
        pred, gt = np.asarray(pred), np.asarray(gt)
        if not args.flow and pred.shape != gt.shape and pred.ndim == 2:
            # score at GT resolution (the benchmark protocol): nearest-
            # neighbor so no depth values are invented at boundaries
            yi = np.minimum((np.arange(gt.shape[0]) + 0.5)
                            * pred.shape[0] // gt.shape[0],
                            pred.shape[0] - 1).astype(np.int64)
            xi = np.minimum((np.arange(gt.shape[1]) + 0.5)
                            * pred.shape[1] // gt.shape[1],
                            pred.shape[1] - 1).astype(np.int64)
            pred = pred[yi][:, xi]
        if pred.ndim == 2:
            pred, gt = pred[None], gt[None]
        if args.flow:
            m = flow_metrics(pred, gt)
        else:
            # Eigen-protocol valid range: gt>0 is always enforced by
            # depth_metrics; the caps bound the scored range (KITTI: 80 m)
            mask = None
            if args.min_depth > 0 or args.max_depth > 0:
                mask = np.isfinite(gt) & (gt > args.min_depth)
                if args.max_depth > 0:
                    mask &= gt <= args.max_depth
                mask = mask.astype(np.float32)
            m = depth_metrics(pred, gt, mask, align=args.align)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    out = {k: round(v / len(pairs), 5) for k, v in sums.items()}
    out["n_images"] = len(pairs)
    out["align"] = args.align if not args.flow else None
    print(json.dumps(out))
    return 0


def cmd_convert(args) -> int:
    """Convert (and audit) a torch checkpoint without running the model.

    ``--report`` prints the consumed/unconsumed key audit and skips caching —
    the dry-run for checking an upstream checkpoint's layout against our
    converter before trusting it (reference checkpoints: hub files per
    ``Depth_Anything_V2/README.md:22-36``)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side work

    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        UnconsumedKeysError,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        MissingCheckpointError,
        resolve_checkpoint,
    )

    if args.report:
        # audit only: run the conversion under tracking, print the report,
        # write nothing
        os.environ["MDET_CONVERT_REPORT_ONLY"] = "1"
    kw = {"encoder": args.encoder} if args.encoder else {}
    try:
        path = resolve_checkpoint(args.checkpoint)
        log(f"checkpoint resolves to {path}")
        if getattr(args, "verify_manifest", False):
            from monocular_depth_estimation_trt_tpu.weights.convert import (
                load_torch_state_dict,
            )
            from monocular_depth_estimation_trt_tpu.weights.manifest import (
                format_report,
                load_manifest,
                manifest_key,
                verify_state_dict,
            )

            key = manifest_key(args.model, args.encoder)
            manifest = load_manifest(key) or load_manifest(
                manifest_key(args.model))
            if manifest is None:
                log(f"no manifest for '{key}' (weights/manifests/); "
                    "regenerate with scripts/gen_manifests.py", tag="ERROR")
                return 2
            rep = verify_state_dict(load_torch_state_dict(path), manifest)
            log("\n" + format_report(rep))
            if not rep["ok"]:
                return 2
        build_pipeline(args.model, checkpoint=args.checkpoint, **kw)
    except UnconsumedKeysError as e:
        log(str(e), tag="ERROR")
        return 1
    except MissingCheckpointError as e:
        # exit 3 = "checkpoint unavailable" (offline / not mirrored) —
        # distinct from a layout mismatch so scripts/validate_real_ckpts.sh
        # can skip instead of fail
        log(str(e), tag="ERROR")
        return 3
    finally:
        os.environ.pop("MDET_CONVERT_REPORT_ONLY", None)
    log("conversion OK")
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnostic: what backend/caches/native pieces this
    install will actually use. The reference's equivalent is scattered
    prints (`trt.__version__`, device queries); here it is one command —
    and on a flaky remote-TPU link the `--no-devices` mode answers
    everything that does not require touching the device."""
    import jax

    from monocular_depth_estimation_trt_tpu.config import cache_dir
    from monocular_depth_estimation_trt_tpu.runtime import native
    from monocular_depth_estimation_trt_tpu.runtime.engine import (
        EngineRegistry,
    )
    from monocular_depth_estimation_trt_tpu.runtime.export import (
        exported_dir,
    )

    print(f"jax                : {jax.__version__}")
    cc = os.environ.get("JAX_COMPILATION_CACHE_DIR", "") or (
        "(UNSET — first compiles will not persist; "
        "export JAX_COMPILATION_CACHE_DIR)")
    print(f"compilation cache  : {cc}")
    root = cache_dir()
    print(f"mdet cache dir     : {root}")
    reg = EngineRegistry()
    print(f"built engines      : {len(reg.list())} registry entries")
    arts = [f for f in os.listdir(exported_dir()) if f.endswith(".mdeteng")]
    print(f"exported artifacts : {len(arts)}")
    import glob

    orbax = glob.glob(os.path.join(root, "params", "*"))
    print(f"cached weights     : {len(orbax)} artifact trees")
    nat = ("available" if native.native_available()
           else "not built (python decode fallback)")
    print(f"native host-IO     : {nat}")
    if getattr(args, "no_devices", False):
        print("devices            : skipped (--no-devices)")
        return 0
    # Device enumeration can HANG on a broken tunnel — do it LAST so
    # everything above always prints.
    print("devices            : querying (can hang if the accelerator "
          "link is down; ctrl-c or use --no-devices) ...")
    devs = jax.devices()
    print(f"devices            : {len(devs)} x {devs[0].platform} "
          f"(backend {jax.default_backend()}, "
          f"device_kind {getattr(devs[0], 'device_kind', '?')})")
    return 0


def cmd_models(_args) -> int:
    from monocular_depth_estimation_trt_tpu.registry import (
        INT8_FAMILIES,
        get_fidelity,
        list_models,
    )

    for name in list_models():
        tags = [get_fidelity(name)]
        if name in INT8_FAMILIES:
            tags.append("int8")
        print(f"{name}  [{', '.join(tags)}]")
    return 0


def cmd_engines(_args) -> int:
    from monocular_depth_estimation_trt_tpu.runtime.engine import EngineRegistry

    reg = EngineRegistry()
    for name in reg.list():
        entry = reg.load(name) or {}
        bt = entry.get("build_seconds")
        print(f"{name}  build={bt:.2f}s" if bt else name)

    from monocular_depth_estimation_trt_tpu.runtime.export import (
        exported_dir,
    )

    d = exported_dir()
    arts = sorted(f for f in os.listdir(d) if f.endswith(".mdeteng"))
    if arts:
        print("-- serialized artifacts (mdet export) --")
        for f in arts:
            sz = os.path.getsize(os.path.join(d, f)) / 1e6
            print(f"{f}  {sz:.2f} MB")
    return 0


def _add_precision_args(p, calib: bool = True) -> None:
    """Shared --precision/--calib-dir flags (one definition, no per-
    subcommand drift)."""
    p.add_argument("--precision", default="",
                   choices=["", "bf16", "fp16", "fp32", "int8"],
                   help="compute precision; int8 = statically-calibrated "
                   "w8a8 serving (ViT-backbone families, docs/QUANT.md)")
    if calib:
        p.add_argument("--calib-dir", default="", dest="calib_dir",
                       help="directory of domain images for int8 "
                       "activation-scale calibration")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mdet", description=__doc__)
    p.add_argument(
        "--allow-random-weights",
        action="store_true",
        help="permit deterministic random weights when no checkpoint is "
        "available (benchmark-only; outputs are not meaningful)",
    )
    p.add_argument(
        "--device",
        default=os.environ.get("MDET_DEVICE", "auto"),
        choices=("auto", "cpu", "tpu", "axon"),
        help="force the jax platform (default: env MDET_DEVICE or auto). "
        "Use --device cpu to run/serve without an accelerator — the "
        "axon TPU plugin ignores the JAX_PLATFORMS env var, so this flag "
        "is the only reliable CPU override. --device tpu picks the local "
        "chip if present, else the axon tunnel",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="single-image inference")
    run.add_argument("model", nargs="?", default="")
    run.add_argument("--encoder", default="")
    run.add_argument("--image", default="data/example.jpg")
    run.add_argument("--out", default="results")
    run.add_argument("--resize", type=int, default=0,
                     help="pre-resize the raw image to a square (reference onnx2trt.py:146)")
    run.add_argument("--metric", action="store_true")
    run.add_argument("--dataset", default="hypersim")
    run.add_argument("--checkpoint", default="")
    run.add_argument("--engine", default="",
                     help="serve from a serialized .mdeteng artifact "
                     "(see `mdet export`) instead of building the model")
    _add_precision_args(run)
    run.add_argument("--pointcloud", action="store_true")
    run.add_argument("--focal", type=float, default=470.4,
                     help="focal for unprojection (reference onnx2trt_pointcloud.py)")
    run.add_argument("--mesh-format", default="ply", choices=["ply", "glb"],
                     help="point-cloud container (MoGe-2 exports .glb too)")
    run.add_argument("--mesh", action="store_true",
                     help="triangulated image-grid mesh instead of points "
                     "(models with a point map + mask, e.g. moge2)")
    run.add_argument("--colorbar", action="store_true",
                     help="also save the colorbar-in-meters figure "
                     "(reference onnx2trt.py:249-262)")
    run.add_argument("--benchmark", action="store_true")
    run.add_argument("--compare", default="",
                     help="compare the depth against a stored .npz and fail "
                     "on drift (regression form of the reference's max/min "
                     "eyeball protocol)")
    run.add_argument("--compare-tol", type=float, default=1e-2,
                     help="max relative error allowed with --compare")
    run.set_defaults(fn=cmd_run)

    batch = sub.add_parser(
        "batch", help="batched offline serving over an image dir or video")
    batch.add_argument("model", nargs="?", default="")
    batch.add_argument("--engine", default="",
                       help="serve from a serialized .mdeteng artifact "
                       "(export with a matching --batches bucket)")
    batch.add_argument("--encoder", default="")
    batch.add_argument("--images-dir", default="")
    batch.add_argument("--video", default="")
    batch.add_argument("--batch", type=int, default=8)
    batch.add_argument("--out", default="results")
    batch.add_argument("--max-frames", type=int, default=0)
    batch.add_argument("--checkpoint", default="")
    _add_precision_args(batch)
    batch.add_argument("--save", action="store_true",
                       help="write per-image npz+jpg (default: throughput "
                       "benchmark mode, outputs discarded)")
    batch.add_argument("--decode-threads", type=int, default=4)
    batch.set_defaults(fn=cmd_batch)

    bench = sub.add_parser("bench", help="benchmark a model config")
    bench.add_argument("model", nargs="?", default="")
    bench.add_argument("--engine", default="",
                       help="benchmark a serialized .mdeteng artifact "
                       "(same pipelined-dispatch protocol)")
    bench.add_argument("--encoder", default="")
    _add_precision_args(bench)
    bench.add_argument("--size", type=int, default=0,
                       help="square input size (default 518; --engine "
                       "artifacts are fixed at their exported size)")
    bench.add_argument("--warmup", type=int, default=10)
    bench.add_argument("--iterations", type=int, default=100)
    bench.add_argument("--views", type=int, default=0,
                       help="multi-view S axis (VGGT-family): benchmark the "
                       "S-view joint program, per-frame FPS")
    bench.add_argument("--trace", default="",
                       help="also capture a jax.profiler device trace of "
                       "the timed loop into this directory (open with "
                       "TensorBoard/Perfetto) — the TRT DETAILED-"
                       "profiling-verbosity equivalent")
    bench.set_defaults(fn=cmd_bench)

    for sp in (run, bench):
        sp.add_argument("--device-mesh", default="", dest="device_mesh",
                        help="shard params over a DxM (data x model) device "
                        "mesh, e.g. 2x4; 1x1/absent = single chip "
                        "(parallel/sharding.py tensor-parallel rules)")

    flow = sub.add_parser("flow", help="optical flow over frames/video")
    flow.add_argument("model", nargs="?", default="",
                      choices=["raft", "neuflow", "meflow", "memfof", "waft",
                               ""])
    flow.add_argument("--engine", default="",
                      help="serve from a serialized .mdeteng artifact "
                      "(export a flow model with --viz)")
    flow.add_argument("--frames", default="video_frames")
    flow.add_argument("--video", default="")
    flow.add_argument("--out", default="results")
    flow.add_argument("--iters", type=int, default=0)
    flow.add_argument("--max-frames", type=int, default=0)
    flow.set_defaults(fn=cmd_flow)

    video = sub.add_parser("video", help="depth over a video file")
    video.add_argument("model", nargs="?", default="")
    video.add_argument("--engine", default="",
                       help="serve from a serialized .mdeteng artifact "
                       "(needs a viz module: export with --viz)")
    video.add_argument("--encoder", default="")
    video.add_argument("--video", required=True)
    video.add_argument("--out", default="results")
    video.add_argument("--max-frames", type=int, default=0)
    _add_precision_args(video)
    video.set_defaults(fn=cmd_video)

    track = sub.add_parser("track", help="online point tracking over a video")
    track.add_argument("model", nargs="?", default="cotracker3")
    track.add_argument("--video", required=True)
    track.add_argument("--grid", type=int, default=10,
                       help="grid_size (reference later/CoTracker3/infer.py:23)")
    track.add_argument("--out", default="results")
    track.add_argument("--max-frames", type=int, default=0)
    track.set_defaults(fn=cmd_track)

    views = sub.add_parser(
        "views", help="multi-view 3D reconstruction (S-view VGGT program)")
    views.add_argument("model", nargs="?", default="vggt")
    views.add_argument("--engine", default="",
                       help="serve from a serialized .mdeteng artifact "
                       "(export with --views S)")
    views.add_argument("--images", nargs="+", required=True)
    views.add_argument("--out", default="results")
    views.add_argument("--resize", type=int, default=0,
                       help="square side for every view (default 518)")
    views.add_argument("--device-mesh", default="", dest="device_mesh")
    _add_precision_args(views)
    views.set_defaults(fn=cmd_views)

    pair = sub.add_parser("pair",
                          help="two-image 3D reconstruction (depth + "
                               "pointcloud + relative pose)")
    pair.add_argument("model", nargs="?", default="align3r")
    pair.add_argument("--engine", default="",
                      help="serve from a serialized .mdeteng artifact "
                      "(2-image, e.g. an exported align3r)")
    pair.add_argument("--image1", required=True)
    pair.add_argument("--image2", required=True)
    pair.add_argument("--out", default="results")
    pair.set_defaults(fn=cmd_pair)

    webcam = sub.add_parser("webcam", help="live depth viewer (webcam or IP cam)")
    webcam.add_argument("model", nargs="?", default="")
    webcam.add_argument("--engine", default="",
                        help="serve from a serialized .mdeteng artifact")
    webcam.add_argument("--encoder", default="")
    webcam.add_argument("--camera", default="0",
                        help="device index or IP camera URL")
    _add_precision_args(webcam)
    webcam.set_defaults(fn=cmd_webcam)

    build = sub.add_parser("build", help="pre-build an engine (AOT compile)")
    build.add_argument("model")
    build.add_argument("--encoder", default="")
    build.add_argument("--size", type=int, default=518)
    build.add_argument("--metric", action="store_true")
    build.add_argument("--viz", action="store_true")
    build.set_defaults(fn=cmd_build)

    exp = sub.add_parser(
        "export",
        help="write a serialized engine artifact (.mdeteng) — the shippable "
        "analogue of the reference's .engine plan, weights baked in",
    )
    exp.add_argument("model")
    exp.add_argument("--encoder", default="")
    exp.add_argument("--size", type=int, default=518)
    exp.add_argument("--metric", action="store_true")
    exp.add_argument("--dataset", default="hypersim")
    exp.add_argument("--checkpoint", default="")
    exp.add_argument("--viz", action="store_true",
                     help="fuse the colormap epilogue into the artifact")
    exp.add_argument("--batches", default="1",
                     help="comma-separated batch sizes to export modules for")
    exp.add_argument("--views", default="",
                     help="comma-separated S values: add S-view joint "
                     "modules (VGGT-family multi-view)")
    exp.add_argument("--stream-window", type=int, default=0,
                     dest="stream_window", metavar="W",
                     help="add a causal KV-cache streaming step module "
                     "with a W-view window (streamvggt) — `mdet video "
                     "--engine` then serves O(1)-per-frame causal depth")
    exp.add_argument("--serve-bundle", type=int, default=0, metavar="N",
                     help="export a serve-ready bundle: power-of-two batch "
                     "buckets up to N, both viz variants (weights stored "
                     "once) — feeds `mdet serve --engine`")
    exp.add_argument("--out", default="",
                     help="output path (default: <cache>/exported/<name>.mdeteng)")
    exp.add_argument("--platforms", default="cpu,tpu",
                     help="comma-separated lowering platforms")
    _add_precision_args(exp)
    exp.set_defaults(fn=cmd_export)

    slam = sub.add_parser(
        "slam", help="video SLAM recipes (megasam / vipe / wildgs_slam)")
    slam.add_argument("model", nargs="?", default="megasam")
    slam.add_argument("--video", default="")
    slam.add_argument("--frames", default="",
                      help="directory of frames (alternative to --video)")
    slam.add_argument("--out", default="results")
    slam.add_argument("--focal", type=float, default=0.0,
                      help="known focal in flow-resolution px (default: "
                      "recipe-specific prior / GeoCalib)")
    slam.add_argument("--stride", type=int, default=1)
    slam.add_argument("--max-frames", type=int, default=0)
    slam.add_argument("--cvd", action="store_true",
                      help="also write per-frame consistent video depth")
    slam.set_defaults(fn=cmd_slam)

    serve = sub.add_parser(
        "serve", help="HTTP depth serving (POST images to /v1/depth)")
    serve.add_argument("model", nargs="?", default="")
    serve.add_argument("--encoder", default="")
    serve.add_argument("--checkpoint", default="")
    serve.add_argument("--engine", action="append", default=[],
                       help="serve from a serialized .mdeteng artifact "
                       "(`mdet export --serve-bundle N`) — no model zoo "
                       "or checkpoints needed; repeat the flag to host "
                       "several models behind one server "
                       "(POST /v1/models/<name>/depth)")
    _add_precision_args(serve)
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8000)
    serve.add_argument("--size", type=int, default=0,
                       help="served square input size (default: model spec)")
    serve.add_argument("--max-queue", type=int, default=32,
                       dest="max_queue")
    serve.add_argument("--max-batch", type=int, default=1, dest="max_batch",
                       help="dynamic batching: serve up to N queued requests "
                       "per device launch (power-of-two buckets)")
    serve.add_argument("--batch-window-ms", type=float, default=2.0,
                       dest="batch_window_ms",
                       help="how long to wait for straggler requests once "
                       "one is in hand (only with --max-batch > 1)")
    serve.add_argument("--device-mesh", default="", dest="device_mesh",
                       help="shard the served model over DxM devices "
                       "(data x model axes, e.g. 1x8 = tensor-parallel "
                       "serving); live pipelines only — artifacts bake "
                       "their shardings at export")
    serve.set_defaults(fn=cmd_serve)

    convert = sub.add_parser(
        "convert",
        help="convert/audit a torch checkpoint (supports hf:org/repo/file)")
    convert.add_argument("model")
    convert.add_argument("--checkpoint", required=True)
    convert.add_argument("--encoder", default="")
    convert.add_argument("--report", action="store_true",
                         help="print the consumed/unconsumed key audit and "
                         "write nothing")
    convert.add_argument("--verify-manifest", action="store_true",
                         dest="verify_manifest",
                         help="diff the checkpoint's tensor names/shapes "
                         "against the family's committed expected-key "
                         "manifest (weights/manifests/) BEFORE converting; "
                         "exit 2 on layout mismatch")
    convert.set_defaults(fn=cmd_convert)

    dist = sub.add_parser(
        "distill",
        help="teacher→student depth distillation on an image directory "
        "(training subsystem; beyond the inference-only reference)")
    dist.add_argument("--teacher", default="depth_anything_v2")
    dist.add_argument("--teacher-encoder", default="vitl")
    dist.add_argument("--student", default="depth_anything_v2",
                      help="student registry name; must be a DA-V2-family "
                      "serving graph (depth_anything_v2 / "
                      "distill_any_depth / depth_anything_ac / bridge)")
    dist.add_argument("--student-encoder", default="vits")
    dist.add_argument("--images-dir", required=True)
    dist.add_argument("--size", type=int, default=266,
                      help="training resolution (rounded down to /14)")
    dist.add_argument("--batch", type=int, default=4)
    dist.add_argument("--steps", type=int, default=200)
    dist.add_argument("--lr", type=float, default=3e-4)
    dist.add_argument("--accum-steps", type=int, default=1)
    dist.add_argument("--max-images", type=int, default=2048,
                      help="cap on images held in RAM (frames + teacher "
                      "labels are resident for the run)")
    dist.add_argument("--out", default="results/distill")
    dist.add_argument("--qat", action="store_true",
                      help="quantization-aware training: fake-quant (STE) "
                      "student forward so the result serves well at "
                      "--precision int8")
    dist.add_argument("--promote", action="store_true",
                      help="install the distilled params in the weights "
                      "cache under the student's artifact name")
    dist.set_defaults(fn=cmd_distill)

    ev = sub.add_parser(
        "eval",
        help="depth/flow metrics between prediction and ground-truth "
        "npz/npy files or directories")
    ev.add_argument("--pred", required=True)
    ev.add_argument("--gt", required=True)
    ev.add_argument("--key", default="depth",
                    help="array key inside npz files (default: depth)")
    ev.add_argument("--align", default="none",
                    choices=["none", "affine", "median"],
                    help="per-image alignment before scoring (relative-"
                    "depth protocols)")
    ev.add_argument("--flow", action="store_true",
                    help="score (H,W,2) flow fields with EPE/n-px instead")
    ev.add_argument("--gt-scale", type=float, default=0.0,
                    help="divide image-file ground truth by this (16-bit "
                    "PNG/TIFF GT; default 256 for uint16 — the KITTI "
                    "meters*256 convention)")
    ev.add_argument("--min-depth", type=float, default=0.0,
                    help="ignore GT below this depth (Eigen protocol)")
    ev.add_argument("--max-depth", type=float, default=0.0,
                    help="ignore GT beyond this depth (e.g. 80 for KITTI)")
    ev.set_defaults(fn=cmd_eval)

    qc = sub.add_parser(
        "quantcheck",
        help="int8-vs-bf16 accuracy report for one config (one JSON line; "
        "exit 3 if delta1 falls below --min-delta1)")
    qc.add_argument("model")
    qc.add_argument("--encoder", default="")
    qc.add_argument("--checkpoint", default="")
    qc.add_argument("--images", default="",
                    help="image directory (default: the bundled example)")
    qc.add_argument("--max-images", type=int, default=8)
    qc.add_argument("--min-delta1", type=float, default=0.95,
                    dest="min_delta1")
    qc.add_argument("--calib-dir", default="", dest="calib_dir",
                    help="directory of domain images for int8 calibration")
    qc.set_defaults(fn=cmd_quantcheck)

    sub.add_parser("models", help="list registered models").set_defaults(fn=cmd_models)
    sub.add_parser("engines", help="list built engines").set_defaults(fn=cmd_engines)
    doc = sub.add_parser(
        "doctor", help="environment diagnostic (backend/caches/native)")
    doc.add_argument("--no-devices", action="store_true", dest="no_devices",
                     help="skip device enumeration (it hangs when the "
                     "accelerator link is down)")
    doc.set_defaults(fn=cmd_doctor)
    for sp in (run, flow, video, webcam, track, pair, batch, views, slam,
               serve, dist, qc):
        # SUPPRESS: don't let the subparser's default clobber the
        # main-parser flag when given before the subcommand
        sp.add_argument("--allow-random-weights", action="store_true",
                        dest="allow_random_weights", default=argparse.SUPPRESS,
                        help="permit random weights when no checkpoint exists")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "device", "auto") not in ("auto", "cpu", "tpu", "axon"):
        # argparse never validates DEFAULTS, so a bad MDET_DEVICE env value
        # would otherwise surface as an obscure backend-init RuntimeError
        log(f"invalid MDET_DEVICE/--device {args.device!r}; "
            f"want auto|cpu|tpu|axon", tag="ERROR")
        return 2
    if getattr(args, "device", "auto") != "auto":
        # must land before the backend initializes (first device/compile
        # touch); the axon plugin ignores the JAX_PLATFORMS env var, so
        # jax.config is the only override that works for it. The remote
        # chip registers as platform "axon", a local one as "tpu" — map
        # --device tpu to whichever plugin is actually registered (an
        # explicit jax_platforms list hard-fails on unregistered names).
        import jax

        device = args.device
        if device == "tpu":
            import glob

            try:
                from jax._src import xla_bridge as _xb

                have_axon = "axon" in _xb._backend_factories
            except Exception:
                have_axon = False
            # a local chip exposes /dev/accel* (or vfio); without one the
            # "tpu" factory fails at init, so route to the tunnel plugin
            local_chip = bool(glob.glob("/dev/accel*")
                              or glob.glob("/dev/vfio/*"))
            if have_axon and not local_chip:
                device = "axon"
        jax.config.update("jax_platforms", device)
    if getattr(args, "allow_random_weights", False) or args.cmd in ("bench", "build"):
        # Benchmark/build paths measure FLOPs and layout, not numerics —
        # random weights are fine there (and loudly WARNed). Everything else
        # errors on a missing checkpoint unless --allow-random-weights.
        from monocular_depth_estimation_trt_tpu.weights.store import (
            set_allow_random_weights,
        )

        set_allow_random_weights(True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
