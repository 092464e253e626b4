"""Serialized engine artifacts (`mdet export` / `runtime/export.py`).

The reference ships a serialized TRT plan (`Depth_Anything_V2/onnx2trt.py:
60-68`) that a consumer deserializes and runs without model code
(`common_runtime.py`). These tests gate our analogue: the `.mdeteng`
container round-trips the fused program bit-exactly, snapshots weights
(plan-file semantics, stored once and shared by every batch/viz module),
and serves through the CLI and the HTTP server.
"""

import os
import zipfile

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu import cli, registry
from monocular_depth_estimation_trt_tpu.config import ModelSpec
from monocular_depth_estimation_trt_tpu.pipelines import DepthPipeline
from monocular_depth_estimation_trt_tpu.runtime.export import (
    export_pipeline,
    load_engine,
    read_meta,
)


def _toy_pipeline(viz="relative"):
    spec = ModelSpec(model="toy_export", input_hw=(16, 16))
    params = {"w": jnp.full((3,), 2.0, jnp.float32),
              "b": jnp.asarray(0.5, jnp.float32)}

    def forward(params, img_u8, out_hw):
        x = img_u8.astype(jnp.float32) / 255.0
        depth = x @ params["w"] + params["b"]
        return {"depth": depth}

    return DepthPipeline(spec, forward, params, viz=viz)


def _img(shape=(16, 16, 3), seed=7):
    return np.random.default_rng(seed).integers(
        0, 255, shape, dtype=np.uint8
    )


def test_roundtrip_matches_pipeline(tmp_path):
    pipe = _toy_pipeline()
    path = str(tmp_path / "toy.mdeteng")
    out_path = export_pipeline(pipe, (16, 16), path=path)
    assert out_path == path and os.path.exists(path)

    eng = load_engine(path)
    img = _img()
    got = eng(img)
    want = pipe(img)
    assert set(got) == set(want)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6)


def test_viz_epilogue_is_fused_into_artifact(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz=True,
                           path=str(tmp_path / "v.mdeteng"))
    eng = load_engine(path)
    out = eng(_img(), viz=True)
    assert "viz" in out and out["viz"].dtype == np.uint8
    assert "b1_viz" in read_meta(path)["modules"]


def test_weights_are_snapshotted(tmp_path):
    """Plan-file semantics: mutating the live params after export must not
    change the artifact's outputs."""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "b.mdeteng"))
    img = _img()
    before = load_engine(path)(img)["depth"]
    pipe.params["w"] = jnp.zeros((3,), jnp.float32)
    after = load_engine(path)(img)["depth"]
    np.testing.assert_array_equal(before, after)
    assert not np.allclose(before, np.asarray(pipe(img)["depth"]))


def test_weights_stored_once_across_modules(tmp_path):
    """The serve-bundle's N modules share ONE param snapshot (a TRT plan
    bakes weights per-plan; sharing is what keeps bundles affordable)."""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz="both", batches=(1, 2, 4),
                           path=str(tmp_path / "s.mdeteng"))
    meta = read_meta(path)
    assert sorted(meta["modules"]) == [
        "b1", "b1_viz", "b2", "b2_viz", "b4", "b4_viz"]
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert sum(n.startswith("params/") for n in names) == 2  # w and b, once
    assert sum(n.startswith("modules/") for n in names) == 6


def test_serve_bundle_batch_call_buckets_and_pads(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz="both", batches=(1, 2, 4),
                           path=str(tmp_path / "p.mdeteng"))
    eng = load_engine(path)
    assert eng.batches == [1, 2, 4]
    frames = np.stack([_img(seed=s) for s in range(3)])  # 3 -> bucket 4
    got = eng.batch_call(frames)
    want = pipe.batch_call(frames)
    assert got["depth"].shape == (3, 16, 16)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6)
    # viz variant through the batched module
    gotv = eng.batch_call(frames, viz=True)
    assert gotv["viz"].shape[:1] == (3,)


def test_missing_bucket_raises_with_hint(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), batches=(1,),
                           path=str(tmp_path / "one.mdeteng"))
    eng = load_engine(path)
    with pytest.raises(ValueError, match="serve-bundle"):
        eng.batch_call(np.stack([_img(), _img()]))


def test_viz_falls_back_to_raw_module(tmp_path):
    """An artifact exported without viz still serves viz=True calls (the
    caller just gets no 'viz' key — same contract as viz='none')."""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz=False,
                           path=str(tmp_path / "nv.mdeteng"))
    out = load_engine(path)(_img(), viz=True)
    assert "depth" in out and "viz" not in out


def test_raw_falls_back_to_viz_module(tmp_path):
    """A --viz-only artifact serves viz=False consumers too (benchmark,
    npz serving): the viz module computes depth either way; the caller
    just gets an extra 'viz' key."""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz=True,
                           path=str(tmp_path / "vo.mdeteng"))
    eng = load_engine(path)
    out = eng(_img(), viz=False)
    assert "depth" in out and "viz" in out
    # benchmark routes through engine_for(hw, False) — must not raise
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig

    assert eng.benchmark(config=BenchmarkConfig(warmup=1,
                                                iterations=2)).avg_ms > 0


def test_export_rejects_empty_batches(tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        export_pipeline(_toy_pipeline(), (16, 16), batches=(),
                        path=str(tmp_path / "e.mdeteng"))


def test_cli_webcam_and_flow_engine_checks(tmp_path):
    """Non-viz artifacts are rejected up front by webcam; wrong-arity
    artifacts by flow (no deep KeyError/TypeError tracebacks)."""
    depth_raw = export_pipeline(_toy_pipeline(), (16, 16), with_viz=False,
                                path=str(tmp_path / "draw.mdeteng"))
    assert cli.main(["webcam", "--engine", depth_raw]) == 2
    assert cli.main(["flow", "--engine", depth_raw,
                     "--frames", str(tmp_path)]) == 2  # 1-image artifact
    flow_raw = export_pipeline(_toy_flow_pipeline(), (16, 16),
                               with_viz=False,
                               path=str(tmp_path / "fraw.mdeteng"))
    assert cli.main(["flow", "--engine", flow_raw,
                     "--frames", str(tmp_path)]) == 2  # no viz module


def test_meta_describes_signature(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "m.mdeteng"))
    meta = read_meta(path)
    assert meta["format"] == "MDETENG"
    assert meta["model"] == "toy_export"
    assert meta["in_hw"] == [16, 16]
    assert meta["inputs"][0]["shape"] == [16, 16, 3]
    assert meta["inputs"][0]["dtype"] == "uint8"
    assert "depth" in meta["output_names"]
    assert "cpu" in meta["platforms"]
    eng = load_engine(path)
    assert eng.in_shapes[0] == (16, 16, 3)
    assert "toy_export" in eng.describe()
    assert eng.spec.artifact_name().startswith("toy_export")


def test_load_rejects_non_engine_zip(tmp_path):
    p = str(tmp_path / "junk.mdeteng")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="not an MDETENG artifact"):
        load_engine(p)


def test_cli_export_then_run_engine(tmp_path, monkeypatch):
    """End-to-end: `mdet export` writes the artifact, `mdet run --engine`
    serves from it (with the fixed-shape auto-resize, TRT-plan style) and
    writes the usual npz/jpg artifacts."""
    import cv2

    monkeypatch.setattr(registry, "build_pipeline",
                        lambda name, **kw: _toy_pipeline())
    eng_path = str(tmp_path / "cli.mdeteng")
    rc = cli.main(["export", "toy_export", "--size", "16", "--viz",
                   "--out", eng_path, "--platforms", "cpu"])
    assert rc == 0 and os.path.exists(eng_path)

    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, _img((20, 24, 3)))  # wrong shape -> auto-resize
    out_dir = tmp_path / "out"
    rc = cli.main(["run", "--engine", eng_path,
                   "--image", img_path, "--out", str(out_dir)])
    assert rc == 0
    files = os.listdir(out_dir)
    npz = [f for f in files if f.endswith(".npz")]
    assert len(npz) == 1
    depth = np.load(out_dir / npz[0])["depth"]
    assert depth.shape == (16, 16)
    assert any(f.endswith(".jpg") for f in files)  # viz module present


def test_cli_run_without_model_or_engine_errors():
    assert cli.main(["run"]) == 2


def test_cli_doctor_no_devices():
    assert cli.main(["doctor", "--no-devices"]) == 0


def test_benchmark_on_artifact(tmp_path):
    """LoadedEngine.benchmark reuses the pipeline protocol; `mdet bench
    --engine` runs it end-to-end. (No stdout assertion: the [MDET] logger
    binds sys.stdout at first use, so per-test capture misses it.)"""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "bm.mdeteng"))
    rc = cli.main(["bench", "--engine", path,
                   "--warmup", "1", "--iterations", "2"])
    assert rc == 0

    eng = load_engine(path)
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig

    rep = eng.benchmark(config=BenchmarkConfig(warmup=1, iterations=2))
    assert rep.avg_ms > 0


def test_benchmark_rejects_flow_artifact(tmp_path):
    path = export_pipeline(_toy_flow_pipeline(), (16, 16),
                           path=str(tmp_path / "bf.mdeteng"))
    with pytest.raises(ValueError, match="single-image"):
        load_engine(path).benchmark()


@pytest.mark.slow
def test_int8_bundle_exports_and_roundtrips(tmp_path, monkeypatch):
    """An int8 w8a8 serving bundle ({"params", "q8"}, docs/QUANT.md) is just
    a bigger pytree of leaves: quantized kernels + scales snapshot into the
    artifact and the loaded engine reproduces the live int8 pipeline."""
    import jax
    import monocular_depth_estimation_trt_tpu.models.depth_anything_v2 as da_mod
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    real = da_mod.DepthAnythingV2
    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=56)

    def tiny(encoder="vits", **kw):
        kw.update(vit_config=cfg, head_features=16,
                  head_out_channels=(8, 16, 32, 32), out_indices=(0, 1, 0, 1))
        return real(encoder="tiny", **kw)

    monkeypatch.setattr(da_mod, "DepthAnythingV2", tiny)
    # the memory-bound-encoder guard would route vits int8 -> bf16
    # (registry.resolve_int8_precision); this test is about the bundle
    # round-trip mechanics, so force the int8 build
    monkeypatch.setenv("MDET_FORCE_INT8", "1")
    m = tiny(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2),
                    jnp.zeros((1, 56, 56, 3)))["params"]
    pipe_q = build_pipeline("depth_anything_v2", encoder="vits",
                            precision="int8", input_size=56, params=params)
    assert "q8" in pipe_q.params

    path = export_pipeline(pipe_q, (56, 56),
                           path=str(tmp_path / "q.mdeteng"))
    eng = load_engine(path)
    assert eng.spec.precision == "int8"
    img = _img((56, 56, 3))
    got = eng(img)["depth"]
    want = pipe_q(img)["depth"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cli_batch_from_artifact(tmp_path):
    """`mdet batch --engine`: offline batched serving straight from the
    artifact (apps/offline.py drives the exported batch module)."""
    import cv2

    pipe = _toy_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), batches=(2,),
                               path=str(tmp_path / "b2.mdeteng"))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for s in range(3):
        cv2.imwrite(str(img_dir / f"f{s}.png"), _img(seed=s))
    out_dir = tmp_path / "bout"
    rc = cli.main(["batch", "--engine", eng_path, "--images-dir",
                   str(img_dir), "--batch", "2", "--out", str(out_dir),
                   "--save"])
    assert rc == 0
    npz = sorted(f for f in os.listdir(out_dir) if f.endswith(".npz"))
    assert len(npz) == 3
    d = np.load(out_dir / npz[0])["depth"]
    assert d.shape == (16, 16)


def test_cli_video_from_artifact(tmp_path):
    """`mdet video --engine`: per-frame streaming from the artifact, with
    frames auto-resized to the fixed input shape (TRT-plan semantics)."""
    import cv2

    pipe = _toy_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), with_viz=True,
                               path=str(tmp_path / "vid.mdeteng"))
    vp = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (64, 48))
    for s in range(4):
        writer.write(cv2.cvtColor(_img((48, 64, 3), seed=s),
                                  cv2.COLOR_RGB2BGR))
    writer.release()
    out_dir = tmp_path / "vout"
    rc = cli.main(["video", "--engine", eng_path, "--video", vp,
                   "--out", str(out_dir)])
    assert rc == 0
    mp4 = [f for f in os.listdir(out_dir) if f.endswith(".mp4")]
    assert len(mp4) == 1
    cap = cv2.VideoCapture(str(out_dir / mp4[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()


def test_cli_video_engine_without_viz_errors(tmp_path):
    pipe = _toy_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), with_viz=False,
                               path=str(tmp_path / "nv2.mdeteng"))
    rc = cli.main(["video", "--engine", eng_path, "--video", "x.mp4",
                   "--out", str(tmp_path)])
    assert rc == 2


def _toy_flow_pipeline():
    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline

    spec = ModelSpec(model="toy_flow", input_hw=(16, 16))
    params = {"s": jnp.asarray(0.1, jnp.float32)}

    def forward(params, img1, img2):
        d = (img2.astype(jnp.float32) - img1.astype(jnp.float32)) * params["s"]
        return {"flow": d[..., :2]}

    return FlowPipeline(spec, forward, params)


def test_flow_pipeline_exports_two_image_artifact(tmp_path):
    """FlowPipeline (two uint8 frames in) exports and round-trips; the
    artifact enforces its image arity."""
    pipe = _toy_flow_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz="both",
                           path=str(tmp_path / "f.mdeteng"))
    eng = load_engine(path)
    assert eng.meta["n_image_args"] == 2
    f1, f2 = _img(seed=1), _img(seed=2)
    got = eng(f1, f2)
    want = pipe(f1, f2)
    np.testing.assert_allclose(got["flow"], want["flow"], rtol=1e-6)
    assert "viz" in eng(f1, f2, viz=True)
    with pytest.raises(TypeError, match="2 image"):
        eng(f1)
    with pytest.raises(ValueError, match="single-image only"):
        eng.batch_call(np.stack([f1, f2]))
    with pytest.raises(ValueError, match="single-image only"):
        export_pipeline(pipe, (16, 16), batches=(1, 2),
                        path=str(tmp_path / "fb.mdeteng"))


def test_cli_pair_from_artifact(tmp_path):
    """`mdet pair --engine`: two-image 3D (depth jpg + cloud ply + pose
    json) straight from a 2-image artifact."""
    import cv2

    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline

    spec = ModelSpec(model="toy_pair", input_hw=(16, 16))

    def forward(params, img1, img2):
        d = img1.astype(jnp.float32).mean(-1) + 1.0
        pts = jnp.stack([d, d, d], -1)
        return {"depth": d, "pts1": pts, "pts2": pts,
                "rotation": jnp.eye(3), "translation": jnp.zeros(3)}

    pipe = FlowPipeline(spec, forward, {})
    eng_path = export_pipeline(pipe, (16, 16),
                               path=str(tmp_path / "pair.mdeteng"))
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, _img(seed=1))
    cv2.imwrite(p2, _img(seed=2))
    out_dir = tmp_path / "pout"
    rc = cli.main(["pair", "--engine", eng_path, "--image1", p1,
                   "--image2", p2, "--out", str(out_dir)])
    assert rc == 0
    files = os.listdir(out_dir)
    assert any(f.endswith(".jpg") for f in files)
    assert any(f.endswith(".ply") for f in files)
    assert any(f.endswith("_pose.json") for f in files)


def test_cli_flow_from_artifact(tmp_path):
    """`mdet flow --engine`: consecutive-frame flow straight from a flow
    artifact (color-wheel mp4 out)."""
    import cv2

    pipe = _toy_flow_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), with_viz=True,
                               path=str(tmp_path / "fc.mdeteng"))
    frames = tmp_path / "frames"
    frames.mkdir()
    for s in range(3):
        cv2.imwrite(str(frames / f"f{s}.png"), _img(seed=s))
    out_dir = tmp_path / "fout"
    rc = cli.main(["flow", "--engine", eng_path, "--frames", str(frames),
                   "--out", str(out_dir)])
    assert rc == 0
    assert os.path.exists(out_dir / "toy_flow_flow.mp4")


def _toy_views_pipeline():
    """VGGT-shaped toy: a views_engine producing (depth, depth_conf,
    pose_enc) for an (S, H, W, 3) joint program."""
    from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

    class ToyViews(DepthPipeline):
        def views_engine(self, s, src_hw=None):
            src = tuple(src_hw or (16, 16))
            key = ("views", s, src)
            if key not in self._engines:
                def run(p, views_u8):
                    x = views_u8.astype(jnp.float32) / 255.0
                    depth = x.mean(-1) * p["g"]
                    pose = jnp.tile(
                        jnp.array([0, 0, 0, 0, 0, 0, 1, 0.8, 0.8],
                                  jnp.float32), (views_u8.shape[0], 1))
                    return {"depth": depth,
                            "depth_conf": jnp.ones_like(depth) * 2.0,
                            "pose_enc": pose}

                self._engines[key] = Engine(
                    run,
                    (self.params,
                     jnp.zeros((s, *src, 3), jnp.uint8)),
                    name=f"toy_views_s{s}",
                )
            return self._engines[key]

        def multi_view(self, views_u8):
            eng = self.views_engine(views_u8.shape[0],
                                    views_u8.shape[1:3])
            out = eng(self.params, jnp.asarray(views_u8))
            return {k: np.asarray(v) for k, v in out.items()}

    spec = ModelSpec(model="toy_views", input_hw=(16, 16))

    def forward(params, img_u8, out_hw):
        return {"depth": img_u8.astype(jnp.float32).mean(-1) * params["g"]}

    return ToyViews(spec, forward, {"g": jnp.asarray(2.0, jnp.float32)},
                    viz="none")


def test_views_module_exports_and_roundtrips(tmp_path):
    """--views S adds an S-view joint module; LoadedEngine.multi_view
    matches the live pipeline and names the available S on a miss. Views
    modules never leak into single-image bucket selection."""
    pipe = _toy_views_pipeline()
    path = export_pipeline(pipe, (16, 16), views=(2,),
                           path=str(tmp_path / "mv.mdeteng"))
    eng = load_engine(path)
    assert "views_s2" in read_meta(path)["modules"]
    views = np.stack([_img(seed=s) for s in range(2)])
    got = eng.multi_view(views)
    want = pipe.multi_view(views)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6)
    np.testing.assert_allclose(got["pose_enc"], want["pose_enc"])
    with pytest.raises(ValueError, match=r"available: \[2\]"):
        eng.multi_view(np.stack([_img()] * 3))
    # single-image call routes to the b1 module, not views_s2
    single = eng(_img())
    assert single["depth"].shape == (16, 16)


def test_views_export_honors_requested_size(tmp_path):
    """views modules are exported at the requested in_hw, not the
    pipeline's native default (regression: --size != native size produced
    an artifact whose views path could never run)."""
    pipe = _toy_views_pipeline()  # native default src is (16, 16)
    path = export_pipeline(pipe, (8, 8), views=(2,),
                           path=str(tmp_path / "mv8.mdeteng"))
    eng = load_engine(path)
    mod = read_meta(path)["modules"]["views_s2"]
    assert mod["outputs"][0]["shape"][:3] == [2, 8, 8]
    out = eng.multi_view(np.stack([_img((8, 8, 3), seed=s)
                                   for s in range(2)]))
    assert out["depth"].shape == (2, 8, 8)


def test_benchmark_views_on_artifact(tmp_path):
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig

    pipe = _toy_views_pipeline()
    path = export_pipeline(pipe, (16, 16), views=(2,),
                           path=str(tmp_path / "mvb.mdeteng"))
    eng = load_engine(path)
    rep = eng.benchmark_views(2, BenchmarkConfig(warmup=1, iterations=2))
    assert rep.frames_per_iteration == 2
    with pytest.raises(ValueError, match="re-export with --views"):
        eng.benchmark_views(4)
    rc = cli.main(["bench", "--engine", path, "--views", "2",
                   "--warmup", "1", "--iterations", "2"])
    assert rc == 0


def test_cli_bench_engine_rejects_baked_flags(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "bf2.mdeteng"))
    assert cli.main(["bench", "--engine", path, "--precision", "int8"]) == 2
    assert cli.main(["bench", "--engine", path,
                     "--device-mesh", "2x4"]) == 2
    assert cli.main(["bench", "--engine", path, "--size", "32"]) == 2
    # matching --size is fine
    assert cli.main(["bench", "--engine", path, "--size", "16",
                     "--warmup", "1", "--iterations", "2"]) == 0


def test_cli_views_wrong_s_is_clean_error(tmp_path):
    import cv2

    pipe = _toy_views_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), views=(2,),
                               path=str(tmp_path / "mvw.mdeteng"))
    paths = []
    for s in range(3):  # 3 images, only S=2 exported
        p = str(tmp_path / f"w{s}.png")
        cv2.imwrite(p, _img(seed=s))
        paths.append(p)
    rc = cli.main(["views", "--engine", eng_path, "--resize", "16",
                   "--images", *paths, "--out", str(tmp_path / "o")])
    assert rc == 2


def test_views_rejected_for_non_multiview_pipeline(tmp_path):
    with pytest.raises(ValueError, match="multi-view"):
        export_pipeline(_toy_pipeline(), (16, 16), views=(2,),
                        path=str(tmp_path / "x.mdeteng"))


def test_cli_views_from_artifact(tmp_path):
    """`mdet views --engine`: S-view depth npz + merged world cloud from
    the artifact."""
    import cv2

    pipe = _toy_views_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), views=(2,),
                               path=str(tmp_path / "mvc.mdeteng"))
    img_paths = []
    for s in range(2):
        p = str(tmp_path / f"v{s}.png")
        cv2.imwrite(p, _img(seed=s))
        img_paths.append(p)
    out_dir = tmp_path / "vout"
    rc = cli.main(["views", "--engine", eng_path, "--resize", "16",
                   "--images", *img_paths, "--out", str(out_dir)])
    assert rc == 0
    files = os.listdir(out_dir)
    assert any(f.endswith("_s2.npz") for f in files)
    assert any(f.endswith("_s2.ply") for f in files)


def _toy_stream_pipeline():
    """Pipeline with a stream_export_bundle: causal state (running mean)
    threaded through a pure step, mirroring the StreamVGGT KV-cache
    contract."""

    class ToyStream(DepthPipeline):
        def stream_export_bundle(self, window=2, frame_hw=(16, 16)):
            cache0 = {"acc": jnp.zeros((16, 16), jnp.float32),
                      "n": jnp.zeros((), jnp.float32)}

            def step(p, frame_u8, cache):
                x = frame_u8.astype(jnp.float32).mean(-1) * p["g"]
                acc = cache["acc"] + x
                n = cache["n"] + 1.0
                out = {"depth": acc / n,
                       "viz": jnp.clip(acc / n, 0, 255)[..., None].repeat(
                           3, -1).astype(jnp.uint8)}
                return out, {"acc": acc, "n": n}

            return step, cache0

    spec = ModelSpec(model="toy_stream", input_hw=(16, 16))

    def forward(params, img_u8, out_hw):
        return {"depth": img_u8.astype(jnp.float32).mean(-1) * params["g"]}

    return ToyStream(spec, forward, {"g": jnp.asarray(1.0, jnp.float32)},
                     viz="none")


def test_stream_module_exports_causal_state(tmp_path):
    """--stream-window exports the causal step; the loaded runner threads
    device-resident state between frames (identical frames give different
    outputs as the running state evolves, matching the pure step)."""
    pipe = _toy_stream_pipeline()
    path = export_pipeline(pipe, (16, 16), stream_window=2,
                           path=str(tmp_path / "st.mdeteng"))
    meta = read_meta(path)
    assert meta["modules"]["stream"]["stream"] is True
    assert meta["modules"]["stream"]["window"] == 2
    assert "state_manifest" in meta

    eng = load_engine(path)
    runner = eng.stream()
    f = _img()
    o1 = runner(f, viz=True)
    o2 = runner(f, viz=True)
    # reference: run the pure step twice
    step, cache = pipe.stream_export_bundle(2, (16, 16))
    w1, cache = step(pipe.params, jnp.asarray(f), cache)
    w2, cache = step(pipe.params, jnp.asarray(f), cache)
    np.testing.assert_allclose(o1["depth"], np.asarray(w1["depth"]),
                               rtol=1e-6)
    np.testing.assert_allclose(o2["depth"], np.asarray(w2["depth"]),
                               rtol=1e-6)
    assert "viz" in o1
    # single-image calls still route to b1, never the stream module
    assert eng(_img())["depth"].shape == (16, 16)


def test_stream_zero_state_ships_as_manifest_only(tmp_path):
    """All-zero initial cache leaves cost neither file bytes nor a
    host->device transfer (real VGGT's KV cache is ~0.5 GB of zeros)."""
    pipe = _toy_stream_pipeline()
    path = export_pipeline(pipe, (16, 16), stream_window=2,
                           path=str(tmp_path / "z.mdeteng"))
    with zipfile.ZipFile(path) as z:
        assert not any(n.startswith("state/") for n in z.namelist())
    meta = read_meta(path)
    assert all(m.get("zero") for m in meta["state_manifest"])
    assert meta["modules"]["stream"]["outputs"]  # shapes recorded


def test_stream_window_mismatch_raises(tmp_path):
    pipe = _toy_stream_pipeline()
    path = export_pipeline(pipe, (16, 16), stream_window=2,
                           path=str(tmp_path / "w.mdeteng"))
    eng = load_engine(path)
    with pytest.raises(ValueError, match="stream-window 2"):
        eng.stream(window=4)
    assert callable(eng.stream(window=2))  # matching window is fine


def test_webcam_rejects_stream_only_viz_artifact(tmp_path):
    """The stream module's fused viz does NOT satisfy webcam (which calls
    pipe(frame, viz=True) per frame); video (which routes through
    .stream()) accepts the same artifact."""
    pipe = _toy_stream_pipeline()
    path = export_pipeline(pipe, (16, 16), stream_window=2,
                           path=str(tmp_path / "wv.mdeteng"))
    assert cli.main(["webcam", "--engine", path]) == 2


def test_export_rejects_negative_stream_window(tmp_path):
    with pytest.raises(ValueError, match="stream-window"):
        export_pipeline(_toy_stream_pipeline(), (16, 16), stream_window=-1,
                        path=str(tmp_path / "n.mdeteng"))


def test_stream_fallback_for_plain_artifacts(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz=True,
                           path=str(tmp_path / "pf.mdeteng"))
    runner = load_engine(path).stream()
    out = runner(_img(), viz=True)
    assert "depth" in out and "viz" in out
    # the fallback must expose device_out so run_video's pipelined
    # dispatch/fetch path engages for artifact video serving too
    from monocular_depth_estimation_trt_tpu.runtime.transfer import (
        supports_device_out,
    )

    assert supports_device_out(runner)
    dev = runner(_img(), viz=True, device_out=True)
    assert "viz" in dev


def test_stream_rejected_without_bundle_hook(tmp_path):
    with pytest.raises(ValueError, match="streaming step"):
        export_pipeline(_toy_pipeline(), (16, 16), stream_window=2,
                        path=str(tmp_path / "sx.mdeteng"))


@pytest.mark.slow
def test_registry_streamvggt_stream_export(tmp_path, rng):
    """The REAL StreamVGGT causal step (nested-jit apply + KV ring cache +
    pad-square preprocess + viz epilogue) exports and matches the live
    .stream() runner step for step."""
    import jax
    from golden_specs import _vggt_cfg
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT
    from monocular_depth_estimation_trt_tpu.registry import _build_vggt

    cfg = _vggt_cfg(causal=True)
    base = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla",
                with_camera=True)
    params = base.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 1, 70, 70, 3))
    )["params"]
    pipe = _build_vggt("streamvggt", 70, "fp32", "xla", params,
                       vggt_cfg=cfg)
    path = export_pipeline(pipe, (70, 70), stream_window=2,
                           path=str(tmp_path / "svgt.mdeteng"))
    eng = load_engine(path)
    runner = eng.stream()
    live = pipe.stream(2)
    for s in range(3):  # past the window: ring-slide behavior too
        frame = rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
        got = runner(frame)
        want = live(frame)
        np.testing.assert_allclose(got["depth"], want["depth"],
                                   rtol=0, atol=1e-3)
        assert "viz" in got


def test_cli_video_from_stream_artifact(tmp_path):
    """`mdet video --engine <stream artifact>`: per-frame causal depth."""
    import cv2

    pipe = _toy_stream_pipeline()
    eng_path = export_pipeline(pipe, (16, 16), stream_window=2,
                               path=str(tmp_path / "sv.mdeteng"))
    vp = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (64, 48))
    for s in range(3):
        writer.write(cv2.cvtColor(_img((48, 64, 3), seed=s),
                                  cv2.COLOR_RGB2BGR))
    writer.release()
    out_dir = tmp_path / "svout"
    rc = cli.main(["video", "--engine", eng_path, "--video", vp,
                   "--out", str(out_dir)])
    assert rc == 0
    mp4 = [f for f in os.listdir(out_dir) if f.endswith(".mp4")]
    assert len(mp4) == 1


def test_http_server_from_artifact(tmp_path, monkeypatch):
    """`mdet serve --engine`: DepthServer drives the LoadedEngine through
    the same pipeline calling convention (single + dynamic batch)."""
    from monocular_depth_estimation_trt_tpu.apps.server import DepthServer

    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz="both", batches=(1, 2),
                           path=str(tmp_path / "srv.mdeteng"))
    eng = load_engine(path)
    ds = DepthServer(eng, max_batch=2).start()
    try:
        ds.warmup()
        jobs = [ds.submit(_img(seed=s), viz=(s == 0)) for s in range(2)]
        for j in jobs:
            assert j.done.wait(10) and j.error is None
        assert jobs[0].result["depth"].shape == (16, 16)
        assert "viz" in jobs[0].result
        assert ds.health()["model"].startswith("toy_export")
    finally:
        ds.stop()


def test_cli_serve_multi_engine_branch(tmp_path, monkeypatch):
    """`mdet serve --engine a --engine b`: the CLI loads every artifact,
    keys them by family name, clamps --max-batch to the smallest largest
    exported bucket, and hands ONE ordered dict to serve()."""
    import dataclasses

    from monocular_depth_estimation_trt_tpu import cli
    from monocular_depth_estimation_trt_tpu.apps.server import DepthServer

    pa = _toy_pipeline()
    pb = _toy_pipeline()
    pb.spec = dataclasses.replace(pb.spec, model="toy_export_b")
    path_a = export_pipeline(pa, (16, 16), with_viz="both", batches=(1, 2, 4),
                             path=str(tmp_path / "a.mdeteng"))
    path_b = export_pipeline(pb, (16, 16), with_viz="both", batches=(1, 2),
                             path=str(tmp_path / "b.mdeteng"))

    captured = {}

    def fake_serve(pipeline, **kw):
        captured["pipeline"] = pipeline
        captured.update(kw)

    monkeypatch.setattr(
        "monocular_depth_estimation_trt_tpu.apps.server.serve", fake_serve)
    rc = cli.main(["serve", "--engine", path_a, "--engine", path_b,
                   "--max-batch", "8", "--port", "0"])
    assert rc == 0
    pipes = captured["pipeline"]
    assert list(pipes) == ["toy_export", "toy_export_b"]
    # clamped to the LARGEST top bucket across artifacts (a's 4) — b is
    # capped at its own 2 by DepthServer.max_batch_by, not globally
    assert captured["max_batch"] == 4
    ds = DepthServer(pipes, max_batch=captured["max_batch"])
    assert ds.max_batch_by == {"toy_export": 4, "toy_export_b": 2}

    # duplicate family -> full artifact names disambiguate
    rc = cli.main(["serve", "--engine", path_a, "--engine", path_a,
                   "--port", "0"])
    assert rc == 2  # same artifact twice IS an operator error
