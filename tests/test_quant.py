"""Int8 (w8a8) static-calibration serving: kernel numerics, end-to-end
accuracy gate, and the registry precision="int8" path.

Beyond the reference (fp16-only TRT engines, no INT8 calibrator anywhere);
design + measurements in docs/PERF.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monocular_depth_estimation_trt_tpu.ops.quant import (
    QuantDense,
    build_q8,
    calibrate,
    quantize_vit_pipeline,
    quantize_weight,
)


def test_quantize_weight_roundtrip(rng):
    k = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    kq, s = quantize_weight(k)
    assert kq.dtype == jnp.int8
    back = kq.astype(jnp.float32) * s[None, :]
    # symmetric per-channel int8: max error is half a quantization step
    step = s[None, :]
    assert float(jnp.max(jnp.abs(back - k) / step)) <= 0.5 + 1e-5


def test_quant_dense_matches_fp32(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    calib_m = QuantDense(16, mode="calib", dtype=jnp.float32)
    serve_m = QuantDense(16, mode="serve", dtype=jnp.float32)
    params = calib_m.init(jax.random.PRNGKey(0), x)["params"]
    stats = calibrate(calib_m, {"params": params}, x)
    q8s = jax.eval_shape(serve_m.init, jax.random.PRNGKey(0), x)["q8"]
    q8 = build_q8(
        jax.tree_util.tree_map(lambda s_: jnp.zeros(s_.shape, s_.dtype), q8s),
        params,
        stats,
    )
    y_f = calib_m.apply({"params": params}, x)
    y_q = serve_m.apply({"params": params, "q8": q8}, x)
    rel = float(jnp.max(jnp.abs(y_f - y_q)) / (jnp.max(jnp.abs(y_f)) + 1e-9))
    assert rel < 0.05, rel


def test_smoothquant_beats_per_tensor_on_outlier_channels(rng):
    """The SmoothQuant smoothing in build_q8 must beat a plain per-tensor
    activation scale on ViT-like outlier-channel inputs (the case it
    exists for). Measured ~4x lower relative error at 30x outliers."""
    from monocular_depth_estimation_trt_tpu.ops.quant import _QMAX

    d_in, d_out = 128, 256
    x = rng.standard_normal((64, d_in)).astype(np.float32)
    x[:, :4] *= 30.0  # post-LN outlier channels
    x = jnp.asarray(x)
    calib_m = QuantDense(d_out, mode="calib", dtype=jnp.float32)
    serve_m = QuantDense(d_out, mode="serve", dtype=jnp.float32)
    params = calib_m.init(jax.random.PRNGKey(0), x)["params"]
    stats = calibrate(calib_m, {"params": params}, x)
    q8s = jax.eval_shape(serve_m.init, jax.random.PRNGKey(0), x)["q8"]
    q8 = build_q8(q8s, params, stats)
    y_f = calib_m.apply({"params": params}, x)
    y_s = serve_m.apply({"params": params, "q8": q8}, x)

    # plain per-tensor baseline: s = 1 everywhere
    ch = jnp.asarray(
        stats["absmax_ch"][0]
        if isinstance(stats["absmax_ch"], tuple) else stats["absmax_ch"]
    ).reshape(d_in)
    a = jnp.max(ch) / _QMAX
    kq, ws = quantize_weight(params["kernel"])
    q8_plain = {"qmul": jnp.full((d_in,), 1.0 / a), "kernel_q": kq,
                "out_scale": a * ws}
    y_p = serve_m.apply({"params": params, "q8": q8_plain}, x)

    def rel(y):
        return float(jnp.linalg.norm(y - y_f) / jnp.linalg.norm(y_f))

    assert rel(y_s) < 0.02, rel(y_s)
    assert rel(y_s) < rel(y_p) / 2.0, (rel(y_s), rel(y_p))


def _tiny_da(quant):
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=56)
    return DepthAnythingV2(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla", vit_config=cfg,
        head_features=16, head_out_channels=(8, 16, 32, 32),
        out_indices=(0, 1, 0, 1), quant=quant,
    )


def test_da_int8_accuracy_gate(rng):
    """Quantized tiny DA output stays close to the fp32 graph: δ1-style
    gate via the metric suite (affine-aligned AbsRel)."""
    from monocular_depth_estimation_trt_tpu.training.metrics import depth_metrics

    x = jnp.asarray(rng.uniform(-2, 2, (1, 56, 56, 3)).astype(np.float32))
    base = _tiny_da("none")
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    ref = base.apply({"params": params}, x)

    q8 = quantize_vit_pipeline(_tiny_da("calib"), _tiny_da("serve"), params, x)
    out = _tiny_da("serve").apply({"params": params, "q8": q8}, x)

    assert out.shape == ref.shape
    assert np.isfinite(np.asarray(out)).all()
    m = depth_metrics(out + 1e-3, ref + 1e-3, align="affine")
    assert float(m["delta1"]) > 0.95, dict(
        (k, float(v)) for k, v in m.items()
    )


def test_prune_quantized_kernels(rng):
    """Serving bundles drop the full-precision kernels of quantized layers
    (serve mode reads only bias + q8) while keeping everything else."""
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        prune_quantized_kernels,
    )

    x = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    calib_m = QuantDense(8, mode="calib", dtype=jnp.float32)
    serve_m = QuantDense(8, mode="serve", dtype=jnp.float32)
    params = calib_m.init(jax.random.PRNGKey(0), x)["params"]
    stats = calibrate(calib_m, {"params": params}, x)
    q8s = jax.eval_shape(serve_m.init, jax.random.PRNGKey(0), x)["q8"]
    q8 = build_q8(q8s, params, stats)

    tree = {"dense": dict(params), "other": {"kernel": jnp.ones((2, 2))}}
    pruned = prune_quantized_kernels(tree, {"dense": q8})
    assert "kernel" not in pruned["dense"] and "bias" in pruned["dense"]
    assert "kernel" in pruned["other"]  # non-quantized params untouched

    y_q = serve_m.apply({"params": pruned["dense"], "q8": q8}, x)
    assert np.isfinite(np.asarray(y_q)).all()


def test_calib_images_accepted_by_every_int8_family():
    """Every family with an int8 path accepts calib_images (the --calib-dir
    CLI plumbing): domain-image calibration must not be DA-only."""
    import inspect

    from monocular_depth_estimation_trt_tpu import registry

    assert len(registry.INT8_FAMILIES) == 13  # every ViT-backbone family
    for name in sorted(registry.INT8_FAMILIES):
        fn = getattr(registry, name)
        sig = inspect.signature(fn)
        src = inspect.getsource(fn)
        # explicit param, explicit forward, or blind **kw passthrough to a
        # _build helper that takes it
        ok = ("calib_images" in sig.parameters
              or "calib_images" in src
              or ("**kw" in src and any(
                  p.kind is inspect.Parameter.VAR_KEYWORD
                  for p in sig.parameters.values())))
        assert ok, f"{name} does not plumb calib_images"


def test_registry_int8_custom_calib_images(monkeypatch, rng):
    """build_pipeline(..., calib_images=[...]) calibrates on the given
    domain images (scales differ from the default set; output still tracks
    fp32)."""
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
    m = tiny(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 56, 56, 3)))["params"]
    domain = [rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
              for _ in range(2)]
    pipe = build_pipeline("depth_anything_v2", encoder="vits",
                          precision="int8", input_size=56, params=params,
                          calib_images=domain)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = pipe(img)["depth"]
    assert np.isfinite(out).all()

    pipe_f = build_pipeline("depth_anything_v2", encoder="vits",
                            precision="fp32", input_size=56, params=params)
    c = np.corrcoef(out.ravel(), pipe_f(img)["depth"].ravel())[0, 1]
    assert c > 0.98, c


def test_int8_unsupported_family_clear_error():
    """precision='int8' on a family without a quant path raises a clear
    ValueError (not a raw KeyError) from compute_dtype."""
    from monocular_depth_estimation_trt_tpu.config import compute_dtype

    with pytest.raises(ValueError, match="int8"):
        compute_dtype("int8")


def test_metric3d_int8_quant(rng):
    """Metric3D V2 (the zoo's most compute-bound family) quantizes through
    the generic bundle path: pruned serving bundle, output tracks fp32."""
    from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import (
        Metric3DConfig,
        Metric3DV2,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        as_variables,
        quantize_model_bundle,
    )

    cfg = ViTConfig(dim=64, depth=4, num_heads=4, pretrain_img_size=70)

    def mk(quant):
        return Metric3DV2(
            encoder="tiny", iters=2, dtype=jnp.float32, attn_impl="xla",
            quant=quant,
            cfg=Metric3DConfig(
                vit_config=cfg, features=16, out_channels=(8, 16, 32, 32),
                out_indices=(0, 1, 2, 3), hidden=32, upsample_factor=7,
            ),
        )

    x = jnp.asarray(rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.5)
    base = mk("none")
    params = base.init(jax.random.PRNGKey(1), x)["params"]
    ref = base.apply({"params": params}, x)

    serve = mk("serve")
    bundle = quantize_model_bundle(serve, params, (x,))
    # quantized kernels pruned from the bundle (attn qkv is a QuantDense)
    blk0 = bundle["params"]["encoder"]["blocks_0"]["attn"]["qkv"]
    assert "kernel" not in blk0 and "bias" in blk0
    out = serve.apply(as_variables(bundle), x)

    d_ref = np.asarray(ref["depth"]).ravel()
    d_q = np.asarray(out["depth"]).ravel()
    assert np.isfinite(d_q).all()
    c = np.corrcoef(d_q, d_ref)[0, 1]
    assert c > 0.98, c


def test_vggt_int8_quant(rng):
    """VGGT (the zoo's largest weight footprint) quantizes through the
    generic bundle path: alternating-attention qkv/proj/mlp + the DINOv2
    extractor go int8; DPT/camera heads stay full-precision."""
    from golden_specs import _vggt_cfg
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        as_variables,
        quantize_model_bundle,
    )

    def mk(quant):
        return VGGT(cfg=_vggt_cfg(), dtype=jnp.float32, attn_impl="xla",
                    with_camera=True, quant=quant)

    x = jnp.asarray(
        rng.standard_normal((1, 2, 70, 70, 3)).astype(np.float32) * 0.3
    )
    base = mk("none")
    params = base.init(jax.random.PRNGKey(3), x)["params"]
    ref = base.apply({"params": params}, x)

    serve = mk("serve")
    bundle = quantize_model_bundle(serve, params, (x,))
    agg = bundle["params"]["aggregator"]
    assert "kernel" not in agg["frame_0"]["attn"]["qkv"]  # pruned
    # heads stay full-precision: no q8 entries outside the aggregator
    assert set(bundle["q8"].keys()) == {"aggregator"}
    out = serve.apply(as_variables(bundle), x)

    for key in ("depth", "pose_enc"):
        r = np.asarray(ref[key]).ravel()
        q = np.asarray(out[key]).ravel()
        assert np.isfinite(q).all()
        c = np.corrcoef(q, r)[0, 1]
        assert c > 0.98, (key, c)


def test_registry_vggt_int8_pipeline(rng):
    """precision="int8" through the VGGT registry builder: single-image
    forward and the S-view engine both serve the quantized bundle."""
    from golden_specs import _vggt_cfg
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT
    from monocular_depth_estimation_trt_tpu.registry import _build_vggt

    cfg = _vggt_cfg()
    base = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla", with_camera=True)
    params = base.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 1, 70, 70, 3))
    )["params"]
    pipe = _build_vggt("vggt", 70, "int8", "xla", params, vggt_cfg=cfg)
    assert "q8" in pipe.params

    img = rng.integers(0, 255, (80, 90, 3), dtype=np.uint8)
    out = pipe(img)
    assert out["depth"].shape == (80, 90)
    assert np.isfinite(out["depth"]).all()

    views = rng.integers(0, 255, (2, 70, 70, 3), dtype=np.uint8)
    mv = pipe.multi_view(views)
    assert mv["depth"].shape == (2, 70, 70)
    assert np.isfinite(np.asarray(mv["depth"])).all()


def test_int8_composes_with_tensor_parallel(rng):
    """int8 serving + --device-mesh TP: the q8 collection's kernel_q shards
    with the same column/row layout as the kernel it replaces (the TP rules
    match by path; `attn/qkv/kernel` also matches `kernel_q`), and numerics
    are preserved across the 8-device mesh."""
    from golden_specs import _vggt_cfg
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT
    from monocular_depth_estimation_trt_tpu.parallel.mesh import get_mesh
    from monocular_depth_estimation_trt_tpu.registry import _build_vggt

    cfg = _vggt_cfg()
    base = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla", with_camera=True)
    params = base.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 1, 70, 70, 3))
    )["params"]
    pipe = _build_vggt("vggt", 70, "int8", "xla", params, vggt_cfg=cfg)

    img = rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
    ref = np.asarray(pipe(img)["depth"])

    mesh = get_mesh((1, 8), ("data", "model"))
    pipe.apply_mesh(mesh)
    kq = pipe.params["q8"]["aggregator"]["frame_0"]["attn"]["qkv"]["kernel_q"]
    assert not kq.sharding.is_fully_replicated  # column-sharded over model

    out = np.asarray(pipe(img)["depth"])
    # the all-reduce reorders f32 partial sums; near an int8 rounding
    # boundary that flips a quantization level, so bitwise equality is not
    # expected — gate on near-perfect agreement instead
    c = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, c
    rel = float(np.median(np.abs(out - ref)) / np.median(np.abs(ref)))
    assert rel < 0.01, rel


def test_registry_int8_pipeline(monkeypatch, rng):
    """precision="int8" builds a serving pipeline whose output tracks the
    bf16 pipeline's (same converted params, same engine surface)."""
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
    # vits-class encoders auto-route int8 -> bf16 (measured regression,
    # registry.resolve_int8_precision); force int8 — this test exercises
    # the quant machinery itself
    monkeypatch.setenv("MDET_FORCE_INT8", "1")

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    # explicit live params: the store's benchmark-random init can die
    # through the ReLU head (constant clamp-floor output -> NaN corrcoef)
    m = tiny(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 56, 56, 3)))["params"]
    pipe_q = build_pipeline("depth_anything_v2", encoder="vits",
                            precision="int8", input_size=56, params=params)
    pipe_f = build_pipeline("depth_anything_v2", encoder="vits",
                            precision="fp32", input_size=56, params=params)
    assert isinstance(pipe_q.params, dict) and "q8" in pipe_q.params
    assert pipe_q.spec.artifact_name() != pipe_f.spec.artifact_name()

    out_q = pipe_q(img)["depth"]
    out_f = pipe_f(img)["depth"]
    assert out_q.shape == out_f.shape
    c = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert c > 0.98, c


def test_int8_bundle_cold_start_cache(monkeypatch, rng, tmp_path):
    """Once an int8 bundle is cached, a rebuild serves it directly without
    loading the full-precision params (cold-start I/O halves for big
    models)."""
    import monocular_depth_estimation_trt_tpu.models.depth_anything_v2 as da_mod
    import monocular_depth_estimation_trt_tpu.registry as registry
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.weights import store

    real = da_mod.DepthAnythingV2
    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=56)

    def tiny(encoder="vits", **kw):
        kw.update(vit_config=cfg, head_features=16,
                  head_out_channels=(8, 16, 32, 32), out_indices=(0, 1, 0, 1))
        return real(encoder="tiny", **kw)

    monkeypatch.setattr(da_mod, "DepthAnythingV2", tiny)
    monkeypatch.setenv("MDET_FORCE_INT8", "1")  # bypass the vits routing guard
    # isolate the cache dir for this test
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))

    m = tiny(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 56, 56, 3)))["params"]
    name = registry.build_pipeline(
        "depth_anything_v2", encoder="vits", precision="bf16", input_size=56,
        params=params,
    ).spec.artifact_name()
    store.save_params(name, params)  # as if converted earlier

    # first int8 build: store params -> calibrate -> bundle cached
    pipe1 = registry.build_pipeline("depth_anything_v2", encoder="vits",
                                    precision="int8", input_size=56)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out1 = pipe1(img)["depth"]

    # second build: full-precision resolution must NOT be touched
    def boom(*a, **kw):
        raise AssertionError("full-precision params loaded on a bundle hit")

    monkeypatch.setattr(store, "get_or_convert_params", boom)
    monkeypatch.setattr(registry, "_calibration_images",
                        lambda *a, **kw: boom())
    pipe2 = registry.build_pipeline("depth_anything_v2", encoder="vits",
                                    precision="int8", input_size=56)
    out2 = pipe2(img)["depth"]
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)


def test_cli_quantcheck(monkeypatch, rng, tmp_path, capsys):
    """`mdet quantcheck` prints the int8-vs-bf16 metric line and gates on
    --min-delta1 via the exit code."""
    import cv2

    import monocular_depth_estimation_trt_tpu.models.depth_anything_v2 as da_mod
    from monocular_depth_estimation_trt_tpu import cli
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    real = da_mod.DepthAnythingV2
    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=56)

    def tiny(encoder="vits", **kw):
        kw.update(vit_config=cfg, head_features=16,
                  head_out_channels=(8, 16, 32, 32), out_indices=(0, 1, 0, 1))
        return real(encoder="tiny", **kw)

    monkeypatch.setattr(da_mod, "DepthAnythingV2", tiny)
    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path / "cache"))
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(2):
        cv2.imwrite(str(imgs / f"i{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    rc = cli.main(["quantcheck", "depth_anything_v2", "--encoder", "vits",
                   "--images", str(imgs), "--min-delta1", "0.5",
                   "--allow-random-weights"])
    import json

    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["images"] == 2 and "delta1" in rep and "corr" in rep
    assert rc == 0

    # impossible gate -> exit 3
    rc = cli.main(["quantcheck", "depth_anything_v2", "--encoder", "vits",
                   "--images", str(imgs), "--min-delta1", "1.01",
                   "--allow-random-weights"])
    assert rc == 3


def test_qat_mode_fake_quant_with_gradients(rng):
    """QAT mode: forward sees the quantization grid (output matches the
    serve-mode numerics closely), backward sees identity (finite, nonzero
    grads through the STE)."""
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    qat_m = QuantDense(16, mode="qat", dtype=jnp.float32)
    params = qat_m.init(jax.random.PRNGKey(0), x)["params"]

    base = QuantDense(16, mode="calib", dtype=jnp.float32)
    y_f = base.apply({"params": params}, x)
    y_qat = qat_m.apply({"params": params}, x)
    rel = float(jnp.max(jnp.abs(y_f - y_qat)) /
                (jnp.max(jnp.abs(y_f)) + 1e-9))
    assert 0.0 < rel < 0.05, rel  # quantization-grained, not identical

    def loss(p):
        return jnp.sum(qat_m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    gk = np.asarray(g["kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).max() > 0  # STE flows


def test_int8_routing_guard(monkeypatch):
    """Memory-bound small encoders auto-route int8 -> bf16 at build unless
    MDET_FORCE_INT8=1 (round-4 verdict item 7: vits int8 measured 0.90x its
    bf16 twin, docs/QUANT.md M-starvation ceiling)."""
    from monocular_depth_estimation_trt_tpu.registry import (
        resolve_int8_precision,
    )

    monkeypatch.delenv("MDET_FORCE_INT8", raising=False)
    assert resolve_int8_precision("depth_anything_v2", "vits", "int8") == "bf16"
    assert resolve_int8_precision("moge2", "vits", "int8") == "bf16"
    assert resolve_int8_precision("dinov3", "vits16", "int8") == "bf16"
    # non-int8 and big encoders pass through untouched
    assert resolve_int8_precision("depth_anything_v2", "vits", "bf16") == "bf16"
    assert resolve_int8_precision("depth_anything_v2", "vitl", "int8") == "int8"
    monkeypatch.setenv("MDET_FORCE_INT8", "1")
    assert resolve_int8_precision("depth_anything_v2", "vits", "int8") == "int8"


def test_int8_routing_guard_in_builder(monkeypatch, capsys):
    """build_pipeline(precision="int8") on a vits config warns and builds
    the bf16 spec."""
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    monkeypatch.delenv("MDET_FORCE_INT8", raising=False)
    # the restoring context manager, NOT set_allow_random_weights(False) in a
    # finally: — that would clobber the suite-wide True from conftest and make
    # every later random-init test order-dependent (the round-4 wart class)
    with allow_random_weights(True):
        pipe = build_pipeline("depth_anything_v2", encoder="vits",
                              precision="int8", input_size=56)
    assert pipe.spec.precision == "bf16"
    out = capsys.readouterr().out
    assert "auto-routing int8 -> bf16" in out
