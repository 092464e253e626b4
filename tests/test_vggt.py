"""VGGT: RoPE correctness, aggregator contract, multi-view shapes, TP rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.vggt import (
    VGGT,
    VGGTConfig,
    apply_rope,
    rope_2d_freqs,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

TINY_VIT = ViTConfig(dim=48, depth=2, num_heads=2, pretrain_img_size=70)
TINY_CFG = VGGTConfig(
    dim=64, depth=2, num_heads=4, num_register_tokens=4, head_layers=(0, 1, 0, 1),
    encoder="vits", vit_config=TINY_VIT,
)


def test_rope_preserves_norm_and_relative_phase(rng):
    ph, pw, hd = 3, 4, 16
    cos, sin = rope_2d_freqs(ph, pw, hd)
    q = jnp.asarray(rng.standard_normal((1, 2, ph * pw, hd)).astype(np.float32))
    rq = apply_rope(q, cos, sin)
    # rotation preserves norms
    assert np.allclose(
        np.linalg.norm(np.asarray(q), axis=-1),
        np.linalg.norm(np.asarray(rq), axis=-1),
        atol=1e-5,
    )
    # dot products depend only on relative position: q at (0,0) vs k at (0,1)
    # equals q at (0,1) vs k at (0,2) for identical underlying vectors
    v = jnp.asarray(rng.standard_normal((hd,)).astype(np.float32))
    tiled = jnp.broadcast_to(v, (1, 1, ph * pw, hd))
    r = apply_rope(tiled, cos, sin)[0, 0]
    d01 = float(jnp.dot(r[0], r[1]))
    d12 = float(jnp.dot(r[1], r[2]))
    assert abs(d01 - d12) < 1e-4


@pytest.mark.parametrize("s", [1, 2])
def test_vggt_forward_contract(rng, s):
    model = VGGT(cfg=TINY_CFG, dtype=jnp.float32, attn_impl="xla")
    x = jnp.asarray(
        rng.standard_normal((1, s, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["depth"].shape == (1, s, 70, 70)
    assert out["depth_conf"].shape == (1, s, 70, 70)
    assert out["pose_enc"].shape == (1, s, 9)
    assert np.isfinite(np.asarray(out["depth"])).all()
    # fov entries relu-activated (upstream activate_pose: fov_act="relu");
    # quaternion is unnormalized here — decoding normalizes
    fov = np.asarray(out["pose_enc"])[..., 7:9]
    assert (fov >= 0).all()
    assert (np.asarray(out["depth"]) > 0).all()
    assert (np.asarray(out["depth_conf"]) >= 1.0).all()  # conf = 1 + exp


def test_vggt_stage_pipeline_matches_fused(rng):
    """3-stage DevicePipeline == monolithic model (the reference's 3-engine
    split, VGGT/onnx2trt2.py:155-208)."""
    from monocular_depth_estimation_trt_tpu.models.vggt import build_stage_pipeline

    model = VGGT(cfg=TINY_CFG, dtype=jnp.float32, attn_impl="xla")
    x = jnp.asarray(
        rng.standard_normal((1, 1, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    pipe = build_stage_pipeline(params, TINY_CFG, dtype=jnp.float32,
                                attn_impl="xla")
    out = pipe({"views": x}, profile=True)
    assert np.allclose(np.asarray(out["depth"]), np.asarray(ref["depth"]),
                       atol=1e-5)
    assert np.allclose(np.asarray(out["pose_enc"]),
                       np.asarray(ref["pose_enc"]), atol=1e-5)
    assert set(pipe.last_stage_ms) == {"aggregator", "depth_head",
                                       "camera_head"}


def test_vggt_tp_rules_cover_aggregator():
    from monocular_depth_estimation_trt_tpu.parallel.sharding import vit_tp_rules
    from jax.sharding import PartitionSpec as P

    rules = vit_tp_rules()
    assert rules.spec_for("aggregator/frame_0/attn/qkv/kernel", 2) == P(None, "model")
    assert rules.spec_for("aggregator/global_5/mlp/fc2/kernel", 2) == P("model", None)


def test_vggt_pipeline_multi_view(rng):
    """The S-axis serving surface (_build_vggt VGGTPipeline.multi_view):
    S views -> per-view depth/conf/pose through ONE jitted program, matching
    the joint model forward (the reference's export pins S=1,
    VGGT/onnx_export.py:63)."""
    from monocular_depth_estimation_trt_tpu.registry import _build_vggt

    model = VGGT(cfg=TINY_CFG, dtype=jnp.float32, attn_impl="xla",
                 with_camera=True)
    example = jnp.zeros((1, 1, 70, 70, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), example)["params"]
    pipe = _build_vggt("vggt", 70, "fp32", "xla", params,
                       vggt_cfg=TINY_CFG, with_camera=True)

    views = rng.integers(0, 255, (3, 70, 70, 3), dtype=np.uint8)
    out = pipe.multi_view(views)
    assert out["depth"].shape == (3, 70, 70)
    assert out["depth_conf"].shape == (3, 70, 70)
    assert out["pose_enc"].shape == (3, 9)
    assert np.isfinite(out["depth"]).all()

    # parity with the joint forward on identically preprocessed views
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_pad_square,
    )

    x = preprocess_pad_square(jnp.asarray(views), 70)
    ref = model.apply({"params": pipe.params}, x[None])
    assert np.allclose(out["depth"], np.asarray(ref["depth"][0]), atol=1e-4)

    # benchmark_views reports per-frame throughput over the S-view program
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig

    rep = pipe.benchmark_views(2, BenchmarkConfig(warmup=1, iterations=2))
    assert rep.frames_per_iteration == 2
    assert rep.iterations == 2
