"""StreamVGGT KV-cache streaming: exact equivalence with the view-causal
joint model, shared parameter tree, and sliding-window semantics.

The reference could not export StreamVGGT's streaming inference at all
(``StreamVGGT/onnx_export.py:25-55`` is single-frame); this is the rebuild
exceeding it: per-step cost independent of the window, bit-matching the
causal joint forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.streamvggt import (
    StreamingVGGT,
    init_stream_cache,
)
from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

TINY_VIT = ViTConfig(dim=48, depth=2, num_heads=2, pretrain_img_size=70)
TINY = VGGTConfig(
    dim=64, depth=2, num_heads=4, head_layers=(0, 1, 0, 1), encoder="vits",
    vit_config=TINY_VIT, causal=True,
)


# atol 1e-3: the cached path reduces softmax/matmuls over padded (-inf
# masked) key buffers, so fp32 accumulation order differs from the joint
# forward; the math is identical.
def test_stream_matches_causal_joint(rng):
    s_total = 3
    joint = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=True)
    x = jnp.asarray(
        rng.standard_normal((1, s_total, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(joint.init)(jax.random.PRNGKey(0), x)["params"]
    ref = joint.apply({"params": params}, x)

    stream = StreamingVGGT(cfg=TINY, max_views=4, dtype=jnp.float32,
                           attn_impl="xla", with_camera=True)
    cache = init_stream_cache(TINY, 1, (5, 5), max_views=4, dtype=jnp.float32)
    # the streaming model's parameter tree must be the joint model's
    sparams = jax.eval_shape(
        stream.init, jax.random.PRNGKey(0), x[:, 0], cache
    )["params"]
    ref_tree = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(sparams) == ref_tree

    step = jax.jit(lambda p, v, c: stream.apply({"params": p}, v, c))
    for s in range(s_total):
        out, cache = step(params, x[:, s], cache)
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(ref["depth"][:, s]),
            rtol=0, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["depth_conf"]), np.asarray(ref["depth_conf"][:, s]),
            rtol=0, atol=1e-3,
        )
        # the camera trunk attends across views bidirectionally, so step s
        # equals the joint causal model evaluated on the PREFIX x[:, :s+1]
        # (at the final step, prefix == full sequence)
        ref_prefix = joint.apply({"params": params}, x[:, : s + 1])
        np.testing.assert_allclose(
            np.asarray(out["pose_enc"]),
            np.asarray(ref_prefix["pose_enc"][:, s]),
            rtol=0, atol=1e-3,
        )
    np.testing.assert_allclose(
        np.asarray(out["pose_enc"]), np.asarray(ref["pose_enc"][:, -1]),
        rtol=0, atol=1e-3,
    )
    assert int(cache["t"]) == s_total


def test_stream_sliding_window_eviction(rng):
    """With max_views=2, step 3 must equal a joint causal run over the LAST
    two views only (the ring evicted view 0)."""
    joint = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False)
    x = jnp.asarray(
        rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(joint.init)(jax.random.PRNGKey(1), x[:, :1])["params"]

    stream = StreamingVGGT(cfg=TINY, max_views=2, dtype=jnp.float32,
                           attn_impl="xla", with_camera=False)
    cache = init_stream_cache(TINY, 1, (5, 5), max_views=2, dtype=jnp.float32)
    step = jax.jit(lambda p, v, c: stream.apply({"params": p}, v, c))
    for s in range(3):
        out, cache = step(params, x[:, s], cache)

    # reference: causal joint over views [1, 2]; the last view's output
    # depends only on views inside the window
    ref = joint.apply({"params": params}, x[:, 1:3])
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"][:, 1]),
        rtol=0, atol=1e-3,
    )


def test_stream_int8_matches_causal_joint_int8(rng):
    """Int8 streaming: the q8 collection calibrated on the JOINT model
    serves the streaming graph unchanged (identical param paths), and the
    stepped outputs match the view-causal joint int8 forward."""
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        as_variables,
        quantize_model_bundle,
    )

    s_total = 2
    joint = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False, quant="none")
    x = jnp.asarray(
        rng.standard_normal((1, s_total, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(joint.init)(jax.random.PRNGKey(2), x)["params"]

    serve = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False, quant="serve")
    bundle = quantize_model_bundle(serve, params, (x,))
    ref = serve.apply(as_variables(bundle), x)

    stream = StreamingVGGT(cfg=TINY, max_views=4, dtype=jnp.float32,
                           attn_impl="xla", with_camera=False, quant="serve")
    cache = init_stream_cache(TINY, 1, (5, 5), max_views=4,
                              dtype=jnp.float32)
    step = jax.jit(lambda v, va, c: stream.apply(va, v, c))
    for s in range(s_total):
        out, cache = step(x[:, s], as_variables(bundle), cache)
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(ref["depth"][:, s]),
            rtol=0, atol=2e-3,
        )


def test_streaming_session_accepts_int8_bundle(rng):
    """VGGTStreamingSession detects a {"params","q8"} bundle and serves
    the quantized streaming graph."""
    from monocular_depth_estimation_trt_tpu.apps.streaming import (
        VGGTStreamingSession,
    )
    from monocular_depth_estimation_trt_tpu.ops.quant import (
        quantize_model_bundle,
    )

    joint = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False, quant="none")
    x = jnp.zeros((1, 1, 70, 70, 3), jnp.float32)
    params = jax.jit(joint.init)(jax.random.PRNGKey(3), x)["params"]
    serve = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False, quant="serve")
    bundle = quantize_model_bundle(serve, params, (x,))

    sess = VGGTStreamingSession(bundle, cfg=TINY, window=2, input_size=70,
                                dtype=jnp.float32, attn_impl="xla")
    frame = rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
    out = sess.step(frame)
    assert np.isfinite(np.asarray(out["depth"])).all()
    out2 = sess.step(frame)
    assert np.isfinite(np.asarray(out2["depth"])).all()


def test_streamvggt_pipeline_stream_hook(rng):
    """The streamvggt pipeline exposes the run_video `.stream()` hook: a
    per-video causal session whose outputs are source-resolution depth+viz
    (pad cropped)."""
    from monocular_depth_estimation_trt_tpu.registry import _build_vggt

    joint = VGGT(cfg=TINY, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False)
    params = jax.jit(joint.init)(
        jax.random.PRNGKey(4), jnp.zeros((1, 1, 70, 70, 3))
    )["params"]
    pipe = _build_vggt("streamvggt", 70, "fp32", "xla", params,
                       vggt_cfg=TINY, with_camera=False)
    assert hasattr(pipe, "stream")

    runner = pipe.stream(window=2)
    for _ in range(2):
        frame = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        out = runner(frame, viz=True)
        assert out["depth"].shape == (60, 80)
        assert out["viz"].shape == (60, 80, 3)
        assert np.isfinite(out["depth"]).all()
