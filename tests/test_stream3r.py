"""STream3R: causal streaming pointmaps (reference ``later/STream3R/``).

STream3R is VGGT's head family driven causally (streaming images ->
per-frame pointmaps); here that is the upstream point head (inv_log pts3d +
expp1 conf) on the KV-cache aggregator. Gates: (1) torch-mirror parity of
the point head through ``convert_vggt`` (auto-detects ``point_head.*``
keys), (2) exact streaming == causal-joint equivalence including the point
head, (3) the registry session API.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.streamvggt import (
    StreamingVGGT,
    init_stream_cache,
)
from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_vggt

VIT = dict(dim=48, depth=2, num_heads=2)
AGG = dict(dim=64, depth=2, num_heads=4)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
LAYERS = (0, 1, 0, 1)

TINY_VIT = ViTConfig(dim=VIT["dim"], depth=VIT["depth"],
                     num_heads=VIT["num_heads"], pretrain_img_size=70)


def _cfg(causal=False):
    return VGGTConfig(
        dim=AGG["dim"], depth=AGG["depth"], num_heads=AGG["num_heads"],
        head_layers=LAYERS, encoder="vits", vit_config=TINY_VIT,
        head_features=HEAD["features"], head_out_channels=HEAD["out_channels"],
        causal=causal,
    )


def test_point_head_parity_vs_torch(rng):
    from torch_mirror_vggt import TorchVGGT

    torch.manual_seed(31)
    tm = TorchVGGT(
        vit_dim=VIT["dim"], vit_depth=VIT["depth"], vit_heads=VIT["num_heads"],
        dim=AGG["dim"], depth=AGG["depth"], num_heads=AGG["num_heads"],
        head_layers=LAYERS, grid_hw=(5, 5),
        head_features=HEAD["features"], head_out_channels=HEAD["out_channels"],
        pretrain_img=70, with_point_head=True,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = VGGT(cfg=_cfg(), dtype=jnp.float32, attn_impl="xla",
              with_point_head=True)
    params = convert_vggt(tm.state_dict(), vit_depth=VIT["depth"],
                          depth=AGG["depth"])
    assert "point_head" in params  # auto-detected from the state dict

    x = rng.standard_normal((1, 2, 70, 70, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        _, _, _, ref_pts, ref_conf = tm(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)
        )
    out = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (out["world_points"], ref_pts.numpy(), "world_points"),
        (out["world_points_conf"], ref_conf.numpy(), "world_points_conf"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"


def test_stream_point_head_matches_causal_joint(rng):
    cfg = _cfg(causal=True)
    joint = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False, with_point_head=True)
    x = jnp.asarray(
        rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(joint.init)(jax.random.PRNGKey(1), x)["params"]
    ref = joint.apply({"params": params}, x)

    stream = StreamingVGGT(cfg=cfg, max_views=4, dtype=jnp.float32,
                           attn_impl="xla", with_point_head=True)
    cache = init_stream_cache(cfg, 1, (5, 5), max_views=4, dtype=jnp.float32)
    step = jax.jit(lambda p, v, c: stream.apply({"params": p}, v, c))
    for s in range(3):
        out, cache = step(params, x[:, s], cache)
        np.testing.assert_allclose(
            np.asarray(out["world_points"]),
            np.asarray(ref["world_points"][:, s]), rtol=0, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["world_points_conf"]),
            np.asarray(ref["world_points_conf"][:, s]), rtol=0, atol=1e-3,
        )


def test_stream3r_registry_session(rng):
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    with allow_random_weights():
        pipe = build_pipeline("stream3r", input_size=70, precision="fp32",
                              vggt_cfg=_cfg(causal=True), attn_impl="xla")
    img = (rng.standard_normal((60, 80, 3)) * 40 + 127).clip(0, 255).astype(
        np.uint8
    )
    out = pipe(img)
    assert out["world_points"].shape == (60, 80, 3)
    assert np.isfinite(np.asarray(out["world_points"])).all()

    sess = pipe.stream_session(window=3)
    for _ in range(2):
        step_out = sess.step(img)
        assert step_out["world_points"].shape == (70, 70, 3)
        assert step_out["depth"].shape == (70, 70)
