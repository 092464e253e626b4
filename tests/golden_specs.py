"""Tiny-config golden builders — ONE per registered family.

SURVEY.md §4: the reference's quality gate is committed golden outputs (depth
``.npz`` + README max/min) diffed across engine rebuilds
(``Depth_Anything_V2/README.md`` "max/min" protocol). Here every registered
family pins a deterministic tiny-model forward (fixed seeds, fp32, CPU) to a
committed npz under ``tests/goldens/``. A drift beyond tolerance means a
semantic change to the model graph or the shared ops beneath it (resize, DPT
fusion, samplers, attention) — bump the golden deliberately, never silently.

Used by:
  * ``scripts/gen_goldens.py``  — (re)generate the npz fixtures
  * ``tests/test_goldens.py``   — parametrized regression comparison

Builders return a flat ``{key: np.ndarray}`` dict. Determinism comes from
fixed ``np.random.default_rng`` input seeds + fixed ``jax.random.PRNGKey``
init seeds; fp32 + attn_impl="xla" keeps CPU/TPU kernels out of the picture.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp

SPECS: Dict[str, Callable[[], Dict[str, np.ndarray]]] = {}

# Canonical tiny hyperparameters (mirror the parity tests' TINY/HEAD tables).
TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))
VGGT_VIT = dict(dim=48, depth=2, num_heads=2)
VGGT_AGG = dict(dim=64, depth=2, num_heads=4)
VGGT_LAYERS = (0, 1, 0, 1)


def golden(name: str):
    def deco(fn):
        SPECS[name] = fn
        return fn

    return deco


def _np(tree):
    return {k: np.asarray(v) for k, v in tree.items()}


def _init(model, key: int, *args):
    return jax.jit(model.init)(jax.random.PRNGKey(key), *args)["params"]


def _tiny_vit_cfg(pretrain=70, **kw):
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    return ViTConfig(**TINY, pretrain_img_size=pretrain, **kw)


# ---------------------------------------------------------------------------
# Depth Anything V2 family — one shared graph, per-family seeds/geometry so a
# regression in any family-specific config path still pins its own output.
# ---------------------------------------------------------------------------


def _da_family(seed_in: int, seed_init: int, hw) -> Dict[str, np.ndarray]:
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )

    model = DepthAnythingV2(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla",
        vit_config=_tiny_vit_cfg(),
        head_features=HEAD["features"], head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
    )
    rng = np.random.default_rng(seed_in)
    x = jnp.asarray(rng.standard_normal((1, *hw, 3)).astype(np.float32) * 0.5)
    params = _init(model, seed_init, x)
    return {"depth": np.asarray(model.apply({"params": params}, x))}


@golden("depth_anything_v2")
def g_depth_anything_v2():
    return _da_family(42, 7, (70, 70))


@golden("distill_any_depth")
def g_distill_any_depth():
    return _da_family(12, 21, (70, 84))


@golden("depth_anything_ac")
def g_depth_anything_ac():
    return _da_family(13, 22, (70, 70))


@golden("dkt")
def g_dkt():
    return _da_family(14, 23, (84, 70))


@golden("bridge")
def g_bridge():
    return _da_family(15, 24, (70, 70))


@golden("depth_anything_v3")
def g_depth_anything_v3():
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v3 import (
        DA3Config,
        DepthAnythingV3,
    )

    model = DepthAnythingV3(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla",
        cfg=DA3Config(
            vit_config=_tiny_vit_cfg(), features=HEAD["features"],
            out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        ),
    )
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.5)
    params = _init(model, 31, x)
    depth, sky = model.apply({"params": params}, x)
    return {"depth": np.asarray(depth), "sky": np.asarray(sky)}


@golden("depth_pro")
def g_depth_pro():
    import monocular_depth_estimation_trt_tpu.models.depth_pro as dp
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = dp.DepthProConfig(
        img_size=512, window=128, stride0=96, stride1=64,
        vit_config=ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                             pretrain_img_size=128),
        hook_block_ids=(0, 1),
    )
    model = dp.DepthPro(
        decoder_features=16, dims_encoder=(8, 16, 32, 32), dtype=jnp.float32,
        attn_impl="xla", cfg=cfg,
    )
    rng = np.random.default_rng(44)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)).astype(np.float32))
    params = _init(model, 44, x)
    cid, fov = model.apply({"params": params}, x)
    return {"canonical_inverse_depth": np.asarray(cid), "fov": np.asarray(fov)}


# ---------------------------------------------------------------------------
# Geometric family (UniDepth / UniK3D / Metric3D / MoGe / Metric Anything)
# ---------------------------------------------------------------------------


def _geometric(mode: str, seed: int) -> Dict[str, np.ndarray]:
    from monocular_depth_estimation_trt_tpu.models.geometric import (
        GeometricConfig,
        GeometricDepthModel,
    )

    model = GeometricDepthModel(
        encoder="tiny", mode=mode, dtype=jnp.float32, attn_impl="xla",
        cfg=GeometricConfig(
            vit_config=_tiny_vit_cfg(), decoder_dim=64,
            out_indices=HEAD["idxs"],
        ),
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.5)
    params = _init(model, seed, x)
    out = model.apply({"params": params}, x)
    return _np({k: out[k] for k in ("pts_3d", "confidence", "intrinsics")})


@golden("unidepth_v2")
def g_unidepth_v2():
    return _geometric("unidepth", 51)


@golden("unik3d")
def g_unik3d():
    return _geometric("unik3d", 52)


@golden("metric3d_v2")
def g_metric3d_v2():
    from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import (
        Metric3DConfig,
        Metric3DV2,
    )

    model = Metric3DV2(
        encoder="tiny", iters=2, dtype=jnp.float32, attn_impl="xla",
        cfg=Metric3DConfig(
            vit_config=_tiny_vit_cfg(), features=HEAD["features"],
            out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
            hidden=32, upsample_factor=7,
        ),
    )
    rng = np.random.default_rng(53)
    x = jnp.asarray(rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.5)
    params = _init(model, 53, x)
    out = model.apply({"params": params}, x)
    return _np({k: out[k] for k in ("depth", "normal", "confidence")})


def _moge(predict_normal: bool, seed: int) -> Dict[str, np.ndarray]:
    from monocular_depth_estimation_trt_tpu.models.moge2 import MoGe2, MoGeConfig

    model = MoGe2(
        encoder="tiny", num_tokens=25, predict_normal=predict_normal,
        dtype=jnp.float32, attn_impl="xla",
        cfg=MoGeConfig(
            vit_config=_tiny_vit_cfg(), proj_dim=32, up_dims=(16, 16, 8),
            out_indices=HEAD["idxs"],
        ),
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, 63, 112, 3)).astype(np.float32) * 0.5)
    params = _init(model, seed, x)
    out = model.apply({"params": params}, x)
    keys = ["points", "mask", "metric_scale"] + (
        ["normal"] if predict_normal else []
    )
    return _np({k: out[k] for k in keys})


@golden("moge2")
def g_moge2():
    return _moge(True, 54)


@golden("metric_anything")
def g_metric_anything():
    return _moge(False, 55)


# ---------------------------------------------------------------------------
# VGGT family
# ---------------------------------------------------------------------------


def _vggt_cfg(causal=False):
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    return VGGTConfig(
        dim=VGGT_AGG["dim"], depth=VGGT_AGG["depth"],
        num_heads=VGGT_AGG["num_heads"], head_layers=VGGT_LAYERS,
        encoder="vits",
        vit_config=ViTConfig(dim=VGGT_VIT["dim"], depth=VGGT_VIT["depth"],
                             num_heads=VGGT_VIT["num_heads"],
                             pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        causal=causal,
    )


def _vggt(seed: int, causal: bool, views: int, point_head: bool = False):
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT

    model = VGGT(cfg=_vggt_cfg(causal), dtype=jnp.float32, attn_impl="xla",
                 with_point_head=point_head)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.standard_normal((1, views, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = _init(model, seed, x)
    out = model.apply({"params": params}, x)
    keys = ["depth", "pose_enc"]
    if point_head:
        keys += ["world_points", "world_points_conf"]
    return _np({k: out[k] for k in keys})


@golden("vggt")
def g_vggt():
    return _vggt(61, causal=False, views=2)


@golden("streamvggt")
def g_streamvggt():
    return _vggt(62, causal=True, views=2)


@golden("litevggt")
def g_litevggt():
    return _vggt(63, causal=False, views=1)


@golden("stream3r")
def g_stream3r():
    return _vggt(64, causal=True, views=2, point_head=True)


@golden("map_anything")
def g_map_anything():
    from monocular_depth_estimation_trt_tpu.models.map_anything import (
        MapAnything,
    )

    model = MapAnything(cfg=_vggt_cfg(), dtype=jnp.float32, attn_impl="xla")
    rng = np.random.default_rng(65)
    x = jnp.asarray(rng.standard_normal((1, 2, 70, 70, 3)).astype(np.float32) * 0.4)
    params = _init(model, 65, x)
    out = model.apply({"params": params}, x)
    keys = ("ray_directions", "depth_along_ray", "conf", "mask_logits",
            "pose_enc", "metric_scaling_factor")
    return _np({k: out[k] for k in keys})


# ---------------------------------------------------------------------------
# DPT-single-head families on the tiny ViT
# ---------------------------------------------------------------------------


@golden("sidepth")
def g_sidepth():
    from monocular_depth_estimation_trt_tpu.models.sidepth import SIDepth

    model = SIDepth(
        vit_config=_tiny_vit_cfg(), head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(71)
    x = jnp.asarray(rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.4)
    params = _init(model, 71, x)
    out = model.apply({"params": params}, x)
    return _np({k: out[k] for k in ("ssi", "depth")})


@golden("dinov3")
def g_dinov3():
    from monocular_depth_estimation_trt_tpu.models.dinov3 import DINOv3Depther
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    model = DINOv3Depther(
        vit_config=ViTConfig(**TINY, patch_size=16, num_register_tokens=4,
                             rope=True, pos_embed=False, pretrain_img_size=64),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(72)
    x = jnp.asarray(rng.standard_normal((1, 48, 80, 3)).astype(np.float32))
    params = _init(model, 72, x)
    return {"depth": np.asarray(model.apply({"params": params}, x))}


@golden("geocalib")
def g_geocalib():
    from monocular_depth_estimation_trt_tpu.models.geocalib import GeoCalib

    model = GeoCalib(
        vit_config=_tiny_vit_cfg(), head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(73)
    x = jnp.asarray(rng.standard_normal((1, 70, 70, 3)).astype(np.float32))
    params = _init(model, 73, x)
    out = model.apply({"params": params}, x)
    keys = ("up_field", "latitude_field", "up_confidence",
            "latitude_confidence")
    return _np({k: out[k] for k in keys})


@golden("prior_depth_anything")
def g_prior_depth_anything():
    from monocular_depth_estimation_trt_tpu.models.prior_depth import (
        PriorDARefiner,
    )

    model = PriorDARefiner(
        vit_config=_tiny_vit_cfg(), head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(74)
    img = jnp.asarray(rng.standard_normal((1, 70, 70, 3)).astype(np.float32))
    prior = jnp.asarray(rng.uniform(0.5, 5.0, (1, 70, 70)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0.0, 2.0, (1, 70, 70)).astype(np.float32))
    params = _init(model, 74, img, prior, conf)
    d = model.apply({"params": params}, img, prior, conf)
    return {"depth": np.asarray(d)}


@golden("flashdepth")
def g_flashdepth():
    from monocular_depth_estimation_trt_tpu.models.flashdepth import (
        FlashDepth,
        flashdepth_init_state,
        flashdepth_video,
    )

    model = FlashDepth(
        vit_config=_tiny_vit_cfg(), head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(75)
    clip = jnp.asarray(rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32))
    state = flashdepth_init_state(model, 1, (5, 5))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(75), clip[:, 0], state
    )["params"]
    depth, fstate = flashdepth_video(model, params, clip)
    return {"depth": np.asarray(depth), "state_ssm": np.asarray(fstate["ssm"])}


@golden("video_depth_anything")
def g_video_depth_anything():
    from monocular_depth_estimation_trt_tpu.models.video_depth_anything import (
        VideoDepthAnything,
    )

    model = VideoDepthAnything(
        vit_config=_tiny_vit_cfg(),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"], num_heads=2,
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(76)
    clip = jnp.asarray(rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32))
    params = _init(model, 8, clip)
    return {"depth": np.asarray(model.apply({"params": params}, clip))}


@golden("cotracker3")
def g_cotracker3():
    from monocular_depth_estimation_trt_tpu.models.cotracker3 import CoTracker3

    model = CoTracker3(dim=16, d_model=32, iters=2, blocks=2, levels=2,
                       radius=2, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(77)
    frames = jnp.asarray(rng.uniform(0, 1, (1, 4, 32, 48, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(6, 26, (1, 5, 2)).astype(np.float32))
    params = _init(model, 77, frames, queries)
    out = model.apply({"params": params}, frames, queries)
    return _np({k: out[k] for k in ("tracks", "visibility")})


# ---------------------------------------------------------------------------
# Optical flow
# ---------------------------------------------------------------------------


def _pair(seed: int, hw):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.integers(0, 255, (1, *hw, 3)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, 255, (1, *hw, 3)).astype(np.float32))
    return a, b


@golden("raft")
def g_raft():
    from monocular_depth_estimation_trt_tpu.models.flow.raft import RAFT

    model = RAFT(iters=2, dtype=jnp.float32)
    i1, i2 = _pair(5, (64, 96))
    params = _init(model, 3, i1, i2)
    low, up = model.apply({"params": params}, i1, i2)
    return {"flow_low": np.asarray(low), "flow_up": np.asarray(up)}


@golden("waft")
def g_waft():
    from monocular_depth_estimation_trt_tpu.models.flow.waft import WAFT

    model = WAFT(iters=2, vit_config=_tiny_vit_cfg(), dtype=jnp.float32,
                 attn_impl="xla")
    i1, i2 = _pair(11, (70, 84))
    params = _init(model, 6, i1, i2)
    low, up = model.apply({"params": params}, i1, i2)
    return {"flow_low": np.asarray(low), "flow_up": np.asarray(up)}


@golden("neuflow")
def g_neuflow():
    from monocular_depth_estimation_trt_tpu.models.flow.neuflow import NeuFlow

    model = NeuFlow(dim=64, refine_iters_16=2, refine_iters_8=2,
                    dtype=jnp.float32)
    i1, i2 = _pair(81, (64, 96))
    params = _init(model, 81, i1, i2)
    return {"flow": np.asarray(model.apply({"params": params}, i1, i2))}


@golden("meflow")
def g_meflow():
    from monocular_depth_estimation_trt_tpu.models.flow.meflow import MeFlow

    model = MeFlow(iters=2, dtype=jnp.float32)
    i1, i2 = _pair(82, (64, 96))
    params = _init(model, 82, i1, i2)
    low, up = model.apply({"params": params}, i1, i2)
    return {"flow_low": np.asarray(low), "flow_up": np.asarray(up)}


@golden("memfof")
def g_memfof():
    from monocular_depth_estimation_trt_tpu.models.flow.memfof import MEMFOF

    model = MEMFOF(iters=2, dtype=jnp.float32)
    rng = np.random.default_rng(83)
    x = jnp.asarray(
        rng.integers(0, 255, (1, 3, 128, 192, 3)).astype(np.float32)
    )
    params = _init(model, 83, x)
    out = model.apply({"params": params}, x)
    return {"flow": np.asarray(out["flow"])}


@golden("align3r")
def g_align3r():
    from monocular_depth_estimation_trt_tpu.models.align3r import Align3R
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    model = Align3R(
        enc=ViTConfig(dim=64, depth=2, num_heads=2, patch_size=16,
                      pretrain_img_size=64),
        dec_dim=48, dec_depth=4, dec_heads=2,
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(84)
    i1 = jnp.asarray(rng.integers(0, 255, (1, 64, 80, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 255, (1, 64, 80, 3)).astype(np.float32))
    p1 = jnp.asarray(rng.uniform(0.5, 5.0, (1, 64, 80)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform(0.5, 5.0, (1, 64, 80)).astype(np.float32))
    params = _init(model, 84, i1, i2, p1, p2)
    out = model.apply({"params": params}, i1, i2, p1, p2)
    return _np({k: out[k] for k in ("pts1", "conf1", "pts2", "conf2")})


# -- SLAM recipes: pin the jitted solver cores, not the host orchestration --
# (reference later/MegaSaM, later/VIPE, later/WildGS-SLAM — README-only
# staging recipes; the numerics worth gating are the LM-BA solve and the
# differentiable splatting/mapping step.)


def _ba_closed_loop(k=4, hw=(48, 64), focal=60.0):
    """Tiny geometric problem: flows generated by the solver's own
    projection model from a fixed trajectory + surface (zero residual at the
    optimum -> a numerically stable golden)."""
    from monocular_depth_estimation_trt_tpu.slam.ba import (
        BAConfig, BAProblem, BAState, _residuals)
    from monocular_depth_estimation_trt_tpu.slam.lie import se3_exp

    rng = np.random.default_rng(90)
    h, w = hw
    us = (np.arange(8) + 0.5) * (w / 8)
    vs = (np.arange(6) + 0.5) * (h / 6)
    uu, vv = np.meshgrid(us, vs)
    pts = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1), jnp.float32)
    p = pts.shape[0]
    xis = np.cumsum(
        np.concatenate([np.full((k, 3), 0.03), rng.normal(0, 0.01, (k, 3))],
                       axis=1).astype(np.float32), axis=0)
    xis[0] = 0
    poses = se3_exp(jnp.asarray(xis))
    depth = (2.5 + 0.6 * np.sin(uu / w * 3.0) * np.cos(vv / h * 2.0)
             ).reshape(1, p).repeat(k, 0)
    edges = jnp.asarray(
        [(i, j) for i in range(k) for j in range(k)
         if 0 < abs(i - j) <= 2], jnp.int32)
    st_gt = BAState(poses=poses, log_scale=jnp.zeros((k,)),
                    shift=jnp.zeros((k,)), log_focal=jnp.zeros(()))
    prob0 = BAProblem(
        points_uv=pts, idepth=jnp.asarray(1.0 / depth, jnp.float32),
        edges=edges, flow=jnp.zeros((edges.shape[0], p, 2), jnp.float32),
        weight=jnp.ones((edges.shape[0], p), jnp.float32))
    center = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
    flow = _residuals(st_gt, prob0, jnp.float32(focal), center, BAConfig())
    return prob0._replace(flow=flow), focal, hw


@golden("megasam")
def g_megasam():
    from monocular_depth_estimation_trt_tpu.slam.ba import (
        BAConfig, init_state, run_ba)

    prob, focal, hw = _ba_closed_loop()
    cfg = BAConfig(iters=12, optimize_focal=False)
    final, info = run_ba(prob, init_state(4), focal, hw, cfg)
    return {"poses": np.asarray(final.poses),
            "log_scale": np.asarray(final.log_scale),
            "shift": np.asarray(final.shift),
            "rms_px": np.asarray(info["rms_px"])}


@golden("vipe")
def g_vipe():
    from monocular_depth_estimation_trt_tpu.slam.ba import (
        BAConfig, align_disparity, init_state, run_ba)

    prob, focal, hw = _ba_closed_loop()
    cfg = BAConfig(iters=16, optimize_focal=True, focal_prior=1e-4)
    final, info = run_ba(prob, init_state(4), focal * 1.1, hw, cfg)
    rng = np.random.default_rng(91)
    disp = jnp.asarray(rng.uniform(0.2, 1.0, (64,)), jnp.float32)
    s, q = align_disparity(disp, 1.0 / (1.4 * disp + 0.05),
                           jnp.ones_like(disp))
    return {"poses": np.asarray(final.poses),
            "log_focal": np.asarray(final.log_focal),
            "rms_px": np.asarray(info["rms_px"]),
            "align": np.asarray([s, q])}


@golden("wildgs_slam")
def g_wildgs_slam():
    from monocular_depth_estimation_trt_tpu.slam.gaussians import (
        init_from_depth, render)
    from monocular_depth_estimation_trt_tpu.slam.mapping import (
        MappingConfig, UncertaintyNet, make_mapping_step)

    rng = np.random.default_rng(92)
    hw = (16, 32)
    depth = jnp.asarray(2.0 + rng.random(hw).astype(np.float32))
    rgb = jnp.asarray(rng.random((*hw, 3)).astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32)
    focal = jnp.float32(30.0)
    gmap = init_from_depth(rgb, depth, pose, focal, stride=2,
                           max_gaussians=256)
    net = UncertaintyNet(width=8)
    unc = net.init(jax.random.PRNGKey(92), rgb)["params"]
    init_opt, step = make_mapping_step(net, MappingConfig(k_per_tile=8))
    opt = init_opt(gmap, unc)
    for _ in range(2):
        gmap, unc, opt, loss, _aux = step(gmap, unc, opt, rgb, depth, pose,
                                          focal)
    out = render(gmap, pose, focal, hw, k_per_tile=8)
    return {"depth": np.asarray(out.depth), "color": np.asarray(out.color),
            "loss": np.asarray(loss)}
