"""SLAM recipes (MegaSaM / ViPE / WildGS-SLAM): end-to-end synthetic gates.

The reference stages these as README-only clone-and-run recipes
(``later/MegaSaM/README.md``, ``later/VIPE/README.md``,
``later/WildGS-SLAM/README.md``) around depth/flow networks. Here the
recipes are exercised against an analytic world: dense flow is *generated*
by the solver's own projection model from a known trajectory + depth
surface, injected through the Frontend's callable contract — so the full
host pipeline (keyframing, edge graph, consistency weights, grid sampling,
LM-BA, CVD / metric promotion / mapping) must reproduce the ground truth.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.slam.ba import BAConfig
from monocular_depth_estimation_trt_tpu.slam.frontend import (
    Frontend,
    FrontendConfig,
    _bilinear,
    scale_coords,
)
from monocular_depth_estimation_trt_tpu.slam.lie import (
    rotation_geodesic_deg,
    se3_exp,
)
from monocular_depth_estimation_trt_tpu.slam.recipes import (
    MegaSaMPipeline,
    ViPEPipeline,
    WildGSSLAMPipeline,
)


class SyntheticWorld:
    """A smooth static surface observed by a moving camera.

    Frames carry their index in the corner pixel so the injected
    ``flow_fn``/``depth_fn`` can identify them; flows between any pair are
    computed with the same unproject->transform->project model the BA
    optimizes, giving a zero-noise closed loop.
    """

    def __init__(self, n_frames=10, flow_hw=(48, 64), depth_hw=(96, 128),
                 focal=80.0, seed=0):
        self.n = n_frames
        self.flow_hw = flow_hw
        self.depth_hw = depth_hw
        self.focal = focal
        rng = np.random.default_rng(seed)
        xis = np.zeros((n_frames, 6), np.float32)
        for i in range(1, n_frames):
            xis[i] = xis[i - 1] + np.concatenate([
                [0.05, 0.015, 0.07] + rng.normal(0, 0.01, 3),
                rng.normal(0, 0.008, 3),
            ]).astype(np.float32)
        self.poses = np.asarray(se3_exp(jnp.asarray(xis)))  # (N, 4, 4) c2w

    # surface depth as a function of normalized image coords, per frame
    def z_of(self, un, vn, i):
        return (3.0 + 0.8 * np.sin(un * 3.1) * np.cos(vn * 2.3)
                + 0.1 * np.sin(i + un * 5.0))

    def frame(self, i) -> np.ndarray:
        h, w = self.flow_hw
        img = np.full((h, w, 3), 40 + 13 * i, np.uint8)
        # index as a 12x12 block of i*25 — survives lossy video codecs
        img[:12, :12] = i * 25
        return img

    def _ident(self, img) -> int:
        block = np.asarray(img)[:12, :12, 0].astype(np.float32)
        return int(round(float(np.median(block)) / 25.0))

    def depth_grid(self, i, hw) -> np.ndarray:
        h, w = hw
        uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        return self.z_of(uu / w, vv / h, i).astype(np.float32)

    def flow_fn(self, f1, f2) -> np.ndarray:
        i, j = self._ident(f1), self._ident(f2)
        h, w = self.flow_hw
        f, cx, cy = self.focal, w / 2.0, h / 2.0
        uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        z = self.depth_grid(i, self.flow_hw)
        pts = np.stack([(uu - cx) / f * z, (vv - cy) / f * z, z], -1)
        T = np.linalg.inv(self.poses[j]) @ self.poses[i]
        pj = pts @ T[:3, :3].T + T[:3, 3]
        zj = np.maximum(pj[..., 2], 1e-3)
        return np.stack([f * pj[..., 0] / zj + cx - uu,
                         f * pj[..., 1] / zj + cy - vv], -1).astype(np.float32)

    def depth_fn_factory(self, affine=None):
        """Mono 'network': GT disparity at depth_hw, optionally corrupted by
        a per-frame affine warp the BA must undo."""

        def fn(img):
            i = self._ident(img)
            disp = 1.0 / self.depth_grid(i, self.depth_hw)
            if affine is not None:
                a, b = affine[i]
                disp = a * disp + b
            return disp.astype(np.float32)

        return fn


def _world_and_cfg(**kw):
    world = SyntheticWorld(**kw)
    # flows from per-frame analytic surfaces aren't exactly fwd/bwd
    # consistent; a large sigma keeps weights ~1 (static scene)
    cfg = FrontendConfig(grid_stride=8, kf_min_flow=2.5, kf_max_interval=4,
                         kf_stride=1, sigma_consistency=50.0)
    return world, cfg


def test_frontend_keyframes_and_problem():
    world, cfg = _world_and_cfg()
    fe = Frontend(world.flow_fn, world.depth_fn_factory(), cfg)
    frames = [world.frame(i) for i in range(world.n)]
    kf = fe.select_keyframes(frames)
    assert kf[0] == 0 and len(kf) >= 3
    assert all(b - a <= cfg.kf_max_interval for a, b in zip(kf, kf[1:]))

    prob, aux = fe.build_problem(frames, kf)
    k = len(kf)
    e, p = prob.flow.shape[:2]
    assert prob.idepth.shape == (k, p)
    assert prob.edges.shape == (e, 2) and prob.weight.shape == (e, p)
    assert aux["flow_hw"] == world.flow_hw
    # static closed-loop scene: in-frame weights should be high
    w = np.asarray(prob.weight)
    assert np.median(w) > 0.7
    # grid disparity must match the surface (median-normalized)
    d0 = 1.0 / world.depth_grid(kf[0], world.depth_hw)
    med = np.median(d0)
    pu, pv = np.asarray(prob.points_uv).T
    dh, dw = world.depth_hw
    fh, fw = world.flow_hw
    ref = _bilinear(d0 / med, scale_coords(pu, fw, dw),
                    scale_coords(pv, fh, dh))
    assert np.allclose(np.asarray(prob.idepth)[0], ref, atol=1e-5)


def test_frontend_single_keyframe_problem():
    """A low-motion clip can yield a single keyframe: the edge array must
    keep its (0, 2) shape so the BA residuals' edges[:, 0] indexing (and
    run_ba itself) still trace."""
    world, cfg = _world_and_cfg()
    fe = Frontend(world.flow_fn, world.depth_fn_factory(), cfg)
    edges = fe.build_edges(1)
    assert edges.shape == (0, 2) and edges.dtype == np.int32

    prob, aux = fe.build_problem([world.frame(0)], [0])
    assert prob.edges.shape[0] == 0 and prob.flow.shape[0] == 0
    from monocular_depth_estimation_trt_tpu.slam.ba import init_state, run_ba
    state, info = run_ba(prob, init_state(1), world.focal, world.flow_hw,
                         BAConfig(iters=2))
    assert state.poses.shape == (1, 4, 4)
    assert np.all(np.isfinite(np.asarray(state.poses)))


def test_megasam_recovers_trajectory():
    world, cfg = _world_and_cfg()
    affine = [(1.0 + 0.2 * np.sin(i), 0.01 * i) for i in range(world.n)]
    pipe = MegaSaMPipeline(
        flow_fn=world.flow_fn,
        depth_fn=world.depth_fn_factory(affine),
        frontend_cfg=cfg,
        ba_cfg=BAConfig(iters=30, optimize_focal=True, focal_prior=1e-4),
    )
    frames = [world.frame(i) for i in range(world.n)]
    res = pipe.run(frames, focal=world.focal * 1.1)  # 10% wrong focal prior

    assert res.rms_px < 0.3, res.rms_px
    assert abs(res.focal - world.focal) / world.focal < 0.05, res.focal
    # rotations are gauge-free: compare directly against GT
    gt = world.poses[res.keyframe_indices]
    rot_err = rotation_geodesic_deg(
        jnp.asarray(res.poses[:, :3, :3]), jnp.asarray(gt[:, :3, :3]))
    assert float(jnp.max(rot_err)) < 0.5, np.asarray(rot_err)
    # translations up to the global (mono-disparity) gauge scale
    t, t_gt = res.poses[:, :3, 3], gt[:, :3, 3]
    s = float(np.sum(t * t_gt) / np.maximum(np.sum(t * t), 1e-12))
    assert np.linalg.norm(s * t - t_gt) / np.linalg.norm(t_gt) < 0.05

    # the aligned keyframe disparities must agree with GT up to ONE global
    # scale (the gauge): per-frame affine corruption removed by the BA
    g = None
    for n, k_idx in enumerate(res.keyframe_indices):
        gt_disp = 1.0 / world.depth_grid(k_idx, world.depth_hw)
        rec = res.keyframe_disparity[n]
        ratio = rec / gt_disp
        if g is None:
            g = np.median(ratio)
        assert np.std(ratio) / np.mean(ratio) < 0.02
        assert abs(np.median(ratio) - g) / g < 0.05


def test_megasam_consistent_video_depth():
    world, cfg = _world_and_cfg()
    pipe = MegaSaMPipeline(
        flow_fn=world.flow_fn, depth_fn=world.depth_fn_factory(),
        frontend_cfg=cfg, ba_cfg=BAConfig(iters=20, optimize_focal=False),
    )
    frames = [world.frame(i) for i in range(world.n)]
    res = pipe.run(frames, focal=world.focal)
    cvd = pipe.consistent_video_depth(frames, res)
    assert len(cvd) == world.n
    # every frame's aligned disparity sits on the keyframes' gauge scale
    g = np.median(res.keyframe_disparity[0]
                  * world.depth_grid(res.keyframe_indices[0], world.depth_hw))
    for i, d in enumerate(cvd):
        ratio = d * world.depth_grid(i, world.depth_hw)  # rec_disp / gt_disp
        assert abs(np.median(ratio) - g) / g < 0.1, (i, np.median(ratio), g)


def test_vipe_metric_promotion():
    world, cfg = _world_and_cfg()

    def metric_fn(img):  # GT metric depth ("meters") at depth res
        return world.depth_grid(int(np.asarray(img)[0, 0, 0]), world.depth_hw)

    def calib_fn(img):  # GT focal in image px (frames ARE flow-res here)
        return world.focal

    pipe = ViPEPipeline(
        flow_fn=world.flow_fn, depth_fn=world.depth_fn_factory(),
        frontend_cfg=cfg, ba_cfg=BAConfig(iters=25, optimize_focal=True),
        metric_depth_fn=metric_fn, calib_fn=calib_fn,
    )
    frames = [world.frame(i) for i in range(world.n)]
    res = pipe.run(frames)  # no focal given -> calib channel
    assert res.rms_px < 0.3
    assert "metric_scale" in res.extras
    # after promotion, keyframe depth is metric: 1/disp ~ GT meters
    for n, k_idx in enumerate(res.keyframe_indices):
        depth = 1.0 / np.maximum(res.keyframe_disparity[n], 1e-6)
        gt = world.depth_grid(k_idx, world.depth_hw)
        err = np.median(np.abs(depth - gt) / gt)
        assert err < 0.05, (n, err)
    # ... and so are the translations (GT gauge, scale ~1)
    gt_t = world.poses[res.keyframe_indices][:, :3, 3]
    t = res.poses[:, :3, 3]
    assert np.linalg.norm(t - gt_t) / np.linalg.norm(gt_t) < 0.1


def test_wildgs_slam_maps_the_scene():
    world, cfg = _world_and_cfg(n_frames=6)
    pipe = WildGSSLAMPipeline(
        flow_fn=world.flow_fn, depth_fn=world.depth_fn_factory(),
        frontend_cfg=cfg, ba_cfg=BAConfig(iters=15, optimize_focal=False),
        map_hw=(16, 32), max_gaussians=2048, mapping_iters=6, k_per_tile=16,
    )
    frames = [world.frame(i) for i in range(world.n)]
    res = pipe.run(frames, focal=world.focal)
    rendered = res.extras["rendered_depth"]
    assert len(rendered) == len(res.keyframe_indices)
    for n, k_idx in enumerate(res.keyframe_indices):
        r = np.asarray(rendered[n])
        assert r.shape == (16, 32)
        assert np.all(np.isfinite(r)) and float(np.median(r)) > 0
        # rendered depth tracks the BA keyframe depth it was seeded from
        anchor = 1.0 / np.maximum(res.keyframe_disparity[n], 1e-4)
        ah = _bilinear(anchor,
                       *np.meshgrid(
                           (np.arange(32) + 0.5) * anchor.shape[1] / 32 - 0.5,
                           (np.arange(16) + 0.5) * anchor.shape[0] / 16 - 0.5))
        covered = r > 1e-3
        assert covered.mean() > 0.5
        rel = np.abs(r[covered] - ah[covered]) / ah[covered]
        assert np.median(rel) < 0.25, (n, float(np.median(rel)))


def test_recipe_rejects_single_image_call():
    pipe = MegaSaMPipeline()
    with pytest.raises(RuntimeError, match="mdet slam"):
        pipe(np.zeros((32, 32, 3), np.uint8))


def test_slam_registry_and_cli(tmp_path, monkeypatch):
    """`mdet slam` end-to-end through the registry with injected engines."""
    import monocular_depth_estimation_trt_tpu.registry as registry
    from monocular_depth_estimation_trt_tpu.cli import main

    world, cfg = _world_and_cfg()
    real_build = registry.build_pipeline

    def fake_build(name, **kw):
        assert name == "megasam"
        return MegaSaMPipeline(
            flow_fn=world.flow_fn, depth_fn=world.depth_fn_factory(),
            frontend_cfg=cfg, ba_cfg=BAConfig(iters=15, optimize_focal=False),
        )

    monkeypatch.setattr(registry, "build_pipeline", fake_build)

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    import cv2

    for i in range(world.n):
        cv2.imwrite(str(frames_dir / f"f{i:03d}.png"),
                    cv2.cvtColor(world.frame(i), cv2.COLOR_RGB2BGR))

    out = tmp_path / "results"
    rc = main(["slam", "megasam", "--frames", str(frames_dir),
               "--focal", str(world.focal), "--out", str(out)])
    assert rc == 0
    npzs = [p for p in os.listdir(out) if p.endswith(".npz")]
    assert len(npzs) == 1
    data = np.load(out / npzs[0])
    assert data["poses"].shape[1:] == (4, 4)
    assert data["keyframes"][0] == 0
    assert float(data["rms_px"]) < 1.0

    # registry entries exist with the documented fidelity tier
    for nm in ("megasam", "vipe", "wildgs_slam"):
        assert nm in registry.list_models()
        assert registry.get_fidelity(nm) == "approximated"
    registry.build_pipeline = real_build


def test_slam_cli_video_path(tmp_path, monkeypatch):
    """`mdet slam --video`: the frame-identity block survives mp4v encoding
    and the pipeline produces the same artifacts as the frames-dir path."""
    import cv2

    import monocular_depth_estimation_trt_tpu.registry as registry
    from monocular_depth_estimation_trt_tpu.cli import main

    world, cfg = _world_and_cfg()

    def fake_build(name, **kw):
        return MegaSaMPipeline(
            flow_fn=world.flow_fn, depth_fn=world.depth_fn_factory(),
            frontend_cfg=cfg, ba_cfg=BAConfig(iters=10, optimize_focal=False),
        )

    monkeypatch.setattr(registry, "build_pipeline", fake_build)

    h, w = world.flow_hw
    vp = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(world.n):
        writer.write(cv2.cvtColor(world.frame(i), cv2.COLOR_RGB2BGR))
    writer.release()

    out = tmp_path / "results"
    rc = main(["slam", "megasam", "--video", vp,
               "--focal", str(world.focal), "--out", str(out)])
    assert rc == 0
    npz = next(p for p in os.listdir(out) if p.endswith(".npz"))
    data = np.load(out / npz)
    assert data["poses"].shape[1:] == (4, 4)
    assert float(data["rms_px"]) < 2.0  # codec noise loosens the gate
