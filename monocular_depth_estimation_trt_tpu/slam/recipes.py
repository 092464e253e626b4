"""The three SLAM recipes: MegaSaM, ViPE, WildGS-SLAM — TPU-first.

The reference stages these as README-only clone-and-run recipes around
networks this framework already serves (``later/MegaSaM/README.md`` clones
mega-sam with Depth-Anything + RAFT checkpoints; ``later/VIPE/README.md``
clones NVIDIA's video pose engine; ``later/WildGS-SLAM/README.md`` clones
the Gaussian-splat SLAM with CUDA rasterizer/lietorch extensions). Here
each recipe composes the framework's own verified components:

=============  =====================================================
recipe         composition
=============  =====================================================
megasam        DA-family disparity + RAFT flow -> keyframe LM-BA with
               focal refinement -> consistent video depth (per-frame
               affine alignment through flow; arXiv 2412.04463's CVD)
vipe           GeoCalib intrinsics init + the same flow BA + a metric
               depth channel (UniDepth) that promotes the trajectory
               and depths to meters (ViPE: pose + intrinsics + metric
               depth per frame)
wildgs_slam    the BA tracker + uncertainty-weighted Gaussian-splat
               mapping (:mod:`.gaussians`/:mod:`.mapping`) robust to
               dynamic objects (arXiv 2504.03886)
=============  =====================================================

Every jitted core (the LM solve, the mapping step) is shared, static-shape
XLA; the recipes differ only in host orchestration — which is exactly the
reference's architecture (python driver scripts around engines).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig, ModelSpec
from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
    BenchmarkReport,
    benchmark,
)
from monocular_depth_estimation_trt_tpu.slam.ba import (
    BAConfig,
    BAProblem,
    BAState,
    align_disparity,
    init_state,
    run_ba,
)
from monocular_depth_estimation_trt_tpu.slam.frontend import (
    Frontend,
    FrontendConfig,
    _bilinear,
    make_pipeline_depth_fn,
    make_pipeline_flow_fn,
    scale_coords,
)
from monocular_depth_estimation_trt_tpu.utils.logging import log


class SlamResult(NamedTuple):
    keyframe_indices: List[int]
    poses: np.ndarray  # (K, 4, 4) camera-to-world
    focal: float  # refined, in flow-resolution pixels
    keyframe_disparity: List[np.ndarray]  # aligned full-res disparity per kf
    rms_px: float
    extras: Dict[str, Any]


def _default_focal(hw: Tuple[int, int]) -> float:
    # ~53 deg horizontal FoV prior — the standard casual-video assumption
    return 0.9 * max(hw)


class _BARecipe:
    """Shared skeleton: frontend -> LM-BA -> aligned keyframe depth."""

    name = "slam"

    def __init__(
        self,
        flow_fn: Optional[Callable] = None,
        depth_fn: Optional[Callable] = None,
        frontend_cfg: FrontendConfig = FrontendConfig(),
        ba_cfg: BAConfig = BAConfig(optimize_focal=True),
        **kw,
    ):
        self._flow_fn = flow_fn
        self._depth_fn = depth_fn
        self.frontend_cfg = frontend_cfg
        self.ba_cfg = ba_cfg
        self.spec = ModelSpec(model=self.name, input_hw=(288, 512), precision="fp32")
        self._solve_cache: Dict[Tuple, Callable] = {}

    # lazy heavy deps -----------------------------------------------------
    def _build_deps(self) -> None:
        from monocular_depth_estimation_trt_tpu.registry import build_pipeline

        if self._flow_fn is None:
            self._flow_fn = make_pipeline_flow_fn(build_pipeline("raft"))
        if self._depth_fn is None:
            self._depth_fn = make_pipeline_depth_fn(
                build_pipeline("depth_anything_v2", encoder="vits")
            )

    def _frontend(self) -> Frontend:
        self._build_deps()
        return Frontend(self._flow_fn, self._depth_fn, self.frontend_cfg)

    def _solver(self, image_hw: Tuple[int, int], cfg: BAConfig) -> Callable:
        key = (image_hw, cfg)
        if key not in self._solve_cache:
            self._solve_cache[key] = jax.jit(
                functools.partial(run_ba, image_hw=image_hw, cfg=cfg)
            )
        return self._solve_cache[key]

    # main API ------------------------------------------------------------
    def run(
        self, frames: Sequence[np.ndarray], focal: Optional[float] = None
    ) -> SlamResult:
        fe = self._frontend()
        kf = fe.select_keyframes(frames)
        log(f"{self.name}: {len(frames)} frames -> {len(kf)} keyframes")
        prob, aux = fe.build_problem(frames, kf)
        fh, fw = aux["flow_hw"]
        focal_init = float(focal) if focal else _default_focal((fh, fw))
        state0 = init_state(len(kf))
        solve = self._solver((fh, fw), self.ba_cfg)
        state, info = solve(prob, state0, jnp.float32(focal_init))
        state = jax.device_get(state)
        rms = float(info["rms_px"])
        f_ref = focal_init * float(np.exp(state.log_focal))
        log(f"{self.name}: BA rms {rms:.3f} px, focal {f_ref:.1f} px")

        aligned = [
            np.exp(state.log_scale[i]) * d + state.shift[i]
            for i, d in enumerate(aux["full_disparity"])
        ]
        return SlamResult(
            keyframe_indices=list(kf),
            poses=np.asarray(state.poses),
            focal=f_ref,
            keyframe_disparity=aligned,
            rms_px=rms,
            extras={"aux": aux, "state": state, "cost": np.asarray(info["cost"])},
        )

    # consistent video depth (MegaSaM's CVD stage) ------------------------
    def consistent_video_depth(
        self, frames: Sequence[np.ndarray], result: SlamResult
    ) -> List[np.ndarray]:
        """Per-frame affine alignment of mono disparity against the nearest
        keyframe's BA-consistent depth, matched through dense flow — the
        recipe-level CVD pass. Returns aligned full-res disparity per frame."""
        fe = self._frontend()
        kfs = result.keyframe_indices
        out: List[np.ndarray] = []
        for i, frame in enumerate(frames):
            nearest = int(np.argmin([abs(i - k) for k in kfs]))
            k_idx = kfs[nearest]
            kf_disp = result.keyframe_disparity[nearest]
            if i == k_idx:
                out.append(kf_disp)
                continue
            disp = np.asarray(self._depth_fn(np.asarray(frame)))
            if not self.frontend_cfg.depth_is_disparity:
                disp = 1.0 / np.maximum(disp, 1e-6)
            disp = disp / (float(np.median(disp)) or 1.0)
            flow = np.asarray(self._flow_fn(np.asarray(frame), np.asarray(frames[k_idx])))
            fh, fw = flow.shape[:2]
            dh, dw = disp.shape[:2]
            st = self.frontend_cfg.grid_stride
            us = np.arange(st // 2, fw, st, dtype=np.float32)
            vs = np.arange(st // 2, fh, st, dtype=np.float32)
            uu, vv = np.meshgrid(us, vs)
            pu, pv = uu.ravel(), vv.ravel()
            fg = _bilinear(flow, pu, pv)
            tu, tv = pu + fg[:, 0], pv + fg[:, 1]
            kh, kw = kf_disp.shape[:2]
            tgt_disp = _bilinear(kf_disp, scale_coords(tu, fw, kw),
                                 scale_coords(tv, fh, kh))
            own = _bilinear(disp, scale_coords(pu, fw, dw),
                            scale_coords(pv, fh, dh))
            inside = (tu >= 0) & (tu <= fw - 1) & (tv >= 0) & (tv <= fh - 1)
            w = inside.astype(np.float32)
            s, q = align_disparity(
                jnp.asarray(own),
                1.0 / jnp.maximum(jnp.asarray(tgt_disp), 1e-6),
                jnp.asarray(w),
            )
            out.append(float(s) * disp + float(q))
        return out

    # bench ---------------------------------------------------------------
    def _synthetic_problem(self, in_hw: Tuple[int, int], k: int = 8):
        """Deterministic, representative BA problem at in_hw's grid size."""
        st = self.frontend_cfg.grid_stride
        rng = np.random.default_rng(0)
        h, w = in_hw
        us = np.arange(st // 2, w, st, dtype=np.float32)
        vs = np.arange(st // 2, h, st, dtype=np.float32)
        uu, vv = np.meshgrid(us, vs)
        pts = np.stack([uu.ravel(), vv.ravel()], -1)
        p = pts.shape[0]
        edges = []
        for i in range(k):
            for r in (1, 2):
                if i + r < k:
                    edges.append((i, i + r))
                    edges.append((i + r, i))
        edges = np.asarray(edges, np.int32)
        e = edges.shape[0]
        return BAProblem(
            points_uv=jnp.asarray(pts),
            idepth=jnp.asarray(rng.uniform(0.3, 1.5, (k, p)).astype(np.float32)),
            edges=jnp.asarray(edges),
            flow=jnp.asarray(rng.normal(0, 4, (e, p, 2)).astype(np.float32)),
            weight=jnp.asarray(rng.uniform(0.5, 1, (e, p)).astype(np.float32)),
        )

    def benchmark(
        self, in_hw: Tuple[int, int], config: Optional[BenchmarkConfig] = None
    ) -> BenchmarkReport:
        """Times the jitted LM-BA solve (the recipe's hot kernel) on a
        synthetic problem at ``in_hw``'s grid resolution; K=8 keyframes,
        radius-2 graph — the steady-state tracking workload."""
        prob = self._synthetic_problem(in_hw)
        k = prob.idepth.shape[0]
        state0 = init_state(k)
        solve = self._solver(in_hw, self.ba_cfg)
        focal = jnp.float32(_default_focal(in_hw))

        def step(pr, st):
            out_state, info = solve(pr, st, focal)
            return info["rms_px"]

        # AOT-compile and stash the executable so bench_all's roofline bound
        # can read cost/memory analysis (recipes have no Engine registry the
        # way DepthPipeline._engines does)
        compiled = jax.jit(step).lower(prob, state0).compile()
        self._bench_compiled = [compiled]
        return benchmark(
            compiled, (prob, state0), config=config,
            name=self.spec.artifact_name(),
        )

    # make `mdet run <recipe>` fail with guidance, not an AttributeError
    def __call__(self, *a, **kw):
        raise RuntimeError(
            f"'{self.name}' is a video SLAM recipe — use `mdet slam "
            f"{self.name} --video ...` (or .run(frames)) instead of "
            "single-image inference"
        )


class MegaSaMPipeline(_BARecipe):
    """MegaSaM: casual-video structure + motion (``later/MegaSaM/README.md``;
    arXiv 2412.04463). Mono-depth-anchored dense-flow BA with focal
    refinement and flow-consistency motion weights, then consistent video
    depth via per-frame affine alignment."""

    name = "megasam"


class ViPEPipeline(_BARecipe):
    """ViPE: video pose engine (``later/VIPE/README.md``): camera intrinsics
    (GeoCalib), SLAM-scale poses, and METRIC depth per frame. The BA runs in
    relative units; a metric-depth channel (UniDepth by default) then fixes
    the global scale by robust median ratio over keyframes."""

    name = "vipe"

    def __init__(self, *a, metric_depth_fn: Optional[Callable] = None,
                 calib_fn: Optional[Callable] = None, **kw):
        super().__init__(*a, **kw)
        self._metric_fn = metric_depth_fn
        self._calib_fn = calib_fn

    def _build_metric(self) -> Callable:
        if self._metric_fn is None:
            from monocular_depth_estimation_trt_tpu.registry import build_pipeline

            pipe = build_pipeline("unidepth_v2", encoder="vitb")

            def fn(frame: np.ndarray) -> np.ndarray:
                return np.asarray(pipe(frame)["depth"])

            self._metric_fn = fn
        return self._metric_fn

    def _build_calib(self) -> Callable:
        if self._calib_fn is None:
            from monocular_depth_estimation_trt_tpu.registry import build_pipeline

            pipe = build_pipeline("geocalib")

            def fn(frame: np.ndarray) -> float:
                return float(np.asarray(pipe(frame)["focal"]))

            self._calib_fn = fn
        return self._calib_fn

    def run(
        self, frames: Sequence[np.ndarray], focal: Optional[float] = None
    ) -> SlamResult:
        if focal is None:
            calib = self._build_calib()
            f_img = calib(np.asarray(frames[0]))
            # GeoCalib reports focal in original-image pixels; the BA wants
            # flow-resolution pixels — probe the flow net's output shape
            h0 = np.asarray(frames[0]).shape[0]
            self._build_deps()
            f0 = np.asarray(frames[0])
            fh = np.asarray(self._flow_fn(f0, f0)).shape[0]
            focal = f_img * (fh / h0)
            log(f"vipe: GeoCalib focal {f_img:.1f} px (image) -> "
                f"{focal:.1f} px (flow res)")
        res = super().run(frames, focal=focal)

        # metric promotion: median ratio between metric depth and BA depth
        metric = self._build_metric()
        ratios = []
        for n, k_idx in enumerate(res.keyframe_indices):
            md = np.asarray(metric(np.asarray(frames[k_idx])))
            ba_depth = 1.0 / np.maximum(res.keyframe_disparity[n], 1e-6)
            bh, bw = ba_depth.shape[:2]
            if md.shape != ba_depth.shape:
                yy = (np.arange(bh) + 0.5) * (md.shape[0] / bh) - 0.5
                xx = (np.arange(bw) + 0.5) * (md.shape[1] / bw) - 0.5
                md = _bilinear(md, *np.meshgrid(xx, yy))
            valid = (md > 1e-3) & (ba_depth > 1e-3) & (ba_depth < 1e3)
            if valid.sum() > 16:
                ratios.append(np.median(md[valid] / ba_depth[valid]))
        scale = float(np.median(ratios)) if ratios else 1.0
        log(f"vipe: metric scale {scale:.3f}")
        poses = res.poses.copy()
        poses[:, :3, 3] *= scale
        disp = [d / scale for d in res.keyframe_disparity]
        extras = dict(res.extras)
        extras["metric_scale"] = scale
        return res._replace(
            poses=poses, keyframe_disparity=disp, extras=extras
        )


class WildGSSLAMPipeline(_BARecipe):
    """WildGS-SLAM: the BA tracker + uncertainty-weighted Gaussian-splat
    mapping (``later/WildGS-SLAM/README.md``; arXiv 2504.03886). Dynamic
    content is suppressed twice: flow-consistency weights in tracking,
    learned per-pixel uncertainty in mapping."""

    name = "wildgs_slam"

    def __init__(self, *a, map_hw: Tuple[int, int] = (144, 256),
                 max_gaussians: int = 32768, mapping_iters: int = 40,
                 k_per_tile: int = 32, **kw):
        super().__init__(*a, **kw)
        self.map_hw = map_hw
        self.max_gaussians = max_gaussians
        self.mapping_iters = mapping_iters
        self.k_per_tile = k_per_tile

    def run(
        self, frames: Sequence[np.ndarray], focal: Optional[float] = None
    ) -> SlamResult:
        from monocular_depth_estimation_trt_tpu.slam.gaussians import (
            init_from_depth,
            insert_gaussians,
            render,
        )
        from monocular_depth_estimation_trt_tpu.slam.mapping import (
            MappingConfig,
            UncertaintyNet,
            make_mapping_step,
        )

        res = super().run(frames, focal=focal)
        mh, mw = self.map_hw
        fh, fw = res.extras["aux"]["flow_hw"]
        f_map = res.focal * (mh / fh)

        def to_map_res(img: np.ndarray, hw) -> np.ndarray:
            h, w = img.shape[:2]
            yy = (np.arange(hw[0]) + 0.5) * (h / hw[0]) - 0.5
            xx = (np.arange(hw[1]) + 0.5) * (w / hw[1]) - 0.5
            return _bilinear(img, *np.meshgrid(xx, yy))

        net = UncertaintyNet(width=16)
        cfg = MappingConfig(k_per_tile=self.k_per_tile)
        init_opt, step = make_mapping_step(net, cfg)

        gmap = None
        unc_params = None
        opt_state = None
        rgbs, depths, poses = [], [], []
        for n, k_idx in enumerate(res.keyframe_indices):
            rgb = to_map_res(
                np.asarray(frames[k_idx]).astype(np.float32) / 255.0,
                (mh, mw),
            )
            disp = np.maximum(res.keyframe_disparity[n], 1e-4)
            depth = to_map_res(1.0 / disp, (mh, mw))
            pose = jnp.asarray(res.poses[n], jnp.float32)
            seed = init_from_depth(
                jnp.asarray(rgb, jnp.float32), jnp.asarray(depth, jnp.float32),
                pose, f_map, stride=4, max_gaussians=self.max_gaussians // 4,
            )
            gmap = seed if gmap is None else insert_gaussians(gmap, seed)
            if unc_params is None:
                # capacity-stable map container
                pad = self.max_gaussians - gmap.means.shape[0]
                gmap = jax.tree_util.tree_map(
                    lambda x: jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
                    ),
                    gmap,
                )
                unc_params = net.init(
                    jax.random.PRNGKey(0), jnp.asarray(rgb, jnp.float32)
                )["params"]
                opt_state = init_opt(gmap, unc_params)
            rgbs.append(jnp.asarray(rgb, jnp.float32))
            depths.append(jnp.asarray(depth, jnp.float32))
            poses.append(pose)
            # optimize over the keyframe window (round-robin)
            loss = jnp.float32(float("nan"))  # mapping_iters=0: no loss yet
            for it in range(self.mapping_iters):
                j = it % len(rgbs)
                gmap, unc_params, opt_state, loss, _ = step(
                    gmap, unc_params, opt_state, rgbs[j], depths[j],
                    poses[j], jnp.float32(f_map),
                )
        log(f"wildgs_slam: map {int(jnp.sum(gmap.valid))} gaussians, "
            f"final mapping loss {float(loss):.4f}")

        rendered = [
            np.asarray(
                render(gmap, poses[n], f_map, (mh, mw),
                       k_per_tile=self.k_per_tile).depth
            )
            for n in range(len(poses))
        ]
        extras = dict(res.extras)
        extras.update(
            gaussians=jax.device_get(gmap),
            uncertainty_params=jax.device_get(unc_params),
            rendered_depth=rendered,
            map_hw=self.map_hw,
            map_focal=f_map,
        )
        return res._replace(extras=extras)

    def benchmark(
        self, in_hw: Tuple[int, int], config: Optional[BenchmarkConfig] = None
    ) -> BenchmarkReport:
        """Times one jitted mapping step (render + backward + Adam) at
        ``in_hw`` with the full static gaussian capacity — the recipe's hot
        loop (the CUDA rasterizer's role in the reference recipe)."""
        from monocular_depth_estimation_trt_tpu.slam.gaussians import init_from_depth
        from monocular_depth_estimation_trt_tpu.slam.mapping import (
            MappingConfig,
            UncertaintyNet,
            make_mapping_step,
        )

        h = in_hw[0] - in_hw[0] % 16
        w = in_hw[1] - in_hw[1] % 16
        rng = np.random.default_rng(0)
        depth = jnp.asarray(2.0 + rng.random((h, w)).astype(np.float32))
        rgb = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
        pose = jnp.eye(4, dtype=jnp.float32)
        focal = jnp.float32(_default_focal((h, w)))
        gmap = init_from_depth(
            rgb, depth, pose, focal, stride=2,
            max_gaussians=self.max_gaussians,
        )
        net = UncertaintyNet(width=16)
        unc_params = net.init(jax.random.PRNGKey(0), rgb)["params"]
        cfg = MappingConfig(k_per_tile=self.k_per_tile)
        init_opt, step = make_mapping_step(net, cfg)
        opt_state = init_opt(gmap, unc_params)

        def one(g, u, o):
            g2, u2, o2, loss, _ = step(g, u, o, rgb, depth, pose, focal)
            return loss

        # AOT-compile + stash for bench_all's roofline bound (see _BARecipe)
        compiled = jax.jit(one).lower(gmap, unc_params, opt_state).compile()
        self._bench_compiled = [compiled]
        return benchmark(
            compiled, (gmap, unc_params, opt_state), config=config,
            name=self.spec.artifact_name(),
        )
