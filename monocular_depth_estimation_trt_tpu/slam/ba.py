"""Dense-flow bundle adjustment — ONE jitted Levenberg-Marquardt program.

TPU-native replacement for the CUDA BA cores the reference's SLAM staging
recipes clone (``later/MegaSaM/README.md`` builds mega-sam's ``base``
extension; ``later/WildGS-SLAM/README.md`` builds lietorch): poses,
per-keyframe disparity scale/shift, and optionally a shared focal are
refined against dense optical-flow correspondences in a fixed-iteration
Levenberg-Marquardt loop under ``lax.scan`` — static shapes, fp32 normal
equations, no host round-trips.

The parameterization follows MegaSaM's two observations (arXiv 2412.04463):
mono depth enters as *disparity* with a per-frame affine correction
``disp' = exp(s) * disp + q``, and moving objects are down-weighted by a
per-pixel motion probability — here the forward/backward flow-consistency
weight from :func:`flow_consistency_weights`.

Design notes (TPU):
  * The state is tiny (8K+1 parameters for K keyframes) while residuals are
    dense (E edges x P grid points x 2). ``jax.jacfwd`` over the state gives
    the exact (M, D) Jacobian as D forward passes — all batched matmuls, no
    scalarization. The normal equations are a (D, D) Cholesky solve.
  * Gauge freedom (global SE(3) + global scale) is removed by a large
    diagonal prior pinning keyframe 0's pose delta and a weak zero-prior on
    the log-scales — not by slicing parameters out, which would change
    shapes between configurations.
  * LM accept/reject is branch-free: the candidate state is kept via
    ``jnp.where`` on the cost comparison, so the whole solve is one traced
    program regardless of the damping path taken.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.slam.lie import se3_apply, se3_inv, se3_retract


class BAConfig(NamedTuple):
    """Static solver configuration (hashable — safe as a jit static arg)."""

    iters: int = 24
    huber_px: float = 4.0
    optimize_focal: bool = False
    optimize_affine: bool = True
    min_disparity: float = 1e-4
    # gauge / regularization priors (units: squared-pixel cost per unit delta)
    pose0_prior: float = 1e8
    scale_prior: float = 1e-2
    shift_prior: float = 1e-1
    focal_prior: float = 1e-1
    lam_init: float = 1e-3


class BAProblem(NamedTuple):
    """Dense-flow BA inputs at a coarse grid (all arrays device-resident).

    points_uv: (P, 2) grid pixel coords shared by every keyframe.
    idepth:    (K, P) mono disparity sampled at ``points_uv``.
    edges:     (E, 2) int32 keyframe index pairs (i, j).
    flow:      (E, P, 2) flow_i->j at ``points_uv`` (pixels).
    weight:    (E, P) nonnegative per-correspondence confidence.
    """

    points_uv: jax.Array
    idepth: jax.Array
    edges: jax.Array
    flow: jax.Array
    weight: jax.Array


class BAState(NamedTuple):
    """Optimized state: c2w poses + disparity affine + log focal multiplier."""

    poses: jax.Array  # (K, 4, 4) camera-to-world
    log_scale: jax.Array  # (K,)
    shift: jax.Array  # (K,)
    log_focal: jax.Array  # () multiplier on the initial focal


def init_state(num_keyframes: int) -> BAState:
    k = num_keyframes
    return BAState(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (k, 4, 4)),
        log_scale=jnp.zeros((k,), jnp.float32),
        shift=jnp.zeros((k,), jnp.float32),
        log_focal=jnp.zeros((), jnp.float32),
    )


def flow_consistency_weights(
    flow_fwd: jax.Array, flow_bwd_at_fwd: jax.Array, sigma_px: float = 1.5
) -> jax.Array:
    """Motion-probability proxy from a forward/backward flow check.

    ``flow_bwd_at_fwd`` is the backward flow sampled at ``p + flow_fwd``.
    A static scene point satisfies ``flow_fwd + flow_bwd ~ 0``; moving
    objects and occlusions violate it, and their Gaussian down-weighting is
    the recipe-level analog of MegaSaM's learned motion-probability map.
    Shapes: (..., 2) -> (...,) in [0, 1].
    """
    err2 = jnp.sum((flow_fwd + flow_bwd_at_fwd) ** 2, axis=-1)
    return jnp.exp(-err2 / (2.0 * sigma_px * sigma_px))


def _unflatten(delta: jax.Array, k: int) -> Tuple[jax.Array, ...]:
    dpose = delta[: 6 * k].reshape(k, 6)
    dscale = delta[6 * k : 7 * k]
    dshift = delta[7 * k : 8 * k]
    dfocal = delta[8 * k]
    return dpose, dscale, dshift, dfocal


def _apply_delta(state: BAState, delta: jax.Array, cfg: BAConfig) -> BAState:
    k = state.poses.shape[0]
    dpose, dscale, dshift, dfocal = _unflatten(delta, k)
    aff = 1.0 if cfg.optimize_affine else 0.0
    foc = 1.0 if cfg.optimize_focal else 0.0
    return BAState(
        poses=se3_retract(dpose, state.poses),
        log_scale=state.log_scale + aff * dscale,
        shift=state.shift + aff * dshift,
        log_focal=state.log_focal + foc * dfocal,
    )


def _residuals(
    state: BAState,
    prob: BAProblem,
    focal_init: jax.Array,
    center_uv: jax.Array,
    cfg: BAConfig,
) -> jax.Array:
    """Reprojection residuals (E, P, 2) in pixels.

    For edge (i, j): unproject grid points of keyframe i with its corrected
    disparity, transform through ``T_j^-1 T_i``, project, and compare with
    the flow-displaced grid.
    """
    f = focal_init * jnp.exp(state.log_focal)
    cx, cy = center_uv[0], center_uv[1]

    disp = jnp.exp(state.log_scale)[:, None] * prob.idepth + state.shift[:, None]
    depth = 1.0 / jnp.maximum(disp, cfg.min_disparity)  # (K, P)

    u = prob.points_uv[:, 0]
    v = prob.points_uv[:, 1]
    rays = jnp.stack([(u - cx) / f, (v - cy) / f, jnp.ones_like(u)], axis=-1)

    i_idx = prob.edges[:, 0]
    j_idx = prob.edges[:, 1]
    pts_i = rays[None, :, :] * depth[i_idx][:, :, None]  # (E, P, 3)
    T_rel = jnp.einsum(
        "eij,ejk->eik", se3_inv(state.poses[j_idx]), state.poses[i_idx]
    )
    pts_j = se3_apply(T_rel, pts_i)  # (E, P, 3)
    z = jnp.maximum(pts_j[..., 2], 1e-3)
    proj_u = f * pts_j[..., 0] / z + cx
    proj_v = f * pts_j[..., 1] / z + cy
    target = prob.points_uv[None, :, :] + prob.flow  # (E, P, 2)
    return jnp.stack([proj_u, proj_v], axis=-1) - target


def _prior_diag(k: int, cfg: BAConfig) -> jax.Array:
    """Gauge-fixing diagonal: keyframe 0 pins BOTH the world frame (its 6
    pose dofs) and the global depth scale (its disparity scale/shift) — the
    map is expressed in units of keyframe 0's mono disparity. Without the
    latter, the global-scale direction (all depths x c, all translations
    x c) is a flat valley and the solution drifts along it."""
    pose = jnp.zeros((k, 6), jnp.float32).at[0].set(cfg.pose0_prior)
    scale = jnp.full((k,), cfg.scale_prior, jnp.float32).at[0].set(cfg.pose0_prior)
    shift = jnp.full((k,), cfg.shift_prior, jnp.float32).at[0].set(cfg.pose0_prior)
    return jnp.concatenate(
        [
            pose.reshape(-1),
            scale,
            shift,
            jnp.asarray([cfg.focal_prior], jnp.float32),
        ]
    )


def run_ba(
    prob: BAProblem,
    state: BAState,
    focal_init: jax.Array | float,
    image_hw: Tuple[int, int],
    cfg: BAConfig = BAConfig(),
) -> Tuple[BAState, dict]:
    """Damped Gauss-Newton over ``cfg.iters`` LM iterations (jittable; wrap
    in ``jax.jit(..., static_argnums=(3, 4))`` or partial out the statics).

    Returns the refined state and ``{"cost": (iters,), "rms_px": ()}``.
    """
    k = state.poses.shape[0]
    d = 8 * k + 1
    focal_init = jnp.asarray(focal_init, jnp.float32)
    center = jnp.asarray([image_hw[1] / 2.0, image_hw[0] / 2.0], jnp.float32)
    prior = _prior_diag(k, cfg)
    w_conf = jnp.maximum(prob.weight, 0.0)

    def cost_of(s: BAState) -> jax.Array:
        r = _residuals(s, prob, focal_init, center, cfg)
        rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)  # (E, P)
        # Huber rho evaluated on the residual norm
        h = jnp.where(
            rn <= cfg.huber_px,
            0.5 * rn * rn,
            cfg.huber_px * (rn - 0.5 * cfg.huber_px),
        )
        return jnp.sum(w_conf * h)

    def lm_step(carry, _):
        s, lam = carry

        def resid_flat(delta):
            r = _residuals(_apply_delta(s, delta, cfg), prob, focal_init, center, cfg)
            return r.reshape(-1)

        zero = jnp.zeros((d,), jnp.float32)
        r0 = resid_flat(zero)  # (M,)
        # IRLS Huber weights on the 2-vector residual norm, fixed for this step
        rn = jnp.sqrt(
            jnp.sum(r0.reshape(-1, 2) ** 2, axis=-1) + 1e-12
        )  # (E*P,)
        w_rob = jnp.where(rn <= cfg.huber_px, 1.0, cfg.huber_px / rn)
        w = (w_conf.reshape(-1) * w_rob)[:, None].repeat(2, 1).reshape(-1)

        J = jax.jacfwd(resid_flat)(zero)  # (M, D)
        Jw = J * w[:, None]
        H = J.T @ Jw + jnp.diag(prior)
        g = Jw.T @ r0

        def try_lam(lam_try):
            dx = -jnp.linalg.solve(H + lam_try * jnp.eye(d, dtype=H.dtype), g)
            return _apply_delta(s, dx, cfg)

        cost0 = cost_of(s)
        cand = try_lam(lam)
        cost1 = cost_of(cand)
        ok = cost1 < cost0
        s_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), cand, s
        )
        lam_next = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-6), lam * 4.0)
        return (s_next, lam_next), jnp.minimum(cost0, cost1)

    (final, _), costs = jax.lax.scan(
        lm_step, (state, jnp.asarray(cfg.lam_init, jnp.float32)), None,
        length=cfg.iters,
    )
    r = _residuals(final, prob, focal_init, center, cfg)
    wsum = jnp.sum(w_conf) + 1e-8
    rms = jnp.sqrt(jnp.sum(w_conf * jnp.sum(r * r, axis=-1)) / wsum)
    return final, {"cost": costs, "rms_px": rms}


def align_disparity(
    disp: jax.Array, target_depth: jax.Array, weight: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form weighted least squares ``min_{s,q} sum w (s*disp + q - 1/target_depth)^2``.

    The per-frame affine disparity correction used (a) to propagate the
    BA-consistent keyframe depth to in-between frames (MegaSaM's consistent
    video depth stage) and (b) to snap relative disparity onto a metric
    estimate (ViPE's metric alignment). Batched over leading axes.

    disp/target_depth/weight: (..., N). Returns (scale, shift) each (...,).
    """
    y = 1.0 / jnp.maximum(target_depth, 1e-6)
    w = jnp.maximum(weight, 0.0)
    sw = jnp.sum(w, axis=-1) + 1e-8
    sx = jnp.sum(w * disp, axis=-1)
    sy = jnp.sum(w * y, axis=-1)
    sxx = jnp.sum(w * disp * disp, axis=-1)
    sxy = jnp.sum(w * disp * y, axis=-1)
    det = sw * sxx - sx * sx
    s = jnp.where(jnp.abs(det) > 1e-10, (sw * sxy - sx * sy) / det, 1.0)
    q = (sy - s * sx) / sw
    return s, q
