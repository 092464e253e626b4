"""Depth training losses — affine-invariant, metric, and distillation.

The reference framework is inference-only (no training code anywhere in
``/root/reference``; its models arrive pre-trained from upstream hubs,
e.g. ``Depth_Anything_V2/README.md:22-36``). This module goes beyond it:
the losses the served model families were *trained* with, implemented as
pure JAX functions so fine-tuning / distillation runs on the same TPU
substrate as serving.

All losses are fully vectorized and jit/grad/shard-safe: closed-form
least-squares alignment instead of masked medians (no sorts, no dynamic
shapes), masks as float weights, fp32 accumulation regardless of the
model's bf16 compute dtype.

Conventions: predictions and targets are ``(B, H, W)``; ``mask`` is an
optional ``(B, H, W)`` array (1 = valid). Relative-depth families (DA-V2,
Distill-Any-Depth, DA-AC) operate in disparity space; metric families
(Metric3D, UniDepth, Depth Pro) in log-depth space.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _masked(x: jax.Array, mask: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Return (weights, count) as fp32, broadcasting a missing mask to ones."""
    if mask is None:
        w = jnp.ones(x.shape, jnp.float32)
    else:
        w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(axis=(-2, -1)), 1.0)
    return w, n


def align_scale_shift(
    pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Per-image closed-form least-squares (scale, shift) aligning pred→target.

    Solves ``min_{s,t} Σ w (s·pred + t − target)²`` via the 2×2 normal
    equations (the MiDaS ssi-MSE alignment). Returns ``(s, t)`` each of
    shape ``(B,)``. Degenerate images (constant prediction) fall back to
    ``s=1`` and shift-only alignment.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    w, n = _masked(pred, mask)
    sum_p = (w * pred).sum(axis=(-2, -1))
    sum_t = (w * target).sum(axis=(-2, -1))
    sum_pp = (w * pred * pred).sum(axis=(-2, -1))
    sum_pt = (w * pred * target).sum(axis=(-2, -1))
    det = n * sum_pp - sum_p * sum_p
    ok = det > _EPS
    safe_det = jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (n * sum_pt - sum_p * sum_t) / safe_det, 1.0)
    t = jnp.where(ok, (sum_pp * sum_t - sum_p * sum_pt) / safe_det,
                  (sum_t - sum_p) / n)
    return s, t


def ssi_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    alignment: str = "lstsq",
) -> jax.Array:
    """Scale-and-shift-invariant loss (MiDaS / Depth-Anything family).

    Aligns the prediction to the target with the closed-form least-squares
    affine map, then takes the masked mean absolute error. Invariant to any
    affine reparameterization ``a·target + b`` (a>0) of the target — the
    property that lets relative-depth models train across datasets with
    unknown depth scale. ``alignment="none"`` skips alignment (plain L1).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if alignment == "lstsq":
        s, t = align_scale_shift(pred, target, mask)
        pred = s[:, None, None] * pred + t[:, None, None]
    w, n = _masked(pred, mask)
    err = (w * jnp.abs(pred - target)).sum(axis=(-2, -1)) / n
    # Normalize by the target's masked spread so the loss is also invariant
    # to affine maps of the *target* (batch mixes datasets of wildly
    # different disparity ranges).
    mean_t = (w * target).sum(axis=(-2, -1)) / n
    spread = (w * jnp.abs(target - mean_t[:, None, None])).sum(axis=(-2, -1)) / n
    return jnp.mean(err / jnp.maximum(spread, _EPS))


def gradient_matching_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scales: int = 4,
    align: bool = True,
) -> jax.Array:
    """Multi-scale gradient matching (MiDaS R_grad, scales by striding 2×).

    Penalizes |∂x R| + |∂y R| of the aligned residual R at ``scales``
    resolutions — sharpens depth discontinuities without constraining
    absolute values. Pure strided slicing: no resize ops, shard-safe.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if align:
        s, t = align_scale_shift(pred, target, mask)
        pred = s[:, None, None] * pred + t[:, None, None]
    w = (jnp.ones(pred.shape, jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    total = 0.0
    r, wk = pred - target, w
    for _ in range(scales):
        dx = jnp.abs(r[:, :, 1:] - r[:, :, :-1])
        wx = wk[:, :, 1:] * wk[:, :, :-1]
        dy = jnp.abs(r[:, 1:, :] - r[:, :-1, :])
        wy = wk[:, 1:, :] * wk[:, :-1, :]
        nx = jnp.maximum(wx.sum(axis=(-2, -1)), 1.0)
        ny = jnp.maximum(wy.sum(axis=(-2, -1)), 1.0)
        total = total + jnp.mean((wx * dx).sum(axis=(-2, -1)) / nx
                                 + (wy * dy).sum(axis=(-2, -1)) / ny)
        r, wk = r[:, ::2, ::2], wk[:, ::2, ::2]
    return total / scales


def silog_loss(
    pred_depth: jax.Array,
    target_depth: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    lam: float = 0.85,
    alpha: float = 10.0,
) -> jax.Array:
    """Scale-invariant log loss (Eigen et al.) for metric-depth fine-tuning.

    ``d = log(pred) − log(target)``; loss = α·√(mean d² − λ(mean d)²).
    λ=0.85 follows the metric heads the zoo serves (Metric3D / ZoeDepth
    convention). Inputs are clamped to positive depth.
    """
    pred = jnp.maximum(pred_depth.astype(jnp.float32), _EPS)
    target = jnp.maximum(target_depth.astype(jnp.float32), _EPS)
    d = jnp.log(pred) - jnp.log(target)
    w, n = _masked(d, mask)
    m1 = (w * d).sum(axis=(-2, -1)) / n
    m2 = (w * d * d).sum(axis=(-2, -1)) / n
    # sqrt has an infinite derivative at 0; a fully-masked sample or an
    # exact fit would turn the (0-valued) gradient chain into NaN and
    # poison every parameter in one optimizer step — keep the argument
    # strictly positive under grad
    var = jnp.maximum(m2 - lam * m1 * m1, 0.0)
    return jnp.mean(alpha * jnp.sqrt(var + 1e-12))


def distillation_loss(
    student: jax.Array,
    teacher: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    grad_weight: float = 0.5,
    grad_scales: int = 4,
) -> jax.Array:
    """Teacher→student disparity distillation: SSI + multi-scale gradients.

    The objective behind Distill-Any-Depth (reference
    ``later``-family / ``Distill_Any_Depth/infer.py``): the student matches
    the teacher's relative structure, not its absolute scale.
    """
    return ssi_loss(student, teacher, mask) + grad_weight * (
        gradient_matching_loss(student, teacher, mask, scales=grad_scales)
    )
