"""Standard depth / flow evaluation metrics.

The reference validates by eyeballing ``[MDET] max/min`` console lines
(e.g. ``Depth_Anything_V2/onnx2trt.py:218-245``) — it ships no metric
code. This module provides the metrics the served papers report, for
validating fine-tunes (``training/``), checkpoint conversions, and
regression comparisons (``mdet eval``):

* monocular depth: AbsRel, SqRel, RMSE, RMSE_log, SiLog, δ<1.25^k —
  optionally after per-image affine (scale+shift) or median-scale
  alignment, the protocols relative-depth models are scored with;
* optical flow: end-point error and n-px accuracies.

Pure JAX, mask-weighted, fp32 — usable inside jitted eval steps as well
as from the CLI on host arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.training.losses import (
    _EPS,
    _masked,
    align_scale_shift,
)


def _median_scale(pred: jax.Array, target: jax.Array, w: jax.Array) -> jax.Array:
    """Masked median(target)/median(pred) per image (the Zhou/KITTI eval
    protocol for scale-ambiguous models). Median via fixed-shape sort with
    masked entries pushed to +inf and the index taken at count/2."""
    b = pred.shape[0]
    flat_p = pred.reshape(b, -1)
    flat_t = target.reshape(b, -1)
    flat_w = w.reshape(b, -1)
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    def med(x):
        x = jnp.where(flat_w > 0, x, big)
        x = jnp.sort(x, axis=-1)
        n = flat_w.sum(axis=-1).astype(jnp.int32)
        idx = jnp.maximum(n // 2, 0)
        return jnp.take_along_axis(x, idx[:, None], axis=-1)[:, 0]

    return med(flat_t) / jnp.maximum(med(flat_p), _EPS)


def depth_metrics(
    pred: jax.Array,
    target: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    align: str = "none",  # "none" | "affine" | "median"
) -> Dict[str, jax.Array]:
    """Per-batch mean of the standard monocular-depth metric suite.

    ``align="affine"`` applies per-image least-squares scale+shift (the
    relative-depth protocol); ``"median"`` applies median scaling (the
    metric-from-mono protocol). Metrics are computed on positive depths
    only (the mask is intersected with ``target > 0``).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    w, _ = _masked(pred, mask)
    w = w * (target > 0)

    if align == "affine":
        s, t = align_scale_shift(pred, target, w)
        pred = s[:, None, None] * pred + t[:, None, None]
    elif align == "median":
        s = _median_scale(pred, target, w)
        pred = s[:, None, None] * pred

    pred = jnp.maximum(pred, _EPS)
    n = jnp.maximum(w.sum(axis=(-2, -1)), 1.0)

    def mean(x):
        return jnp.mean((w * x).sum(axis=(-2, -1)) / n)

    err = pred - target
    ratio = jnp.maximum(pred / jnp.maximum(target, _EPS),
                        target / jnp.maximum(pred, _EPS))
    log_d = jnp.log(pred) - jnp.log(jnp.maximum(target, _EPS))
    m1 = (w * log_d).sum(axis=(-2, -1)) / n
    m2 = (w * log_d * log_d).sum(axis=(-2, -1)) / n

    return {
        "abs_rel": mean(jnp.abs(err) / jnp.maximum(target, _EPS)),
        "sq_rel": mean(err * err / jnp.maximum(target, _EPS)),
        "rmse": jnp.mean(jnp.sqrt((w * err * err).sum(axis=(-2, -1)) / n)),
        "rmse_log": jnp.mean(jnp.sqrt(
            jnp.maximum((w * log_d * log_d).sum(axis=(-2, -1)) / n, 0.0))),
        "silog": jnp.mean(100.0 * jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))),
        "delta1": mean((ratio < 1.25).astype(jnp.float32)),
        "delta2": mean((ratio < 1.25**2).astype(jnp.float32)),
        "delta3": mean((ratio < 1.25**3).astype(jnp.float32)),
    }


def flow_metrics(
    pred: jax.Array,
    target: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Optical-flow EPE and n-px accuracies.

    ``pred``/``target``: ``(B, H, W, 2)``; ``mask``: ``(B, H, W)``.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    epe = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1) + 1e-12)
    w, n = _masked(epe, mask)

    def mean(x):
        return jnp.mean((w * x).sum(axis=(-2, -1)) / n)

    return {
        "epe": mean(epe),
        "acc_1px": mean((epe < 1.0).astype(jnp.float32)),
        "acc_3px": mean((epe < 3.0).astype(jnp.float32)),
        "acc_5px": mean((epe < 5.0).astype(jnp.float32)),
    }
