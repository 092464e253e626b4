"""Weighted Procrustes (Kabsch) rigid alignment.

Closed-form SE(3) recovery between two corresponded point sets — the pose
step of DUSt3R-family pairwise reconstruction (reference
``later/Align3R/README.md``: "two 2d images -> depth, point cloud, Camera
pose"; upstream recovers the relative camera from aligned pointmaps). All
math is a handful of 3x3 reductions + one tiny SVD — fully jittable, runs
per batch element on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def weighted_procrustes(
    src: jax.Array, dst: jax.Array, w: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """R, t minimizing sum_i w_i ||R @ src_i + t - dst_i||^2.

    src/dst: (..., N, 3); w: (..., N) nonnegative weights.
    Returns R (..., 3, 3) with det(R)=+1 and t (..., 3). fp32.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    w = jnp.maximum(w.astype(jnp.float32), 0.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-8
    wn = w / wsum  # (..., N)

    mu_s = jnp.einsum("...n,...ni->...i", wn, src)
    mu_d = jnp.einsum("...n,...ni->...i", wn, dst)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    # cross-covariance H = sum w * cs^T cd  -> (..., 3, 3)
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, cs, cd)

    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", V, Ut)))
    # reflection fix: flip the last singular direction when det < 0
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )  # (..., 3)
    R = jnp.einsum("...ij,...j,...jk->...ik", V, D, Ut)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def se3_apply(R: jax.Array, t: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (R, t) to points (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
