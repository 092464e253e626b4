"""SO(3)/SE(3) primitives for pose optimization — jittable, batched.

The reference's SLAM staging recipes lean on CUDA lie-group extensions
(``later/WildGS-SLAM/README.md``: ``pip install -e thirdparty/lietorch``).
On TPU the same role is a handful of closed-form fp32 expressions XLA fuses
into the surrounding program — no extension module needed.

Conventions: poses are (4, 4) camera-to-world matrices; tangent vectors are
``xi = [rho(3), phi(3)]`` (translation first). ``se3_retract`` is the
left-multiplicative retraction ``exp(xi) @ T`` used by the Gauss-Newton
loop in :mod:`.ba` — autodiff differentiates straight through it, so the
solver's Jacobians are exactly consistent with the update rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation. fp32, with the
    Taylor guard at theta ~ 0 expressed as a smooth ``where`` (jit-safe)."""
    w = w.astype(jnp.float32)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks near zero
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (principal branch)."""
    R = R.astype(jnp.float32)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta / (2 sin theta) with the small-angle limit 1/2
    s = jnp.where(theta < 1e-6, 0.5 + theta**2 / 12.0, theta / (2.0 * jnp.sin(jnp.maximum(theta, 1e-12))))
    return s[..., None] * vee


def se3_exp(xi: jax.Array) -> jax.Array:
    """(..., 6) [rho, phi] -> (..., 4, 4) via the exact SE(3) exponential
    (V-matrix coupling of rotation and translation)."""
    xi = xi.astype(jnp.float32)
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-8
    R = so3_exp(phi)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta),
    )
    W = hat(phi)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inv(T: jax.Array) -> jax.Array:
    """(..., 4, 4) rigid inverse (transpose-based; no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(T: jax.Array, pts: jax.Array) -> jax.Array:
    """(..., 4, 4) @ points (..., N, 3) -> (..., N, 3)."""
    return (
        jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts)
        + T[..., :3, 3][..., None, :]
    )


def se3_retract(xi: jax.Array, T: jax.Array) -> jax.Array:
    """Left-multiplicative retraction: ``exp(xi) @ T``."""
    return jnp.einsum("...ij,...jk->...ik", se3_exp(xi), T)


def rotation_geodesic_deg(Ra: jax.Array, Rb: jax.Array) -> jax.Array:
    """Angle (degrees) between two rotations — the pose-error metric."""
    Rrel = jnp.einsum("...ij,...kj->...ik", Ra, Rb)  # Ra @ Rb^T
    w = so3_log(Rrel)
    return jnp.linalg.norm(w, axis=-1) * (180.0 / jnp.pi)
