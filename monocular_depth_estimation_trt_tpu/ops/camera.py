"""Camera geometry ops: unprojection, FoV/focal conversions, pose decoding.

Reference equivalents (all host-side numpy there, on-device here):

* pinhole unprojection ``x=(u-W/2)·z/f, y=(v-H/2)·z/f`` for point clouds
  (reference ``Depth_Anything_V2/onnx2trt_pointcloud.py:70-84``);
* Depth Pro focal from FoV: ``f_px = 0.5·W / tan(0.5·fov_deg)`` and
  ``depth = 1 / clamp(canonical_inverse_depth · W / f_px)`` (reference
  ``Depth_Pro/onnx2trt.py:152-165``);
* intrinsics rescaling to the original resolution (reference
  ``Uni_Depth_V2/onnx2trt.py:78-94``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """(u, v) pixel-center coordinate grids of shape (H, W)."""
    u = jnp.broadcast_to(jnp.arange(w, dtype=dtype)[None, :], (h, w))
    v = jnp.broadcast_to(jnp.arange(h, dtype=dtype)[:, None], (h, w))
    return u, v


def unproject_depth(
    depth: jax.Array,
    focal_px: jax.Array | float,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
) -> jax.Array:
    """Depth (H, W) -> points (H, W, 3) under a centered pinhole camera
    (reference ``Depth_Anything_V2/onnx2trt_pointcloud.py:70-78``)."""
    h, w = depth.shape[-2], depth.shape[-1]
    u, v = pixel_grid(h, w, depth.dtype)
    cx = (w / 2.0) if cx is None else cx
    cy = (h / 2.0) if cy is None else cy
    z = depth
    x = (u - cx) * z / focal_px
    y = (v - cy) * z / focal_px
    return jnp.stack([x, y, z], axis=-1)


def unproject_intrinsics(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Depth (H, W) + intrinsics (3, 3) -> points (H, W, 3)."""
    h, w = depth.shape[-2], depth.shape[-1]
    u, v = pixel_grid(h, w, depth.dtype)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def fov_to_focal(fov_deg: jax.Array | float, width: int) -> jax.Array:
    """Depth Pro: horizontal FoV (degrees) -> focal length in pixels."""
    fov_rad = jnp.deg2rad(fov_deg)
    return 0.5 * width / jnp.tan(0.5 * fov_rad)


def canonical_to_metric_depth(
    canonical_inverse_depth: jax.Array,
    fov_deg: jax.Array,
    width: int,
    clamp: Tuple[float, float] = (1e-4, 1e4),
) -> Tuple[jax.Array, jax.Array]:
    """Depth Pro postprocess (reference ``Depth_Pro/onnx2trt.py:152-165``).

    Returns (metric depth, f_px)."""
    f_px = fov_to_focal(fov_deg, width)
    inverse_depth = canonical_inverse_depth * (width / f_px)
    depth = 1.0 / jnp.clip(inverse_depth, clamp[0], clamp[1])
    return depth, f_px


def rescale_intrinsics(
    K: jax.Array, from_hw: Tuple[int, int], to_hw: Tuple[int, int]
) -> jax.Array:
    """Scale fx/cx by W ratio and fy/cy by H ratio (reference
    ``Uni_Depth_V2/onnx2trt.py:78-94``)."""
    sy = to_hw[0] / from_hw[0]
    sx = to_hw[1] / from_hw[1]
    scale = jnp.asarray(
        [[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], dtype=K.dtype
    )
    return K * scale


def normalized_view_plane_uv(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) view-plane coordinates spanning [-w/diag, w/diag] x
    [-h/diag, h/diag] at pixel centers (MoGe convention).

    Computed in numpy at trace time (shapes are static) and baked into the
    program as a constant: the broadcast-iota formulation, when fused into
    recover_focal_shift's candidate search + Gauss-Newton program, triggered
    a TPU kernel fault on the 2026-08 axon runtime."""
    diag = float(np.sqrt(h * h + w * w))
    u = ((np.arange(w) + 0.5) / w * 2.0 - 1.0) * (w / diag)
    v = ((np.arange(h) + 0.5) / h * 2.0 - 1.0) * (h / diag)
    uv = np.stack(np.broadcast_arrays(u[None, :], v[:, None]), axis=-1)
    return jnp.asarray(uv, dtype)


def recover_focal_shift(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    downsample: int = 64,
    num_shift_candidates: int = 128,
    gn_steps: int = 4,
):
    """Recover (focal, z-shift) from an affine-invariant point map.

    The MoGe-2 postprocess (reference ``MoGe_2/onnx2trt.py:179``, upstream
    ``utils3d recover_focal_shift``): find scalar ``shift`` and ``focal``
    minimizing the reprojection error between the predicted point map and the
    normalized view-plane grid. Implemented jit-friendly as a coarse
    log-space shift search with closed-form focal per candidate, refined by a
    few Gauss-Newton steps on ``shift``.

    points: (B, H, W, 3); mask: optional (B, H, W) bool.
    Returns (focal (B,), shift (B,)).
    """
    b, h, w, _ = points.shape
    # downsample for speed (matches upstream's low-res solve)
    sh = max(h // downsample, 1)
    sw = max(w // downsample, 1)
    pts = points[:, ::sh, ::sw, :]
    uv = normalized_view_plane_uv(pts.shape[1], pts.shape[2], points.dtype)
    if mask is not None:
        m = mask[:, ::sh, ::sw].astype(points.dtype)
    else:
        m = jnp.ones(pts.shape[:3], points.dtype)

    px = pts[..., 0].reshape(b, -1)
    py = pts[..., 1].reshape(b, -1)
    pz = pts[..., 2].reshape(b, -1)
    u = uv[..., 0].reshape(-1)[None]
    v = uv[..., 1].reshape(-1)[None]
    mm = m.reshape(b, -1)

    def loss_and_focal(shift):
        # shift: (B, 1)
        z = jnp.maximum(pz + shift, 1e-4)
        a = px / z
        c = py / z
        num = jnp.sum(mm * (u * a + v * c), axis=-1)
        den = jnp.sum(mm * (a * a + c * c), axis=-1) + 1e-12
        f = num / den  # optimal focal given shift (closed form)
        r = mm * ((f[:, None] * a - u) ** 2 + (f[:, None] * c - v) ** 2)
        return jnp.sum(r, axis=-1), f

    # coarse search over shift candidates (log-spaced around z statistics)
    z_med = jnp.median(pz, axis=-1, keepdims=True)
    spread = jnp.maximum(
        jnp.max(pz, axis=-1, keepdims=True) - jnp.min(pz, axis=-1, keepdims=True),
        1e-2,
    )
    t = jnp.linspace(-1.0, 4.0, num_shift_candidates)[None]  # (1, K)
    candidates = -z_med + spread * (10.0**t) * 0.1  # ensure z+shift > 0 tail
    losses, focals = jax.vmap(loss_and_focal, in_axes=1, out_axes=1)(
        candidates[..., None]
    )  # (B, K)
    best = jnp.argmin(losses, axis=-1)
    shift = jnp.take_along_axis(candidates, best[:, None], axis=1)  # (B, 1)

    # Gauss-Newton refinement on shift (finite-difference derivative)
    def gn(shift, _):
        eps = 1e-3
        l0, _ = loss_and_focal(shift)
        l1, _ = loss_and_focal(shift + eps)
        l_1, _ = loss_and_focal(shift - eps)
        g = (l1 - l_1) / (2 * eps)
        hdiag = (l1 - 2 * l0 + l_1) / (eps * eps)
        step = jnp.where(jnp.abs(hdiag) > 1e-8, g / jnp.maximum(hdiag, 1e-8), 0.0)
        new = shift - jnp.clip(step, -1.0, 1.0)[:, None]
        # keep z positive
        new = jnp.maximum(new, -jnp.min(pz, axis=-1, keepdims=True) + 1e-3)
        lnew, _ = loss_and_focal(new)
        return jnp.where((lnew < l0)[:, None], new, shift), None

    shift, _ = jax.lax.scan(gn, shift, None, length=gn_steps)
    _, focal = loss_and_focal(shift)
    return focal, shift[:, 0]


def extrinsics_from_quat_trans(quat: jax.Array, trans: jax.Array) -> jax.Array:
    """(x, y, z, w) quaternion + translation -> (3, 4) world-to-cam matrix
    (VGGT pose-encoding decode, reference ``VGGT/onnx2trt2.py:240-243``).

    Scalar-LAST (XYZW) to match upstream VGGT's ``quat_to_mat`` (used by
    ``pose_encoding_to_extri_intri``): the real part is ``pose_enc[6]`` and
    the imaginary parts are ``pose_enc[3:6]``. Matches
    ``scipy.spatial.transform.Rotation.from_quat`` ordering."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    R = jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return jnp.concatenate([R, trans[..., :, None]], axis=-1)


def unproject_to_world(
    depth: jax.Array, K: jax.Array, extrinsic: jax.Array
) -> jax.Array:
    """Depth map (H, W) + intrinsics + world-to-cam (3, 4) -> world points
    (H, W, 3) (VGGT world-point computation, ``VGGT/onnx2trt2.py:240-243``)."""
    cam_pts = unproject_intrinsics(depth, K)  # (H, W, 3)
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    # world = R^T (cam - t)
    return jnp.einsum("ji,hwj->hwi", R, cam_pts - t)
