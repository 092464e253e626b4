"""Differentiable 3D Gaussian splatting — tile-based, static-shape, TPU-first.

The reference's WildGS-SLAM recipe builds the CUDA rasterizer
``thirdparty/diff-gaussian-rasterization-w-pose`` (``later/WildGS-SLAM/
README.md``). That design — per-pixel dynamic gaussian lists built by a
device-side sort — does not map to XLA's static-shape model. The TPU-native
formulation here:

  * EWA projection of every gaussian (batched 2x2/3x3 algebra — VPU work).
  * Per 16x16 tile, a **fixed top-K** of contributing gaussians selected by
    ``lax.top_k`` on front-most depth among those whose 3-sigma footprint
    touches the tile. ``top_k(-z)`` returns them already depth-sorted, so
    selection and ordering are one op.
  * Alpha compositing over the K slots as an exclusive ``cumprod`` — a
    (tiles, pixels, K) tensor contraction, not a loop.

Everything is differentiable w.r.t. gaussian parameters AND the camera pose
(compose a tangent delta via :func:`slam.lie.se3_retract` outside), so the
same renderer serves mapping and pose refinement. Selection indices are
piecewise-constant (gradients flow through the gathered values — standard
for splatting).

Capacity is static: a map holds MAX_G gaussians with a validity mask;
densification appends into preallocated slots (no recompilation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.slam.lie import se3_apply, se3_inv


class GaussianMap(NamedTuple):
    """Optimizable splat parameters (leading axis = static capacity G)."""

    means: jax.Array  # (G, 3) world
    log_scales: jax.Array  # (G, 3)
    quats: jax.Array  # (G, 4) xyzw, unnormalized
    colors_logit: jax.Array  # (G, 3) sigmoid -> [0, 1]
    opacity_logit: jax.Array  # (G,) sigmoid -> (0, 1)
    valid: jax.Array  # (G,) float {0, 1} slot-occupancy mask


def quat_to_rot(q: jax.Array) -> jax.Array:
    """(..., 4) xyzw (unnormalized) -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        -2,
    )


class RenderOut(NamedTuple):
    color: jax.Array  # (H, W, 3)
    depth: jax.Array  # (H, W) alpha-weighted mean splat depth
    alpha: jax.Array  # (H, W) accumulated opacity


@functools.partial(
    jax.jit, static_argnames=("hw", "tile", "k_per_tile", "near")
)
def render(
    gmap: GaussianMap,
    c2w: jax.Array,
    focal: jax.Array | float,
    hw: Tuple[int, int],
    *,
    tile: int = 16,
    k_per_tile: int = 32,
    near: float = 0.05,
) -> RenderOut:
    """Render the map from a camera-to-world pose under a centered pinhole.

    ``hw`` must be a multiple of ``tile`` in both dims (pad upstream).
    """
    h, w = hw
    assert h % tile == 0 and w % tile == 0
    th, tw = h // tile, w // tile
    n_tiles = th * tw
    f = jnp.asarray(focal, jnp.float32)
    cx, cy = w / 2.0, h / 2.0

    w2c = se3_inv(c2w)
    xc = se3_apply(w2c, gmap.means[None])[0]  # (G, 3)
    z = xc[:, 2]
    in_front = z > near
    zs = jnp.maximum(z, near)
    u = f * xc[:, 0] / zs + cx
    v = f * xc[:, 1] / zs + cy

    # 3D covariance in world -> camera -> EWA 2D
    R = quat_to_rot(gmap.quats)  # (G, 3, 3)
    s = jnp.exp(gmap.log_scales)  # (G, 3)
    rs = R * s[:, None, :]
    cov3 = jnp.einsum("gij,gkj->gik", rs, rs)  # R S S^T R^T
    rot_cw = w2c[:3, :3]
    cov_cam = jnp.einsum("ij,gjk,lk->gil", rot_cw, cov3, rot_cw)
    invz = 1.0 / zs
    # J = d(u,v)/d(x,y,z): rows [f/z, 0, -f x/z^2], [0, f/z, -f y/z^2]
    j00 = f * invz
    j02 = -f * xc[:, 0] * invz * invz
    j12 = -f * xc[:, 1] * invz * invz
    jrow0 = jnp.stack([j00, jnp.zeros_like(j00), j02], -1)
    jrow1 = jnp.stack([jnp.zeros_like(j00), j00, j12], -1)
    J = jnp.stack([jrow0, jrow1], -2)  # (G, 2, 3)
    cov2 = jnp.einsum("gij,gjk,glk->gil", J, cov_cam, J)  # (G, 2, 2)
    cov2 = cov2 + 0.3 * jnp.eye(2, dtype=cov2.dtype)
    det = cov2[:, 0, 0] * cov2[:, 1, 1] - cov2[:, 0, 1] * cov2[:, 1, 0]
    det = jnp.maximum(det, 1e-8)
    inv2 = (
        jnp.stack(
            [
                jnp.stack([cov2[:, 1, 1], -cov2[:, 0, 1]], -1),
                jnp.stack([-cov2[:, 1, 0], cov2[:, 0, 0]], -1),
            ],
            -2,
        )
        / det[:, None, None]
    )
    # 3-sigma screen radius from the larger eigenvalue
    mid = 0.5 * (cov2[:, 0, 0] + cov2[:, 1, 1])
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = 3.0 * jnp.sqrt(lam_max)

    # tile selection: distance from tile rect to the projected center
    ty = (jnp.arange(th, dtype=jnp.float32) + 0.5) * tile
    tx = (jnp.arange(tw, dtype=jnp.float32) + 0.5) * tile
    tcy, tcx = jnp.meshgrid(ty, tx, indexing="ij")
    tc = jnp.stack([tcx.reshape(-1), tcy.reshape(-1)], -1)  # (T, 2) (u, v)
    half = tile / 2.0
    du = jnp.maximum(jnp.abs(tc[:, None, 0] - u[None, :]) - half, 0.0)
    dv = jnp.maximum(jnp.abs(tc[:, None, 1] - v[None, :]) - half, 0.0)
    dist2 = du * du + dv * dv
    r2 = radius[None, :] ** 2
    touches = dist2 <= r2
    usable = touches & in_front[None, :] & (gmap.valid[None, :] > 0.5)
    # Relevance: front-most, with a scale-free tile-proximity tie-break so
    # near-equal depths (flat surfaces) keep the gaussians that actually
    # cover THIS tile instead of an arbitrary index-ordered subset.
    score = -zs[None, :] * (1.0 + 0.1 * dist2 / jnp.maximum(r2, 1e-8))
    score = jnp.where(usable, score, -jnp.inf)
    k = min(k_per_tile, score.shape[1])
    top_score, idx = jax.lax.top_k(score, k)  # (T, K)
    slot_ok = jnp.isfinite(top_score)

    # gather per-tile splat attributes, then restore exact depth order for
    # compositing (the tie-break perturbs top_k's ordering)
    g_z = jnp.where(slot_ok, zs[idx], jnp.inf)
    order = jnp.argsort(g_z, axis=-1)  # (T, K) ascending depth
    idx = jnp.take_along_axis(idx, order, axis=-1)
    slot_ok = jnp.take_along_axis(slot_ok, order, axis=-1)
    g_z = zs[idx]
    uv = jnp.stack([u, v], -1)
    g_uv = uv[idx]  # (T, K, 2)
    g_inv = inv2[idx]  # (T, K, 2, 2)
    g_col = jax.nn.sigmoid(gmap.colors_logit)[idx]  # (T, K, 3)
    g_op = jax.nn.sigmoid(gmap.opacity_logit)[idx] * slot_ok

    # per-tile pixel coordinates (P = tile*tile)
    py, px = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    tile_origin = tc - half  # (T, 2)
    pix = (
        tile_origin[:, None, :]
        + jnp.stack([px.reshape(-1), py.reshape(-1)], -1)[None, :, :]
    )  # (T, P, 2)

    d = pix[:, :, None, :] - g_uv[:, None, :, :]  # (T, P, K, 2)
    quad = (
        d[..., 0] * (g_inv[:, None, :, 0, 0] * d[..., 0] + g_inv[:, None, :, 0, 1] * d[..., 1])
        + d[..., 1] * (g_inv[:, None, :, 1, 0] * d[..., 0] + g_inv[:, None, :, 1, 1] * d[..., 1])
    )
    alpha = g_op[:, None, :] * jnp.exp(-0.5 * jnp.maximum(quad, 0.0))
    alpha = jnp.clip(alpha, 0.0, 0.995)  # (T, P, K) depth-sorted along K
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans_excl = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    wgt = alpha * trans_excl  # (T, P, K)

    color_t = jnp.einsum("tpk,tkc->tpc", wgt, g_col)
    depth_t = jnp.einsum("tpk,tk->tp", wgt, g_z)
    alpha_t = jnp.sum(wgt, axis=-1)

    def untile(x, ch=None):
        if ch is None:
            return (
                x.reshape(th, tw, tile, tile)
                .transpose(0, 2, 1, 3)
                .reshape(h, w)
            )
        return (
            x.reshape(th, tw, tile, tile, ch)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h, w, ch)
        )

    color = untile(color_t, 3)
    alpha_i = untile(alpha_t)
    depth = untile(depth_t) / jnp.maximum(alpha_i, 1e-6)
    return RenderOut(color=color, depth=depth, alpha=alpha_i)


def init_from_depth(
    image_rgb: jax.Array,
    depth: jax.Array,
    c2w: jax.Array,
    focal: jax.Array | float,
    *,
    stride: int = 4,
    max_gaussians: int = 16384,
    opacity: float = 0.7,
) -> GaussianMap:
    """Seed a map by backprojecting a depth frame on a stride grid —
    WildGS-SLAM-style keyframe densification, into static capacity.

    image_rgb: (H, W, 3) float in [0, 1]; depth: (H, W).
    """
    h, w = depth.shape
    f = jnp.asarray(focal, jnp.float32)
    ys = jnp.arange(stride // 2, h, stride)
    xs = jnp.arange(stride // 2, w, stride)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    z = depth[yy, xx]
    u = xx.astype(jnp.float32)
    v = yy.astype(jnp.float32)
    xc = jnp.stack(
        [(u - w / 2.0) * z / f, (v - h / 2.0) * z / f, z], -1
    )  # (N, 3) camera
    means = se3_apply(c2w, xc[None])[0]
    n = means.shape[0]
    # isotropic init: world size of one stride cell at that depth
    sigma = jnp.log(jnp.maximum(z * stride / f, 1e-4) * 0.7)
    cols = image_rgb[yy, xx]
    cols_logit = jnp.log(
        jnp.clip(cols, 1e-3, 1 - 1e-3) / (1 - jnp.clip(cols, 1e-3, 1 - 1e-3))
    )
    g = max_gaussians

    def fit(x, fill=0.0):
        pad = [(0, g - min(n, g))] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x[:g], pad, constant_values=fill)

    op = jnp.log(opacity / (1 - opacity))
    return GaussianMap(
        means=fit(means),
        log_scales=fit(jnp.repeat(sigma[:, None], 3, 1)),
        quats=fit(
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 4))
        ),
        colors_logit=fit(cols_logit),
        opacity_logit=fit(jnp.full((n,), op, jnp.float32), fill=-10.0),
        valid=fit(jnp.ones((n,), jnp.float32)),
    )


def insert_gaussians(gmap: GaussianMap, new: GaussianMap) -> GaussianMap:
    """Append ``new``'s valid gaussians into ``gmap``'s free slots (static
    shapes: a masked scatter, no reallocation). Overflow beyond capacity is
    dropped front-first."""
    free = gmap.valid < 0.5  # (G,)
    # rank free slots and incoming gaussians
    free_rank = jnp.cumsum(free) - 1  # position among free slots
    new_valid = new.valid > 0.5
    new_rank = jnp.cumsum(new_valid) - 1
    n_free = jnp.sum(free)
    take = new_valid & (new_rank < n_free)
    # build a gather index: for each slot, which incoming gaussian lands there
    g = gmap.valid.shape[0]
    gn = new.valid.shape[0]
    # incoming index sorted by rank: scatter incoming ranks to a dense table
    order = jnp.where(take, new_rank, g)  # rank or sentinel
    table = jnp.full((g + 1,), 0, jnp.int32)
    table = table.at[jnp.minimum(order, g)].set(
        jnp.arange(gn, dtype=jnp.int32), mode="drop"
    )
    src = table[jnp.clip(free_rank, 0, g - 1)]  # (G,) incoming idx per free slot
    fill = free & (free_rank < jnp.sum(take))

    def merge(a, b):
        picked = b[src]
        return jnp.where(
            fill.reshape((-1,) + (1,) * (a.ndim - 1)), picked, a
        )

    out = GaussianMap(*[merge(a, b) for a, b in zip(gmap, new)])
    return out._replace(
        valid=jnp.where(fill, 1.0, gmap.valid).astype(gmap.valid.dtype)
    )
