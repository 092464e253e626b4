"""One-off axon repro: moge2 model + focal-shift postprocess fused vs with
an optimization_barrier between them (the fused program kernel-faults the
development TPU worker; see registry.py moge2 notes)."""
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import ModelSpec
from monocular_depth_estimation_trt_tpu.models.moge2 import MoGe2
from monocular_depth_estimation_trt_tpu.ops.camera import (
    normalized_view_plane_uv,
    recover_focal_shift,
)
from monocular_depth_estimation_trt_tpu.weights.store import (
    get_or_convert_params,
    set_allow_random_weights,
)

set_allow_random_weights(True)
model = MoGe2(encoder="vits", num_tokens=1800, predict_normal=True,
              dtype=jnp.bfloat16)
spec = ModelSpec(model="moge2", encoder="vits", input_hw=(291, 518),
                 precision="bf16", variant="normal", metric=True)
x = jnp.zeros((1, 291, 518, 3), jnp.float32)
params = get_or_convert_params(spec.artifact_name(), model, x)


def run(p, x):
    out = model.apply({"params": p}, x)
    out = jax.lax.optimization_barrier(out)
    points = out["points"]
    mask = out["mask"] > 0.5
    focal, shift = recover_focal_shift(points, mask)
    z = points[..., 2] + shift[:, None, None]
    mask = mask & (z > 0)
    uv = normalized_view_plane_uv(points.shape[1], points.shape[2])
    pts = jnp.concatenate(
        [uv[None] * z[..., None] / focal[:, None, None, None], z[..., None]],
        axis=-1,
    )
    depth = z * out["metric_scale"][:, None, None]
    return jnp.where(mask, depth, jnp.float32(jnp.inf))[0], pts


f = jax.jit(run)
d, pts = f(params, x)
print("barrier variant ok", float(np.asarray(d.ravel()[0])), flush=True)
