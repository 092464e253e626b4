"""Tensor-parallel VGGT aggregator over the 8-device virtual mesh.

The one place model parallelism pays off in this workload (SURVEY.md §2.1):
shard the aggregator's attention/MLP weights Megatron-style over the 'model'
axis, batch views over 'data', and check the sharded program produces the
same numbers as the single-device run (XLA SPMD inserts the collectives).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.parallel.mesh import get_mesh
from monocular_depth_estimation_trt_tpu.parallel.sharding import vit_tp_rules

TINY_CFG = VGGTConfig(
    dim=64, depth=2, num_heads=4, num_register_tokens=4, head_layers=(0, 1, 0, 1),
    encoder="vits",
    vit_config=ViTConfig(dim=48, depth=2, num_heads=2, pretrain_img_size=70),
)


def test_vggt_tp_matches_single_device(rng):
    model = VGGT(cfg=TINY_CFG, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False)
    x = jnp.asarray(
        rng.standard_normal((2, 1, 70, 70, 3)).astype(np.float32) * 0.3
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])["params"]
    ref = model.apply({"params": params}, x)

    mesh = get_mesh((2, 4), ("data", "model"))
    rules = vit_tp_rules()

    def shard_param(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        spec = rules.spec_for(path, getattr(leaf, "ndim", 0))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    sharded = jax.tree_util.tree_map_with_path(shard_param, params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None, None)))

    @jax.jit
    def fwd(p, v):
        return model.apply({"params": p}, v)

    out = fwd(sharded, xs)
    assert np.allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=1e-4
    )
    # verify the qkv kernels actually live sharded over 'model'
    qkv = sharded["aggregator"]["frame_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


def test_batch_call_pipeline(rng):
    """Batched serving path: vmap engine over a frame batch."""
    from monocular_depth_estimation_trt_tpu.config import ModelSpec
    from monocular_depth_estimation_trt_tpu.pipelines import DepthPipeline

    spec = ModelSpec(model="toy", input_hw=(16, 16))

    def forward(params, img_u8, out_hw):
        x = img_u8.astype(jnp.float32) / 255.0
        return {"depth": x[..., 0] * params["scale"]}

    pipe = DepthPipeline(spec, forward, {"scale": jnp.float32(2.0)}, viz="none")
    frames = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    out = pipe.batch_call(frames)
    assert out["depth"].shape == (4, 16, 16)
    single = pipe(frames[0])
    assert np.allclose(out["depth"][0], single["depth"])

    # batched viz (dynamic-batching HTTP serving): colormap fused into the
    # batched program, per-frame results match the single-frame viz engine
    pipe_v = DepthPipeline(spec, forward, {"scale": jnp.float32(2.0)},
                           viz="relative")
    out_v = pipe_v.batch_call(frames, viz=True)
    assert out_v["viz"].shape == (4, 16, 16, 3) and out_v["viz"].dtype == np.uint8
    single_v = pipe_v(frames[0], viz=True)
    assert np.array_equal(out_v["viz"][0], single_v["viz"])
