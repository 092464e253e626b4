"""Mesh + sharding rules + the multi-chip dry run on 8 virtual CPU devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from monocular_depth_estimation_trt_tpu.parallel.mesh import get_mesh
from monocular_depth_estimation_trt_tpu.parallel.sharding import (
    ShardingRules,
    replicate,
    shard_batch,
    vit_tp_rules,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_get_mesh_default():
    mesh = get_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_get_mesh_2d():
    mesh = get_mesh((4, 2), ("data", "model"))
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_and_replicate():
    mesh = get_mesh((8, 1), ("data", "model"))
    x = jnp.zeros((16, 4))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data", None)
    p = replicate(mesh, {"w": jnp.zeros((3, 3))})
    assert p["w"].sharding.is_fully_replicated


def test_vit_tp_rules_match_param_paths():
    rules = vit_tp_rules()
    assert rules.spec_for("pretrained/blocks_0/attn/qkv/kernel", 2) == P(None, "model")
    assert rules.spec_for("pretrained/blocks_3/mlp/fc2/kernel", 2) == P("model", None)
    assert rules.spec_for("pretrained/blocks_3/norm1/scale", 1) == P()


def test_sharded_matmul_runs():
    mesh = get_mesh((2, 4), ("data", "model"))
    rules = ShardingRules([(r"w1", P(None, "model")), (r"w2", P("model", None))])
    params = {"w1": jnp.ones((16, 32)), "w2": jnp.ones((32, 16))}
    params = rules.apply(mesh, params)
    x = shard_batch(mesh, jnp.ones((8, 16)))

    @jax.jit
    def fwd(p, x):
        return jnp.maximum(x @ p["w1"], 0) @ p["w2"]

    out = fwd(params, x)
    assert out.shape == (8, 16)
    assert np.allclose(np.asarray(out), 16 * 32)


def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_abstract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (518, 518)
