"""TPU-native training loop: sharded optax train step + orbax resume.

The reference has no training path at all (inference-only TRT engines; its
checkpoints come pre-trained, ``Depth_Anything_V2/README.md:22-36``). This
module closes the loop the TPU way: one jitted ``train_step`` containing
loss, backward, and the optimizer update; parameters/optimizer state laid
out over a ``jax.sharding.Mesh`` by the same ``ShardingRules`` used for
serving (XLA SPMD inserts the gradient all-reduces over ICI — no
hand-written collectives); gradient accumulation as a ``lax.scan``;
rematerialization via ``jax.checkpoint`` to trade FLOPs for HBM.

Design notes (TPU-first):

* ``TrainState`` holds only arrays (params fp32, opt state, step) so it is
  a plain pytree — orbax-serializable and shardable leaf-by-leaf.
* Compute dtype stays the model's (bf16); the master params and all
  optimizer statistics are fp32. Grads are computed in fp32 (JAX upcasts
  at the loss, which is fp32 by construction in ``losses.py``).
* Donated state: the step is jitted with ``donate_argnums=(0,)`` so the
  old params/opt buffers are reused in-place — at VGGT-1B scale the
  state would otherwise double HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.utils.logging import log


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Array-only training state (pytree; jit/shard/orbax friendly)."""

    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params: Any, tx) -> TrainState:
    """Build a fresh TrainState from initialized params and an optax tx."""
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
        else jnp.asarray(p),
        params,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def make_train_step(
    loss_fn: Callable[[Any, Any], jax.Array],
    tx,
    *,
    accum_steps: int = 1,
    remat: bool = False,
    donate: bool = True,
) -> Callable[[TrainState, Any], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Compile a full training step: loss → grad → optimizer update.

    ``loss_fn(params, batch) -> scalar`` is the user's forward+loss (batch is
    any pytree). With ``accum_steps > 1`` the batch's leading axis is split
    into that many microbatches and gradients are averaged by a ``lax.scan``
    — one compiled program, peak activation memory of a single microbatch.
    ``remat=True`` wraps the loss in ``jax.checkpoint`` (recompute
    activations in the backward pass instead of holding them in HBM).
    """
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def split_micro(batch):
        def s(x):
            b = x.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {accum_steps}"
                )
            return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

        return jax.tree_util.tree_map(s, batch)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        else:
            micro = split_micro(batch)
            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )

            def body(carry, mb):
                acc_loss, acc_grads = carry
                l, g = jax.value_and_grad(loss_fn)(state.params, mb)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, g)
                return (acc_loss + l, acc_grads), None

            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero), micro
            )
            loss = loss / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def shard_train_state(mesh, rules, state: TrainState) -> TrainState:
    """Lay the whole TrainState out over the mesh.

    Params shard by the serving ``ShardingRules`` (``parallel/sharding.py``);
    optimizer statistics (adam mu/nu etc.) mirror their parameter's layout —
    their pytree paths contain the parameter path, so the same regex rules
    match. Scalars (step, counts, schedules) replicate.
    """
    return TrainState(
        step=jax.device_put(
            state.step, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        ),
        params=rules.apply(mesh, state.params),
        opt_state=rules.apply(mesh, state.opt_state),
    )


def shard_batch_tree(mesh, batch, axis: str = "data"):
    """Shard every leaf's leading (batch) axis over ``axis``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


# ---------------------------------------------------------------------------
# Checkpoint / resume (orbax; mirrors weights/store.py conventions)
# ---------------------------------------------------------------------------


def save_train_state(path: str, state: TrainState) -> str:
    """Persist the full TrainState (params + optimizer + step) with orbax."""
    import os

    import orbax.checkpoint as ocp

    host = jax.tree_util.tree_map(lambda x: jax.device_get(x), state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {"step": host.step, "params": host.params, "opt_state": host.opt_state},
        force=True,
    )
    ckptr.wait_until_finished()
    log(f"saved train state (step {int(host.step)}) -> {path}")
    return path


def load_train_state(path: str, like: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_train_state`.

    ``like`` provides the structure/shapes/dtypes (a freshly created state
    for the same model+optimizer); training resumes exactly where it
    stopped — the optimizer moments and step counter round-trip.
    """
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        {"step": like.step, "params": like.params, "opt_state": like.opt_state},
    )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    return TrainState(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
