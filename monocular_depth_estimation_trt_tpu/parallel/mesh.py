"""Device mesh construction — the framework's "communication backend".

The reference is single-GPU and has no distributed backend at all (no
NCCL/MPI/Gloo anywhere; all data movement is ``cudaMemcpyAsync`` on one
stream, reference ``common_runtime.py:154-176``). On TPU, multi-chip scaling
is first-class: we define a ``jax.sharding.Mesh`` over the chips and let XLA
SPMD insert ICI collectives (all-gather / reduce-scatter / psum) from sharding
annotations — there is no hand-written communication code to maintain.

Axis conventions used across the framework:

* ``data``  — batch/data parallelism (frames, views);
* ``model`` — tensor parallelism within a layer (VGGT-1B aggregator heads/MLP);
* ``seq``   — sequence parallelism over tokens (multi-view VGGT S-axis).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def virtual_cpu_devices(n: int = 8) -> bool:
    """Force the CPU platform with ``n`` virtual devices for sharding tests.

    Must run before jax initializes its backends. Used by the test suite and
    the driver's multi-chip dry-run to validate pjit/shard_map programs
    without real multi-chip hardware. Returns True if the configuration was
    applied (False if backends were already initialized with another
    platform).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        import jax

        # Remote-device plugins (axon) ignore JAX_PLATFORMS; jax.config wins.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
        return len(jax.devices()) >= n
    except Exception:
        return False


def get_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    *,
    devices=None,
):
    """Build a Mesh over available devices.

    ``shape=None`` puts all devices on the first axis. A single chip yields a
    trivial 1x1 mesh so the same pjit program runs unsharded (the common
    inference case — parity with the reference's single-GPU deployment).
    """
    import jax

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return jax.sharding.Mesh(dev_array, tuple(axis_names))


def single_device_mesh(axis_names: Sequence[str] = ("data", "model")):
    import jax

    return get_mesh(
        (1,) * len(axis_names), axis_names, devices=[jax.devices()[0]]
    )
