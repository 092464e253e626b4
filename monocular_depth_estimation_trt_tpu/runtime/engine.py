"""AOT-compiled engines: the TPU replacement for TensorRT engine build/load.

Reference behavior being replaced (``Depth_Anything_V2/onnx2trt.py:24-85``):
``get_engine(onnx_path, engine_path, precision)`` parses an ONNX graph, builds
a serialized TRT plan with an fp16 flag and workspace limit (minutes of build
time), caches it on disk, and later deserializes it instantly.

TPU-native equivalent: a model is a pure JAX function; ``Engine`` lowers and
compiles it ahead of time for a fixed (shape, dtype) signature via
``jax.jit(...).lower(...).compile()``. Caching is two-level: XLA's persistent
compilation cache (see ``runtime/cache.py``) plus a human-readable JSON
registry entry per engine, named with the reference's artifact-name mangling
(``onnx2trt.py:160-166``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Optional, Sequence

import jax

from monocular_depth_estimation_trt_tpu.config import cache_dir
from monocular_depth_estimation_trt_tpu.runtime.cache import enable_persistent_cache
from monocular_depth_estimation_trt_tpu.utils.logging import log


def _abstractify(x):
    import numpy as np

    if isinstance(x, jax.Array) or isinstance(x, np.ndarray):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


class Engine:
    """An AOT-compiled executable for one model at fixed shapes.

    Parameters
    ----------
    fn:
        Pure function of device arrays (typically ``lambda x: model.apply(params, x)``
        with params closed over, or a function taking (params, x)).
    example_args:
        Arrays or ShapeDtypeStructs fixing the input signature.
    name:
        Registry key; use ``ModelSpec.artifact_name()`` for reference-parity
        naming.
    donate_argnums:
        Arguments whose buffers may be reused for outputs (the analogue of the
        reference reusing preallocated device buffers across iterations,
        ``common_runtime.py:94-143``).
    """

    def __init__(
        self,
        fn: Callable,
        example_args: Sequence[Any],
        *,
        name: str = "engine",
        static_argnums: Sequence[int] = (),
        donate_argnums: Sequence[int] = (),
        persistent: bool = True,
    ):
        self.name = name
        self._fn = fn
        self._example_args = tuple(example_args)
        self._jitted = jax.jit(
            fn, static_argnums=tuple(static_argnums), donate_argnums=tuple(donate_argnums)
        )
        self._compiled = None
        self._persistent = persistent
        self.build_seconds: Optional[float] = None

    # -- build / load -----------------------------------------------------
    def compile(self) -> "Engine":
        """Lower + compile now (reference ``build_serialized_network``,
        ``onnx2trt.py:65``). Fast when the persistent cache is warm."""
        if self._compiled is not None:
            return self
        if self._persistent:
            enable_persistent_cache()
        log(f"Build engine ({self.name})")
        begin = time.time()
        abstract = jax.tree_util.tree_map(_abstractify, self._example_args)
        lowered = self._jitted.lower(*abstract)
        self._compiled = lowered.compile()
        # Warm the jit call cache too (it is the fast execution path; the
        # XLA persistent cache makes this second compile a deserialization).
        zeros = jax.tree_util.tree_map(
            lambda a: jax.numpy.zeros(a.shape, a.dtype), abstract
        )
        out = self._jitted(*zeros)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if isinstance(x, jax.Array) else x, out
        )
        self.build_seconds = time.time() - begin
        t = self.build_seconds
        t_str = f"{t:.2f} [sec]" if t < 60 else f"{t // 60:.1f} [min] {t % 60:.2f} [sec]"
        log(f"Engine build done! ({t_str})")
        self._write_registry_entry(lowered)
        return self

    # -- execution --------------------------------------------------------
    def __call__(self, *args):
        # Always execute through the jit cache: it hits the same compiled
        # executable but with jax's fast async dispatch path. Calling the
        # AOT ``Compiled`` object directly re-validates/commits arguments per
        # call (measured 39ms vs 12ms per frame on the axon link).
        return self._jitted(*args)

    # -- introspection ----------------------------------------------------
    def cost_analysis(self):
        self.compile()
        try:
            return self._compiled.cost_analysis()
        except Exception:  # backend may not support it
            return {}

    def memory_analysis(self):
        self.compile()
        try:
            return self._compiled.memory_analysis()
        except Exception:
            return None

    def flops(self) -> Optional[float]:
        ca = self.cost_analysis() or {}
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return ca.get("flops")

    def io_signature(self):
        def describe(x):
            a = _abstractify(x)
            return {"shape": list(a.shape), "dtype": str(a.dtype)}

        flat, _ = jax.tree_util.tree_flatten(self._example_args)
        return [describe(x) for x in flat]

    def _write_registry_entry(self, lowered) -> None:
        try:
            EngineRegistry().record(self, lowered)
        except Exception as e:  # registry is best-effort metadata
            log(f"engine registry write failed: {e!r}", tag="WARN")


class EngineRegistry:
    """Human-readable record of built engines (JSON files under the cache dir).

    Plays the role of the reference's ``engine/`` directory of named ``.plan``
    files + timing caches (``Depth_Anything_V2/onnx2trt.py:160-167``): you can
    list what has been built, for which shapes, and how long builds took. The
    actual compiled bytes live in XLA's persistent cache.
    """

    def __init__(self, root: Optional[str] = None):
        self.root = root or os.path.join(cache_dir(), "engines")
        os.makedirs(self.root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def record(self, engine: Engine, lowered=None) -> str:
        entry = {
            "name": engine.name,
            "build_seconds": engine.build_seconds,
            "inputs": engine.io_signature(),
            "backend": jax.default_backend(),
            "jax_version": jax.__version__,
            "timestamp": time.time(),
        }
        p = self.path(engine.name)
        with open(p, "w") as f:
            json.dump(entry, f, indent=2)
        return p

    def load(self, name: str):
        p = self.path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def list(self):
        return sorted(
            os.path.splitext(f)[0] for f in os.listdir(self.root) if f.endswith(".json")
        )
