"""Serialized engine artifacts: the shippable `.engine`-file analogue.

The reference's deployment artifact is a serialized TensorRT plan written to
disk (``Depth_Anything_V2/onnx2trt.py:60-68`` ``build_serialized_network`` →
``f.write(plan)``) that a separate process later deserializes and runs with
no model code present (``common_runtime.py`` only needs the ``.engine``
bytes). ``runtime/engine.py`` covers the *build/cache* half of that story
(AOT compile + XLA persistent cache); this module covers the *shippable
artifact* half: ``jax.export`` serializes the fused (preprocess + model +
postprocess) program — with the weights baked in as constants, exactly like
a TRT plan — into a single ``.mdeteng`` file that any machine with jax can
deserialize and execute without the model zoo, converters, or checkpoints.

Because the payload is StableHLO (not a backend binary like a TRT plan), one
artifact can target several platforms: we export for ``("cpu", "tpu")`` by
default, so the same file smoke-tests on a CPU host and serves on TPU.

Container format (``MDETENG``): a zip holding
  - ``meta.json``  — model/spec/shape/precision/outputs metadata
  - ``module.bin`` — ``jax.export.Exported.serialize()`` bytes

CLI surfaces: ``mdet export`` writes an artifact; ``mdet run --engine f``
and ``load_engine(f)`` execute one.
"""

from __future__ import annotations

import json
import os
import time
import zipfile
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from monocular_depth_estimation_trt_tpu.config import cache_dir
from monocular_depth_estimation_trt_tpu.utils.logging import log

_META_NAME = "meta.json"
_MODULE_NAME = "module.bin"
FORMAT_VERSION = 1
DEFAULT_PLATFORMS: Tuple[str, ...] = ("cpu", "tpu")


def exported_dir() -> str:
    d = os.path.join(cache_dir(), "exported")
    os.makedirs(d, exist_ok=True)
    return d


def _abstract(x):
    if isinstance(x, (jax.Array, np.ndarray)):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def export_serialized(
    fn: Callable,
    example_args: Sequence[Any],
    path: str,
    *,
    meta: Optional[Dict[str, Any]] = None,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> str:
    """Serialize ``fn`` (weights already closed over) at the example-arg
    signature into a ``.mdeteng`` container at ``path``."""
    from jax import export as jexport

    abstract = jax.tree_util.tree_map(_abstract, tuple(example_args))
    begin = time.time()
    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*abstract)
    payload = exp.serialize()
    entry = {
        "format": "MDETENG",
        "format_version": FORMAT_VERSION,
        "platforms": list(exp.platforms),
        "inputs": [
            {"shape": list(a.shape), "dtype": str(a.dtype)} for a in exp.in_avals
        ],
        "outputs": [
            {"shape": list(a.shape), "dtype": str(a.dtype)} for a in exp.out_avals
        ],
        "jax_version": jax.__version__,
        "export_seconds": round(time.time() - begin, 3),
        "timestamp": time.time(),
    }
    entry.update(meta or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(entry, indent=2))
        z.writestr(_MODULE_NAME, payload)
    log(
        f"exported engine -> {path} "
        f"({os.path.getsize(path) / 1e6:.2f} MB, platforms {entry['platforms']})"
    )
    return path


def read_meta(path: str) -> Dict[str, Any]:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read(_META_NAME))


class LoadedEngine:
    """A deserialized ``.mdeteng`` artifact, callable like the pipeline's
    fused program (image_u8 -> dict of outputs) with zero model code.

    Mirrors the reference's deserialize-and-run consumer
    (``common_runtime.py``'s ``runtime.deserialize_cuda_engine`` +
    ``do_inference``): metadata says what shapes it takes; ``__call__``
    dispatches through jit's fast async path.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read(_META_NAME))
            payload = z.read(_MODULE_NAME)
        if self.meta.get("format") != "MDETENG":
            raise ValueError(f"{path}: not an MDETENG artifact")
        self._exported = jexport.deserialize(payload)
        self._jitted = jax.jit(self._exported.call)
        self.path = path

    @property
    def in_shapes(self):
        return [tuple(i["shape"]) for i in self.meta["inputs"]]

    def __call__(self, *args, device_out: bool = False):
        out = self._jitted(*args)
        if device_out:
            return out
        return jax.tree_util.tree_map(np.asarray, out)

    def describe(self) -> str:
        m = self.meta
        ins = ", ".join(f"{i['dtype']}{tuple(i['shape'])}" for i in m["inputs"])
        return (
            f"{m.get('model', '?')} [{m.get('artifact', '')}] "
            f"in=({ins}) outputs={m.get('output_names', [])} "
            f"platforms={m.get('platforms')}"
        )


def load_engine(path: str) -> LoadedEngine:
    return LoadedEngine(path)


def export_pipeline(
    pipe,
    in_hw: Tuple[int, int],
    *,
    with_viz: bool = False,
    path: Optional[str] = None,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> str:
    """Export a pipeline's fused single-image program with its weights baked
    in. Works for any pipeline exposing ``engine_for`` + ``params`` (depth
    and flow families); the artifact takes the same uint8 inputs the fused
    program takes and returns the same output dict.
    """
    eng = pipe.engine_for(in_hw, with_viz)
    params = pipe.params
    fn = eng._fn
    n_img_args = len(eng._example_args) - 1  # (params, img[, img2...])

    def baked(*imgs):
        return fn(params, *imgs)

    example = tuple(eng._example_args[1:])
    # name the output keys so a consumer knows what it gets without tracing
    out_struct = jax.eval_shape(
        baked, *jax.tree_util.tree_map(_abstract, example)
    )
    output_names = (
        sorted(out_struct.keys()) if isinstance(out_struct, dict) else []
    )
    if path is None:
        path = os.path.join(exported_dir(), f"{eng.name}.mdeteng")
    meta = {
        "model": getattr(pipe.spec, "model", ""),
        "artifact": eng.name,
        "in_hw": list(in_hw),
        "with_viz": bool(with_viz),
        "n_image_args": n_img_args,
        "precision": getattr(pipe.spec, "precision", ""),
        "output_names": output_names,
    }
    return export_serialized(baked, example, path, meta=meta, platforms=platforms)
