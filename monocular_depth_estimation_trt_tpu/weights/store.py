"""Versioned parameter store.

The reference's weight handling is "torch.load an upstream checkpoint every
run" (``Depth_Anything_V2/infer.py:56``). Here conversion (torch -> Flax,
``weights/convert.py``) runs once and the result is cached as an Orbax
checkpoint keyed by the model's artifact name — the same build-once pattern
the reference applies to TRT engines (``onnx2trt.py:73-85``), applied to
weights.

When no checkpoint is available (e.g. benchmarking on a machine without the
upstream weights), :func:`init_random_params` provides deterministic random
parameters with the correct structure — numerics change, FLOPs and layout do
not, so performance numbers are identical. Falling back to random weights is
an **error by default** in production paths: enable it explicitly with
``--allow-random-weights`` (CLI), :func:`set_allow_random_weights`, or the
``allow_random`` argument (benchmark tools do this for you).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import cache_dir
from monocular_depth_estimation_trt_tpu.utils.logging import log


_ALLOW_RANDOM_DEFAULT = False


def set_allow_random_weights(allow: bool) -> None:
    """Process-wide default for the random-weights fallback policy."""
    global _ALLOW_RANDOM_DEFAULT
    _ALLOW_RANDOM_DEFAULT = bool(allow)


@contextlib.contextmanager
def allow_random_weights(allow: bool = True):
    """Scoped override of the random-weights fallback policy."""
    global _ALLOW_RANDOM_DEFAULT
    prev = _ALLOW_RANDOM_DEFAULT
    _ALLOW_RANDOM_DEFAULT = bool(allow)
    try:
        yield
    finally:
        _ALLOW_RANDOM_DEFAULT = prev


class MissingCheckpointError(FileNotFoundError):
    """No converted params cached and no torch checkpoint to convert."""


def resolve_checkpoint(path_or_uri: str) -> str:
    """Resolve a checkpoint reference to a local file path.

    Accepts plain paths and ``hf:org/repo/file`` URIs — the reference's
    weights come from the HF hub (``Depth_Anything_V2/README.md:22-36``);
    this is the model-id -> file resolution layer for them. Resolution order
    for ``hf:`` URIs:

    1. ``$MDET_HF_CACHE/<org>/<repo>/<file>`` (or ``cache_dir()/hf/...``) —
       a manually-populated local mirror, works fully offline;
    2. the huggingface_hub local cache (``try_to_load_from_cache``);
    3. a live ``hf_hub_download`` (network; graceful error when offline).
    """
    if not path_or_uri.startswith("hf:"):
        return path_or_uri
    ref = path_or_uri[3:].lstrip("/")
    parts = ref.split("/")
    if len(parts) < 3:
        raise MissingCheckpointError(
            f"malformed hf URI {path_or_uri!r}; expected hf:org/repo/file"
        )
    repo_id, filename = "/".join(parts[:2]), "/".join(parts[2:])

    mirror = os.environ.get("MDET_HF_CACHE") or os.path.join(cache_dir(), "hf")
    local = os.path.join(mirror, repo_id, filename)
    if os.path.exists(local):
        return local

    try:
        from huggingface_hub import try_to_load_from_cache

        cached = try_to_load_from_cache(repo_id, filename)
        if isinstance(cached, str) and os.path.exists(cached):
            return cached
    except Exception:
        pass

    try:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(repo_id, filename)
    except Exception as e:
        raise MissingCheckpointError(
            f"cannot resolve {path_or_uri!r}: not in the local mirror "
            f"({local}), not in the HF cache, and download failed ({e!r}). "
            f"Offline? Place the file at {local} and retry."
        ) from e


def _params_dir(name: str, layout_version: int = 1) -> str:
    # The converted-param *layout* can evolve independently of the model
    # (e.g. the SepConvGRU z/r kernel fusion, convert.py::_sep_gru). Versions
    # >1 get a distinct cache directory so stale pre-fusion artifacts can
    # never structurally collide with the new layout.
    suffix = "" if layout_version == 1 else f"@pv{layout_version}"
    return os.path.join(cache_dir(), "params", name + suffix)


def save_params(name: str, params: Any, *, layout_version: int = 1) -> str:
    import orbax.checkpoint as ocp

    path = _params_dir(name, layout_version)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    log(f"saved params -> {path}")
    return path


def load_params(
    name: str, like: Optional[Any] = None, *, layout_version: int = 1
) -> Optional[Any]:
    import orbax.checkpoint as ocp

    path = _params_dir(name, layout_version)
    if not os.path.isdir(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like
        )
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))


def _as_args(example_input) -> tuple:
    return example_input if isinstance(example_input, tuple) else (example_input,)


def init_random_params(model, example_input, seed: int = 0) -> Any:
    """Deterministic random init with the module's real structure/shapes.

    ``example_input`` may be a single array or a tuple of positional args.
    Jitted: eager init dispatches thousands of tiny ops, which is pathological
    over a remote device link (measured 138s -> 17s on the axon tunnel)."""
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(model.init)(rng, *_as_args(example_input))
    return variables["params"]


def get_or_convert_params(
    name: str,
    model,
    example_input,
    *,
    torch_ckpt: Optional[str] = None,
    converter: Optional[Callable] = None,
    seed: int = 0,
    allow_random: Optional[bool] = None,
    layout_version: int = 1,
    allowed_unconsumed: Optional[str] = None,
) -> Any:
    """Resolve parameters with the cache-then-convert-then-random policy.

    1. cached Orbax params under ``name``;
    2. else convert ``torch_ckpt`` with ``converter`` and cache;
    3. else deterministic random init (benchmark-only mode; logged loudly) —
       but only if allowed (``allow_random`` arg, else the process policy set
       by :func:`set_allow_random_weights`); the production default raises
       :class:`MissingCheckpointError` so a mistyped checkpoint path can't
       silently produce garbage depth maps.
    """
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), *_as_args(example_input)
    )
    like = variables["params"]

    cached = None
    try:
        cached = load_params(name, like, layout_version=layout_version)
    except Exception as e:
        log(f"param cache read failed ({e!r}); falling through", tag="WARN")
    if cached is not None:
        log(f"Load params from cache ({name})")
        return cached

    if torch_ckpt:
        torch_ckpt = resolve_checkpoint(torch_ckpt)
    if torch_ckpt and os.path.exists(torch_ckpt) and converter is not None:
        from monocular_depth_estimation_trt_tpu.weights.convert import (
            convert_with_audit,
            load_torch_state_dict,
        )

        log(f"Convert torch checkpoint {torch_ckpt}")
        sd = load_torch_state_dict(torch_ckpt)
        report_only = os.environ.get("MDET_CONVERT_REPORT_ONLY", "") == "1"
        strict = (os.environ.get("MDET_LOOSE_CONVERT", "") != "1"
                  and not report_only)
        params, report = convert_with_audit(
            converter, sd, strict=strict, name=name,
            allowed_unconsumed=allowed_unconsumed,
        )
        log(
            f"conversion audit: consumed {report['consumed']}/"
            f"{report['total']} checkpoint tensors"
            + (f"; ignored {len(report['ignored_extra'])} declared extras"
               if report.get("ignored_extra") else "")
        )
        if report["unconsumed"]:
            for k in report["unconsumed"]:
                log(f"  UNCONSUMED {k}", tag="WARN")
        if report_only:
            return params  # audit dry-run: never cache
        params = jax.tree_util.tree_map(jnp.asarray, params)
        save_params(name, params, layout_version=layout_version)
        return params

    if torch_ckpt and not os.path.exists(torch_ckpt):
        raise MissingCheckpointError(
            f"checkpoint path {torch_ckpt!r} does not exist (model {name!r})"
        )
    allowed = _ALLOW_RANDOM_DEFAULT if allow_random is None else allow_random
    if not allowed:
        raise MissingCheckpointError(
            f"no converted params cached for {name!r} and no torch checkpoint "
            "given. Pass checkpoint=<path> (CLI: --checkpoint), or opt into "
            "benchmark-only random weights with --allow-random-weights / "
            "weights.store.set_allow_random_weights(True)."
        )
    log(
        f"No checkpoint for {name!r}: using deterministic random weights "
        "(outputs are not meaningful; performance is)",
        tag="WARN",
    )
    return init_random_params(model, example_input, seed)
