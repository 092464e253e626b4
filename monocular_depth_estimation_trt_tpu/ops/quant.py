"""Int8 (w8a8) quantized serving for ViT encoders — static calibration.

Beyond the reference: its TRT engines are fp16-only (every build script
passes ``--fp16``-equivalent flags and no INT8 calibrator exists anywhere
in ``/root/reference``). On v5e the int8 MXU has 2× the bf16 TOPS, so the
compute-bound ViT-L-class models can serve faster — IF the quantization
epilogue stays off the critical path. docs/PERF.md's round-3 measurement
showed dynamic per-token activation scales give back most of the 2×
(+25% net); this module implements the *static* calibration design it
recommended: per-layer activation scales baked at build time (one
multiply, no per-token reduce) and weights pre-quantized per-output-channel
OUTSIDE the serving graph.

Param-tree compatibility is the design constraint: ``QuantDense`` exposes
the exact ``kernel``/``bias`` parameters of ``nn.Dense``, so every
existing torch→flax converter and orbax cache works unchanged. The int8
artifacts (``kernel_q``, ``w_scale``, ``in_scale``) live in a separate
``q8`` flax collection built by :func:`build_q8` from a one-off
calibration pass (``quant_stats`` sown absmax per layer).

Accuracy: per-output-channel weight scales + SmoothQuant-style activation
smoothing (Xiao et al. 2023). Per-tensor activation scales waste int8
range on the few outlier channels ViT activations carry post-LN; instead
each input channel is divided by ``s_j = absmax_x(j)^0.5 /
absmax_W_row(j)^0.5`` with the inverse folded into the kernel BEFORE
weight quantization. The serving graph pays nothing extra: the scalar
pre-quant multiply simply becomes a per-channel vector ``qmul = 1/(s·a)``
(one fused VPU multiply either way). ``mdet eval``'s δ1/AbsRel metrics
quantify the residual error against the bf16 graph (gated in
``tests/test_quant.py``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_QMAX = 127.0


def _use_fused_w8a8(d_in: int, features: int) -> bool:
    """Route serve-mode matmuls to the fused Pallas w8a8 kernel.

    ``MDET_W8A8_IMPL``: "pallas" forces on for every supported shape
    (interpret mode off-TPU, for tests), "xla" forces the unfused lax path,
    "auto" (default) uses the kernel on TPU only where it measures faster
    than XLA's fusion: contraction-heavy layers (K > N, e.g. the MLP's fc2)
    where keeping the quantized (M, K) activation out of HBM pays. For
    K <= N (qkv/fc1) XLA's own epilogue fusion wins — measured table in
    docs/QUANT.md (scripts/w8a8_bench.py).
    """
    impl = os.environ.get("MDET_W8A8_IMPL", "auto")
    if impl == "xla":
        return False
    from monocular_depth_estimation_trt_tpu.ops.pallas.quant_matmul import (
        w8a8_supported,
    )

    if not w8a8_supported(d_in, features):
        return False
    if impl == "pallas":
        return True
    return d_in > features and jax.default_backend() == "tpu"


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 serving path.

    modes:
      * ``calib`` — compute in ``dtype`` exactly like ``nn.Dense`` while
        sowing the running per-input-channel absmax of the input into the
        ``quant_stats`` collection (reduced with max across calls/batches);
      * ``serve`` — static-scale int8 with SmoothQuant smoothing folded in:
        ``x → round(x·qmul) ∈ int8`` (``qmul`` per input channel),
        int8×int8 ``dot_general`` accumulating in int32 on the MXU, one
        fused rescale ``int32 → f32 × out_scale`` epilogue;
      * ``qat`` — quantization-aware training: fake-quant (quantize →
        dequantize) on weights (per-output-channel) and activations
        (per-tensor dynamic absmax) with straight-through gradients, so a
        fine-tune/distillation learns weights that serve well at int8.

    The ``kernel``/``bias`` params match ``nn.Dense`` exactly (converter/
    cache compatible); int8 weights + scales come from the ``q8``
    collection (see :func:`build_q8`).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    mode: str = "serve"  # "calib" | "serve"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_in = x.shape[-1]
        # serve mode never reads the fp32 kernel — don't declare it, so the
        # serving bundle can drop it (prune_quantized_kernels) instead of
        # holding ~2x dead weight bytes in HBM / over the transfer link.
        kernel = (
            self.param(
                "kernel", nn.initializers.lecun_normal(), (d_in, self.features)
            )
            if self.mode in ("calib", "qat")
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.mode == "calib":
            self.sow(
                "quant_stats",
                "absmax_ch",
                jnp.max(
                    jnp.abs(x), axis=tuple(range(x.ndim - 1))
                ).astype(jnp.float32),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((d_in,), jnp.float32),
            )
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        elif self.mode == "qat":
            # fake-quant with straight-through estimator: forward sees the
            # quantization grid, backward sees identity
            def ste(real, quantized):
                return real + jax.lax.stop_gradient(quantized - real)

            k = kernel.astype(jnp.float32)
            kq, ws = quantize_weight(k)
            k_fq = ste(k, kq.astype(jnp.float32) * ws[None, :])
            xf = x.astype(jnp.float32)
            a = jnp.maximum(jax.lax.stop_gradient(jnp.max(jnp.abs(xf))),
                            1e-8) / _QMAX
            x_fq = ste(xf, jnp.clip(jnp.round(xf / a), -_QMAX, _QMAX) * a)
            y = x_fq @ k_fq
        else:
            # qmul = 1/(s·a): SmoothQuant per-channel smoothing s and the
            # post-smoothing activation scale a, pre-combined (build_q8)
            qmul = self.variable(
                "q8", "qmul", lambda: jnp.ones((d_in,), jnp.float32)
            ).value
            kernel_q = self.variable(
                "q8",
                "kernel_q",
                lambda: jnp.zeros((d_in, self.features), jnp.int8),
            ).value
            out_scale = self.variable(
                "q8", "out_scale",
                lambda: jnp.ones((self.features,), jnp.float32)
            ).value
            if _use_fused_w8a8(d_in, self.features):
                # one-program quantize + int8 dot + rescale (+bias) —
                # ops/pallas/quant_matmul.py; weights stream from HBM once
                from monocular_depth_estimation_trt_tpu.ops.pallas.quant_matmul import (  # noqa: E501
                    w8a8_matmul,
                )

                return w8a8_matmul(
                    x, kernel_q, qmul, out_scale, bias,
                    out_dtype=self.dtype,
                )
            x_q = jnp.clip(
                jnp.round(x.astype(jnp.float32) * qmul), -_QMAX, _QMAX
            ).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q,
                kernel_q,
                (((x_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * out_scale
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


def make_dense(quant: str, features: int, *, use_bias: bool = True,
               dtype: Any = jnp.bfloat16, name: str):
    """Dense factory: ``quant`` "none" → ``nn.Dense``; "calib"/"serve" →
    :class:`QuantDense` in that mode."""
    if quant == "none":
        return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return QuantDense(
        features, use_bias=use_bias, dtype=dtype, mode=quant, name=name
    )


def quantize_weight(kernel: jax.Array):
    """Per-output-channel symmetric int8: returns (kernel_q, w_scale)."""
    k = jnp.asarray(kernel, jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / _QMAX
    kernel_q = jnp.clip(jnp.round(k / w_scale[None, :]), -_QMAX, _QMAX).astype(
        jnp.int8
    )
    return kernel_q, w_scale


def calibrate(model, variables: Dict, *sample_inputs) -> Dict:
    """Run the model (built with ``quant="calib"``) over sample inputs and
    return the merged ``quant_stats`` absmax tree. The apply is jitted —
    eager ops over a remote device link cost seconds each."""
    run = jax.jit(
        lambda v, *a: model.apply(v, *a, mutable=["quant_stats"])[1][
            "quant_stats"
        ]
    )
    stats: Optional[Dict] = None
    for inp in sample_inputs:
        args = inp if isinstance(inp, tuple) else (inp,)
        cur = run(variables, *args)
        stats = (
            cur
            if stats is None
            else jax.tree_util.tree_map(jnp.maximum, stats, cur)
        )
    return stats


def build_q8(q8_struct: Dict, params: Dict, stats: Dict) -> Dict:
    """Fill a ``q8`` collection from params + calibration stats.

    ``q8_struct``: the structure from ``model.init`` (serve mode) — a tree
    whose QuantDense leaves hold ``{qmul, kernel_q, out_scale}``; only its
    *keys* are read, so the ``jax.eval_shape`` result works directly (no
    materialization). ``params``/``stats`` are indexed by the same module
    paths.

    Per leaf (SmoothQuant α=0.5, Xiao et al. 2023): smoothing
    ``s_j = absmax_x(j)^0.5 / absmax_Wrow(j)^0.5`` moves activation
    outliers into the weights; the smoothed kernel ``s·W`` quantizes
    per-output-channel; the post-smoothing activation scale is
    ``a = max_j(absmax_x(j)/s_j)/127``. Channels that never fired
    (absmax 0) smooth with s=1; a layer that never fired serves with
    a=1. The whole quantization runs as ONE jitted program — eagerly it
    would be ~6 dispatches per Dense layer, seconds each over a remote
    device link (CLAUDE.md).
    """

    from collections.abc import Mapping

    def unwrap(node):
        if isinstance(node, tuple):  # flax sow appends to a tuple
            return node[0] if len(node) == 1 else node
        if isinstance(node, Mapping):
            return {k: unwrap(v) for k, v in node.items()}
        return node

    def walk(qnode: Dict, pnode: Dict, snode: Dict) -> Dict:
        if "kernel_q" in qnode:  # a QuantDense leaf group
            kernel = jnp.asarray(pnode["kernel"], jnp.float32)
            ch = jnp.asarray(snode["absmax_ch"], jnp.float32).reshape(
                kernel.shape[0]
            )
            w_row = jnp.max(jnp.abs(kernel), axis=1)  # (d_in,)
            s = jnp.where(
                (ch > 0) & (w_row > 0),
                jnp.sqrt(ch) / jnp.sqrt(jnp.maximum(w_row, 1e-12)),
                1.0,
            )
            s = jnp.clip(s, 1e-4, 1e4)
            kernel_q, w_scale = quantize_weight(s[:, None] * kernel)
            smoothed_max = jnp.max(ch / s)  # = max_j sqrt(ch_j * w_row_j)
            a = jnp.where(smoothed_max > 0, smoothed_max / _QMAX, 1.0)
            return {
                "qmul": 1.0 / (s * a),
                "kernel_q": kernel_q,
                "out_scale": a * w_scale,
            }
        return {key: walk(sub, pnode[key], snode.get(key, {}))
                for key, sub in qnode.items()}

    return jax.jit(lambda p, s: walk(q8_struct, p, s))(params, unwrap(stats))


def prune_quantized_kernels(params: Dict, q8: Dict) -> Dict:
    """Drop the fp32/bf16 ``kernel`` of every quantized Dense from a params
    tree (serve mode reads only ``bias`` + the ``q8`` collection): the
    serving bundle then holds one copy of each quantized weight (int8), not
    two. Returns a new tree; non-quantized params pass through untouched."""
    from collections.abc import Mapping

    def walk(pnode, qnode):
        if not isinstance(pnode, Mapping):
            return pnode
        if isinstance(qnode, Mapping) and "kernel_q" in qnode:
            return {k: v for k, v in pnode.items() if k != "kernel"}
        return {
            k: walk(v, qnode.get(k) if isinstance(qnode, Mapping) else None)
            for k, v in pnode.items()
        }

    return walk(params, q8)


def as_variables(p) -> Dict:
    """Normalize a pipeline's stored params into a flax variables dict:
    an int8 serving bundle ``{"params", "q8"}`` passes through; a bare
    param tree is wrapped as ``{"params": p}``. Lets one forward fn serve
    both precisions."""
    from collections.abc import Mapping

    if isinstance(p, Mapping) and "q8" in p and "params" in p:
        return p
    return {"params": p}


def quantize_model_bundle(model_serve, params, samples):
    """Family-generic int8 build: calibrate, build the q8 collection, and
    return the pruned serving bundle ``{"params", "q8"}`` for
    ``model_serve`` (built with ``quant="serve"``).

    ``samples``: tuple of preprocessed input batches for calibration, or a
    zero-arg callable producing one. Caching lives at the caller
    (registry ``_int8_bundle``), which persists the WHOLE bundle under a
    versioned name — a q8 collection is only valid with the exact params
    it was calibrated against, so this layer never caches on its own.
    """
    import dataclasses as _dc

    if callable(samples):
        samples = samples()
    calib = _dc.replace(model_serve, quant="calib")
    q8 = quantize_vit_pipeline(calib, model_serve, params, samples)
    return {"params": prune_quantized_kernels(params, q8), "q8": q8}


def quantize_vit_pipeline(model_calib, model_serve, params, sample_batch):
    """One-call calibration: returns the ``q8`` collection for
    ``model_serve.apply({"params": params, "q8": q8}, x)``.

    ``model_calib``/``model_serve`` are the same architecture built with
    ``quant="calib"`` / ``quant="serve"``; ``sample_batch`` is one or more
    preprocessed input batches (tuple → multiple).
    """
    stats = calibrate(
        model_calib,
        {"params": params},
        *(sample_batch if isinstance(sample_batch, tuple) else (sample_batch,)),
    )
    q8_struct = jax.eval_shape(
        model_serve.init,
        jax.random.PRNGKey(0),
        (sample_batch[0] if isinstance(sample_batch, tuple) else sample_batch),
    )["q8"]
    return build_q8(q8_struct, params, stats)
