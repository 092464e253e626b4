"""Teacher→student depth distillation on TPU.

The zoo already *serves* distilled models (Distill-Any-Depth, reference
``Distill_Any_Depth/infer.py:50-58``; Depth-Anything itself is distilled
from labeled+pseudo-labeled data). The reference cannot produce one — it is
inference-only. This driver can: a frozen teacher pipeline generates
disparity pseudo-labels on the fly and a student trains against them with
the SSI + gradient-matching objective, all on the same chips that serve.

Kept deliberately small: images arrive as a ``(N, H, W, 3)`` uint8 array or
an iterator of such batches; heavier data plumbing belongs to the caller
(``apps/offline.py`` already decodes image dirs at line rate).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.training.losses import distillation_loss
from monocular_depth_estimation_trt_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
)
from monocular_depth_estimation_trt_tpu.utils.logging import log


def make_distill_step(
    student_apply: Callable[[Any, jax.Array], jax.Array],
    tx,
    *,
    grad_weight: float = 0.5,
    accum_steps: int = 1,
    remat: bool = False,
):
    """Train step for distillation.

    ``student_apply(params, images_f32) -> depth (B,h,w)``; the batch is a
    ``(images, teacher_depth)`` tuple. Teacher targets are resized by the
    caller to the student's output resolution.
    """

    def loss_fn(params, batch):
        images, teacher = batch
        pred = student_apply(params, images)
        return distillation_loss(pred, teacher, grad_weight=grad_weight)

    return make_train_step(loss_fn, tx, accum_steps=accum_steps, remat=remat)


def distill(
    teacher_fn: Callable[[np.ndarray], np.ndarray],
    student_apply: Callable[[Any, jax.Array], jax.Array],
    init_params: Any,
    batches: Iterable[np.ndarray],
    *,
    steps: int,
    learning_rate: float = 3e-4,
    weight_decay: float = 1e-4,
    warmup: int = 10,
    grad_weight: float = 0.5,
    accum_steps: int = 1,
    log_every: int = 10,
) -> Tuple[TrainState, list]:
    """Run the distillation loop; returns (final state, loss history).

    ``teacher_fn(images_f32) -> depth`` is the frozen teacher (typically a
    jitted serving pipeline); ``batches`` yields preprocessed image batches
    ``(B, H, W, 3)`` float32 and is cycled until ``steps`` updates are done.
    AdamW with linear warmup + cosine decay — the schedule the DA family
    fine-tunes with.
    """
    import optax

    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps=max(warmup, 1),
        decay_steps=max(steps, warmup + 1),
    )
    tx = optax.adamw(sched, weight_decay=weight_decay)
    state = create_train_state(init_params, tx)
    step_fn = make_distill_step(
        student_apply, tx, grad_weight=grad_weight, accum_steps=accum_steps
    )

    def cycle(src):
        # Cache items on the first pass only, then loop the cache; yields
        # (position, item) so teacher labels memoize per batch position.
        seen = []
        for item in src:
            seen.append(item)
            yield len(seen) - 1, item
        if not seen:
            raise ValueError("batches iterator was empty")
        while True:
            yield from enumerate(seen)

    history = []
    teacher_cache: dict = {}
    it = cycle(iter(batches))
    for i in range(steps):
        pos, imgs = next(it)
        if pos not in teacher_cache:  # frozen teacher: label each batch once
            teacher_cache[pos] = np.asarray(teacher_fn(imgs))
        teacher = teacher_cache[pos]
        state, metrics = step_fn(state, (jnp.asarray(imgs), jnp.asarray(teacher)))
        # keep the loss on device: a float() here would force a ~28 ms
        # host round-trip per step over the remote-TPU tunnel and stop
        # steps from pipelining; only the log points read back
        history.append(metrics["loss"])
        if log_every and (i % log_every == 0 or i == steps - 1):
            log(f"distill step {i + 1}/{steps}: loss={float(metrics['loss']):.5f} "
                f"grad_norm={float(metrics['grad_norm']):.4f}")
    return state, [float(x) for x in history]
