"""Training subsystem: losses, sharded train step, distillation, resume.

Beyond the reference (which is inference-only — no training code exists in
``/root/reference``): fine-tuning and teacher→student distillation run on
the same TPU mesh layouts the framework serves with.
"""

from monocular_depth_estimation_trt_tpu.training.losses import (
    align_scale_shift,
    distillation_loss,
    gradient_matching_loss,
    silog_loss,
    ssi_loss,
)
from monocular_depth_estimation_trt_tpu.training.trainer import (
    TrainState,
    create_train_state,
    load_train_state,
    make_train_step,
    save_train_state,
    shard_batch_tree,
    shard_train_state,
)
from monocular_depth_estimation_trt_tpu.training.distill import (
    distill,
    make_distill_step,
)
from monocular_depth_estimation_trt_tpu.training.metrics import (
    depth_metrics,
    flow_metrics,
)

__all__ = [
    "TrainState",
    "align_scale_shift",
    "create_train_state",
    "depth_metrics",
    "distill",
    "distillation_loss",
    "flow_metrics",
    "gradient_matching_loss",
    "load_train_state",
    "make_distill_step",
    "make_train_step",
    "save_train_state",
    "shard_batch_tree",
    "shard_train_state",
    "silog_loss",
    "ssi_loss",
]
