"""Sharding rules: map model parameter/activation names to mesh axes.

The one place model parallelism pays off in this workload is the VGGT-1B
aggregator (24 transformer blocks over ~1374 tokens/view, reference
``VGGT/onnx_export2.py:24-26``): its attention heads and MLP hidden dim shard
over the ``model`` axis (Megatron-style column/row split — XLA inserts the
all-reduce), and multi-view token batches shard over ``data``/``seq``.

Everything else (518x518 single-image depth nets) runs replicated on one chip;
these helpers then degrade to no-ops on a 1-device mesh.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (weights on every chip)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Shard the leading (batch) dimension over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


class ShardingRules:
    """Regex -> PartitionSpec table applied over a params pytree.

    Example (VGGT aggregator tensor parallelism)::

        rules = ShardingRules([
            (r".*attn.*(qkv|query|key|value).*kernel", P(None, "model")),
            (r".*attn.*proj.*kernel",                  P("model", None)),
            (r".*mlp.*fc1.*kernel",                    P(None, "model")),
            (r".*mlp.*fc2.*kernel",                    P("model", None)),
        ])
        sharded_params = rules.apply(mesh, params)
    """

    def __init__(self, rules: Sequence[Tuple[str, P]], default: P = P()):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]
        self.default = default

    def spec_for(self, path: str, ndim: int) -> P:
        for pat, spec in self.rules:
            if pat.fullmatch(path) or pat.search(path):
                if len(spec) <= ndim:
                    return spec
        return self.default

    def tree_specs(self, params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def path_str(kp):
            return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

        specs = {}
        for kp, leaf in flat:
            specs[path_str(kp)] = self.spec_for(path_str(kp), getattr(leaf, "ndim", 0))
        return specs

    def apply(self, mesh: Mesh, params):
        def put(kp, leaf):
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            spec = self.spec_for(path, getattr(leaf, "ndim", 0))
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(put, params)


# Default tensor-parallel rules for ViT-style transformers (flax.linen param
# naming as produced by our models/vit.py). Column-parallel QKV/fc1, row-
# parallel proj/fc2; XLA emits the single all-reduce per block over ICI.
# These reach EVERY DinoViT in the zoo regardless of its parent scope name
# (pretrained/, encoder/, pixel_encoder/, patch_encoder/, image_encoder/ …)
# because the patterns are search-matched on the full param path.
VIT_TP_RULES = [
    (r".*attn/qkv/kernel", P(None, "model")),
    (r".*attn/proj/kernel", P("model", None)),
    (r".*mlp/fc1/kernel", P(None, "model")),
    (r".*mlp/fc2/kernel", P("model", None)),
    (r".*mlp/w12/kernel", P(None, "model")),
    (r".*mlp/w3/kernel", P("model", None)),
]

# Cross/self-attention decoder blocks of the geometric family
# (models/geometric.py CrossAttentionBlock: q/kv Dense + bare proj/fc1/fc2 —
# the conditioned decoder the reference exports as part of UniDepth V2 /
# UniK3D / MoGe-2 ONNX graphs, Uni_Depth_V2/onnx_export.py). q/kv split over
# heads (column), proj consumes head-sharded attention output (row); the MLP
# splits like the ViT's.
CROSS_ATTN_TP_RULES = [
    (r".*(cross|self|block_\d+)/q/kernel", P(None, "model")),
    (r".*(cross|self|block_\d+)/kv/kernel", P(None, "model")),
    (r".*(cross|self|block_\d+)/proj/kernel", P("model", None)),
    (r".*(cross|self|block_\d+)/fc1/kernel", P(None, "model")),
    (r".*(cross|self|block_\d+)/fc2/kernel", P("model", None)),
]

# Metric3D V2's iterative decoder (models/metric3d_v2.py): the DPT-neck
# fusion blocks split Megatron-style as a conv pair — ResConfUnit conv1
# output-channel (column) / conv2 input-channel (row), one all-reduce per
# unit — and the ConvGRU gates split the hidden channel so the recurrent
# state h stays sharded across lax.scan iterations (conv kernels are HWIO).
METRIC3D_DECODER_TP_RULES = [
    (r".*resConfUnit\d/conv1/kernel", P(None, None, None, "model")),
    (r".*resConfUnit\d/conv2/kernel", P(None, None, "model", None)),
    (r".*gru/conv[zrq]/kernel", P(None, None, None, "model")),
]


def vit_tp_rules() -> ShardingRules:
    return ShardingRules(VIT_TP_RULES)


def geometric_tp_rules() -> ShardingRules:
    """UniDepth V2 / UniK3D / MoGe-2: ViT encoder TP + cross-attn decoder TP."""
    return ShardingRules(VIT_TP_RULES + CROSS_ATTN_TP_RULES)


def metric3d_tp_rules() -> ShardingRules:
    """Metric3D V2: ViT encoder TP + DPT-neck/GRU decoder channel split."""
    return ShardingRules(VIT_TP_RULES + METRIC3D_DECODER_TP_RULES)


# Registry family name -> rule factory. Families absent here use the plain
# ViT table (which already shards Depth Pro's dual DinoViT encoders, the
# VGGT aggregator, and every DPT-family backbone); the entries below ADD
# decoder coverage where the encoder rules alone would leave the hot decoder
# replicated. ``pipelines.DepthPipeline.apply_mesh`` resolves through this.
FAMILY_TP_RULES = {
    "unidepth_v2": geometric_tp_rules,
    "unik3d": geometric_tp_rules,
    "moge2": geometric_tp_rules,
    "metric_anything": geometric_tp_rules,
    "metric3d_v2": metric3d_tp_rules,
}


def rules_for_family(name: Optional[str]) -> ShardingRules:
    """Sharding rules for a registry family name (default: ViT TP table)."""
    factory = FAMILY_TP_RULES.get((name or "").lower(), vit_tp_rules)
    return factory()
