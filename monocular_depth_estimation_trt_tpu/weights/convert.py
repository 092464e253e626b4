"""Torch checkpoint -> Flax parameter conversion.

The reference loads upstream torch ``state_dict``s / safetensors directly
(e.g. ``Depth_Anything_V2/infer.py:56``,
``Distill_Any_Depth/infer.py:60-62``); the TPU framework converts them once
into our Flax layout and caches the result (``weights/store.py``) — the
weight-side analogue of the reference's build-once engine cache.

Layout rules (torch -> flax):
* Linear:           weight (out, in)            -> kernel (in, out) [transpose]
* Conv2d:           weight (out, in, kh, kw)    -> kernel (kh, kw, in, out)
* ConvTranspose2d (stride==kernel, our PixelShuffleUpsample):
                    weight (in, out, kh, kw)    -> kernel (kh, kw, in, out)
* LayerNorm:        weight/bias                 -> scale/bias
* LayerScale:       gamma                       -> gamma
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping, Optional, Set, Tuple

import numpy as np


class TrackedStateDict(Mapping):
    """Mapping wrapper that records which keys a converter actually READS.

    The de-risking layer for real upstream checkpoints: a layout mismatch
    (renamed block, extra head, different depth) shows up as tensors the
    converter never consumed — which, unaudited, would silently become
    random-init params on the Flax side. ``in`` checks do not count as
    consumption; only ``__getitem__`` does.
    """

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.accessed: Set[str] = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return self._sd[k]

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def __contains__(self, k):
        return k in self._sd


class _StripPrefixView(Mapping):
    """Lazy 'module.'-strip view that keeps reads flowing through the
    underlying (possibly tracked) mapping — a dict comprehension would read
    every value and defeat the audit."""

    def __init__(self, sd: Mapping, prefix: str):
        self._sd = sd
        self._map = {
            (k[len(prefix):] if k.startswith(prefix) else k): k for k in sd
        }

    def __getitem__(self, k):
        return self._sd[self._map[k]]

    def __iter__(self):
        return iter(self._map)

    def __len__(self):
        return len(self._map)

    def __contains__(self, k):
        return k in self._map


# Bookkeeping tensors no inference converter should be expected to consume.
_AUDIT_IGNORE = re.compile(r"(num_batches_tracked$|^n_averaged$)")


class UnconsumedKeysError(ValueError):
    """Converter left real tensors unconsumed — likely a layout mismatch."""


def convert_with_audit(
    converter: Callable[[Mapping], Dict],
    state_dict: Mapping,
    *,
    strict: bool = True,
    name: str = "",
    allowed_unconsumed: Optional[str] = None,
) -> Tuple[Dict, Dict[str, Any]]:
    """Run ``converter`` under key-consumption tracking.

    Returns ``(params, report)`` where report lists total/consumed/unconsumed
    keys. With ``strict=True`` (the production default), unexpectedly-unused
    tensors raise :class:`UnconsumedKeysError` instead of silently falling
    through to random init of the unmapped Flax params.

    ``allowed_unconsumed`` is a regex of keys a family EXPECTS to leave
    behind — the declared equivalent of upstream's ``strict=False`` loads
    (e.g. LiteVGGT's token-merge extras in ``te_dict.pt``,
    ``later/LiteVGGT/infer.py:28-31``). Matching keys are reported under
    ``ignored_extra`` and never fail the audit.
    """
    allowed = re.compile(allowed_unconsumed) if allowed_unconsumed else None
    tsd = TrackedStateDict(state_dict)
    params = converter(tsd)
    leftovers = sorted(
        k for k in state_dict
        if k not in tsd.accessed and not _AUDIT_IGNORE.search(k)
    )
    ignored_extra = [k for k in leftovers if allowed and allowed.search(k)]
    unconsumed = [k for k in leftovers if k not in set(ignored_extra)]
    report = {
        "name": name,
        "total": len(state_dict),
        "consumed": len(tsd.accessed),
        "unconsumed": unconsumed,
        "ignored_extra": ignored_extra,
    }
    if strict and unconsumed:
        head = ", ".join(unconsumed[:12])
        more = f" (+{len(unconsumed) - 12} more)" if len(unconsumed) > 12 else ""
        raise UnconsumedKeysError(
            f"converter for {name or 'model'} left {len(unconsumed)}/"
            f"{len(state_dict)} checkpoint tensors unconsumed: {head}{more}. "
            "This usually means an upstream layout mismatch; the unmapped "
            "Flax params would otherwise be silently random. Inspect with "
            "`mdet convert <model> --checkpoint <path> --report`, or pass "
            "strict=False / MDET_LOOSE_CONVERT=1 to proceed anyway."
        )
    return params, report


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv2d(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose_shuffle(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> (kh, kw, in, out)
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _join(prefix: str, name: str) -> str:
    return name if not prefix else f"{prefix}.{name}"


def convert_dinovit(sd: Mapping, prefix: str = "pretrained", depth: int = 12) -> Dict:
    """DINOv2 encoder state dict (DA-V2 ``pretrained.*`` namespace) -> our
    ``DinoViT`` params."""
    p: Dict[str, Any] = {}
    p["cls_token"] = _t(sd[_join(prefix, "cls_token")])
    if _join(prefix, "pos_embed") in sd:  # absent in RoPE-only (DINOv3) nets
        p["pos_embed"] = _t(sd[_join(prefix, "pos_embed")])
    if _join(prefix, "register_tokens") in sd:
        p["register_tokens"] = _t(sd[_join(prefix, "register_tokens")])
    p["patch_embed"] = conv2d(sd, _join(prefix, "patch_embed.proj"))
    p["norm"] = layernorm(sd, _join(prefix, "norm"))
    for i in range(depth):
        b = _join(prefix, f"blocks.{i}")
        blk: Dict[str, Any] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "ls1": {"gamma": _t(sd[f"{b}.ls1.gamma"])},
            "ls2": {"gamma": _t(sd[f"{b}.ls2.gamma"])},
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
        }
        if f"{b}.mlp.fc1.weight" in sd:
            blk["mlp"] = {
                "fc1": linear(sd, f"{b}.mlp.fc1"),
                "fc2": linear(sd, f"{b}.mlp.fc2"),
            }
        else:  # SwiGLUFFNFused (vitg)
            blk["mlp"] = {
                "w12": linear(sd, f"{b}.mlp.w12"),
                "w3": linear(sd, f"{b}.mlp.w3"),
            }
        p[f"blocks_{i}"] = blk
    return p


def convert_dpt_head(sd: Mapping, prefix: str = "depth_head") -> Dict:
    """DA-V2 DPTHead state dict -> our ``DPTHead`` params."""
    p: Dict[str, Any] = {}
    for i in range(4):
        p[f"project_{i}"] = conv2d(sd, f"{prefix}.projects.{i}")
    p["resize_0"] = conv_transpose_shuffle(sd, f"{prefix}.resize_layers.0")
    p["resize_1"] = conv_transpose_shuffle(sd, f"{prefix}.resize_layers.1")
    p["resize_3"] = conv2d(sd, f"{prefix}.resize_layers.3")
    for i in range(1, 5):
        p[f"layer{i}_rn"] = conv2d(sd, f"{prefix}.scratch.layer{i}_rn")
    for i in range(1, 5):
        rf = f"{prefix}.scratch.refinenet{i}"
        p[f"refinenet{i}"] = {
            "resConfUnit1": {
                "conv1": conv2d(sd, f"{rf}.resConfUnit1.conv1"),
                "conv2": conv2d(sd, f"{rf}.resConfUnit1.conv2"),
            },
            "resConfUnit2": {
                "conv1": conv2d(sd, f"{rf}.resConfUnit2.conv1"),
                "conv2": conv2d(sd, f"{rf}.resConfUnit2.conv2"),
            },
            "out_conv": conv2d(sd, f"{rf}.out_conv"),
        }
    p["output_conv1"] = conv2d(sd, f"{prefix}.scratch.output_conv1")
    p["output_conv2_0"] = conv2d(sd, f"{prefix}.scratch.output_conv2.0")
    p["output_conv2_2"] = conv2d(sd, f"{prefix}.scratch.output_conv2.2")
    return p


def convert_depth_anything_v2(state_dict: Mapping, encoder: str = "vits") -> Dict:
    """Full DA-V2 checkpoint (``depth_anything_v2_{enc}.pth``) -> Flax params
    for :class:`models.depth_anything_v2.DepthAnythingV2`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    depth = VIT_CONFIGS[encoder].depth
    return {
        "pretrained": convert_dinovit(state_dict, "pretrained", depth),
        "depth_head": convert_dpt_head(state_dict, "depth_head"),
    }


def conv1x1_to_dense(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d 1x1 (out, in, 1, 1) -> Dense kernel (in, out)."""
    out = {"kernel": _t(sd[f"{prefix}.weight"])[:, :, 0, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _xattn_block(sd: Mapping, prefix: str, cross: bool = False) -> Dict:
    """models.geometric.CrossAttentionBlock <- tests/torch_mirror_geometric
    TorchXAttnBlock layout."""
    p = {
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "q": linear(sd, f"{prefix}.q"),
        "kv": linear(sd, f"{prefix}.kv"),
        "proj": linear(sd, f"{prefix}.proj"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "fc1": linear(sd, f"{prefix}.fc1"),
        "fc2": linear(sd, f"{prefix}.fc2"),
    }
    if cross:
        p["norm_context"] = layernorm(sd, f"{prefix}.norm_context")
    return p


def convert_geometric(state_dict: Mapping, encoder: str = "vitb",
                      mode: str = "unidepth", depth: Optional[int] = None,
                      num_taps: int = 4, depth_layers: int = 2) -> Dict:
    """UniDepth V2 / UniK3D checkpoint (torch-mirror layout,
    ``tests/torch_mirror_geometric.py::TorchGeometricModel``) -> Flax params
    for :class:`models.geometric.GeometricDepthModel`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    p: Dict[str, Any] = {
        "pixel_encoder": convert_dinovit(sd, "pixel_encoder", depth),
        "adapter_norm": layernorm(sd, "adapter_norm"),
    }
    for i in range(num_taps):
        p[f"adapter_{i}"] = linear(sd, f"adapters.{i}")
    p["camera"] = {
        "latents": _t(sd["camera.latents"]),
        "cross": _xattn_block(sd, "camera.cross", cross=True),
        "self": _xattn_block(sd, "camera.self_block"),
        "norm": layernorm(sd, "camera.norm"),
        "out": linear(sd, "camera.out"),
    }
    p["ray_embed"] = {
        "fc1": linear(sd, "ray_embed.fc1"),
        "fc2": linear(sd, "ray_embed.fc2"),
    }
    dm: Dict[str, Any] = {
        "norm": layernorm(sd, "depth_module.norm"),
        "up1": conv_transpose_shuffle(sd, "depth_module.up1"),
        "conv1": conv2d(sd, "depth_module.conv1"),
        "up2": conv_transpose_shuffle(sd, "depth_module.up2"),
        "conv2": conv2d(sd, "depth_module.conv2"),
        "out": conv2d(sd, "depth_module.out"),
    }
    for i in range(depth_layers):
        dm[f"block_{i}"] = _xattn_block(sd, f"depth_module.blocks.{i}")
    p["depth_module"] = dm
    if mode == "unik3d":
        p["rays_module"] = {
            "block_0": _xattn_block(sd, "rays_module.block0"),
            "norm": layernorm(sd, "rays_module.norm"),
            "out": linear(sd, "rays_module.out"),
        }
    return p


def convert_moge2(state_dict: Mapping, encoder: str = "vits",
                  depth: Optional[int] = None, num_taps: int = 4,
                  num_up: int = 3, predict_normal: bool = True) -> Dict:
    """MoGe-2 / Metric Anything checkpoint (torch-mirror layout,
    ``tests/torch_mirror_geometric.py::TorchMoGe2``) -> Flax params for
    :class:`models.moge2.MoGe2`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    head: Dict[str, Any] = {}
    for i in range(num_taps):
        head[f"project_{i}"] = conv1x1_to_dense(sd, f"head.projects.{i}")
    for j in range(num_up):
        head[f"upsample_{j}_deconv"] = conv_transpose_shuffle(
            sd, f"head.upsample_blocks.{j}.0"
        )
        head[f"upsample_{j}_res"] = {
            "conv1": conv2d(sd, f"head.upsample_blocks.{j}.1.conv1"),
            "conv2": conv2d(sd, f"head.upsample_blocks.{j}.1.conv2"),
        }
    branches = ["points", "mask"] + (["normal"] if predict_normal else [])
    for name in branches:
        head[f"{name}_conv0"] = conv2d(sd, f"head.{name}_out.0")
        head[f"{name}_conv1"] = conv2d(sd, f"head.{name}_out.2")
    return {
        "backbone": convert_dinovit(sd, "backbone", depth),
        "head": head,
        "scale_fc1": linear(sd, "scale_head.0"),
        "scale_fc2": linear(sd, "scale_head.2"),
    }


def convert_depth_anything_v3(state_dict: Mapping, encoder: str = "vitl",
                              depth: Optional[int] = None) -> Dict:
    """DA-V3 checkpoint (torch-mirror layout,
    ``tests/torch_mirror_da3.py::TorchDepthAnythingV3``) -> Flax params for
    :class:`models.depth_anything_v3.DepthAnythingV3`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    head: Dict[str, Any] = {}
    for i in range(4):
        head[f"project_{i}"] = conv2d(sd, f"head.projects.{i}")
    head["resize_0"] = conv_transpose_shuffle(sd, "head.resize_layers.0")
    head["resize_1"] = conv_transpose_shuffle(sd, "head.resize_layers.1")
    head["resize_3"] = conv2d(sd, "head.resize_layers.3")
    for i in range(1, 5):
        head[f"layer{i}_rn"] = conv2d(sd, f"head.layer{i}_rn")
        head[f"refinenet{i}"] = _fusion_block(sd, f"head.refinenet{i}")
    head["output_conv1"] = conv2d(sd, "head.output_conv1")
    head["depth_conv0"] = conv2d(sd, "head.depth_branch.0")
    head["depth_conv2"] = conv2d(sd, "head.depth_branch.2")
    head["sky_conv0"] = conv2d(sd, "head.sky_branch.0")
    head["sky_conv2"] = conv2d(sd, "head.sky_branch.2")
    return {
        "backbone": convert_dinovit(sd, "backbone", depth),
        "head": head,
    }


def convert_flashdepth(state_dict: Mapping, encoder: str = "vits",
                       depth: Optional[int] = None) -> Dict:
    """FlashDepth checkpoint (torch-mirror layout,
    ``tests/torch_mirror_flashdepth.py::TorchFlashDepth``; mamba names follow
    the official ``mamba_ssm`` block) -> Flax params for
    :class:`models.flashdepth.FlashDepth`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    head = convert_dpt_head(sd, "depth_head")
    head["temporal_norm"] = layernorm(sd, "depth_head.temporal_norm")
    head["mamba"] = {
        "in_proj": linear(sd, "depth_head.mamba.in_proj"),
        "x_proj": linear(sd, "depth_head.mamba.x_proj"),
        "dt_proj": linear(sd, "depth_head.mamba.dt_proj"),
        "out_proj": linear(sd, "depth_head.mamba.out_proj"),
        "A_log": _t(sd["depth_head.mamba.A_log"]),
        "D": _t(sd["depth_head.mamba.D"]),
        # torch depthwise Conv1d weight (d_inner, 1, k) -> (k, d_inner)
        "conv1d_kernel": _t(sd["depth_head.mamba.conv1d.weight"])[:, 0, :].T,
        "conv1d_bias": _t(sd["depth_head.mamba.conv1d.bias"]),
    }
    return {
        "pretrained": convert_dinovit(sd, "pretrained", depth),
        "depth_head": head,
    }


def convert_vda(state_dict: Mapping, encoder: str = "vits",
                depth: Optional[int] = None) -> Dict:
    """Video Depth Anything checkpoint (torch-mirror layout,
    ``tests/torch_mirror_vda.py::TorchVDA``) -> Flax params for
    :class:`models.video_depth_anything.VideoDepthAnything` (DA-V2 encoder +
    DPT head with temporal attention blocks after each fusion stage)."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    head = convert_dpt_head(sd, "depth_head")
    for i in (1, 2, 3, 4):
        b = f"depth_head.temporal{i}"
        head[f"temporal_{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "qkv": linear(sd, f"{b}.qkv"),
            "proj": linear(sd, f"{b}.proj"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "fc1": linear(sd, f"{b}.fc1"),
            "fc2": linear(sd, f"{b}.fc2"),
        }
    return {
        "pretrained": convert_dinovit(sd, "pretrained", depth),
        "depth_head": head,
    }


def convert_dinov3(state_dict: Mapping, encoder: str = "vitl16") -> Dict:
    """DINOv3 depther checkpoint (torch-mirror layout,
    ``tests/torch_mirror_dinov3.py::TorchDINOv3Depther``) -> Flax params for
    :class:`models.dinov3.DINOv3Depther`. The encoder converts through
    :func:`convert_dinovit` (RoPE adds no parameters; pos_embed is absent)."""
    from monocular_depth_estimation_trt_tpu.models.dinov3 import DINOV3_CONFIGS

    depth = DINOV3_CONFIGS[encoder].depth
    return {
        "backbone": convert_dinovit(state_dict, "backbone", depth),
        "head": convert_dpt_head(state_dict, "head"),
    }


def convert_geocalib(state_dict: Mapping, encoder: str = "vits",
                     depth: Optional[int] = None) -> Dict:
    """GeoCalib checkpoint (torch-mirror layout,
    ``tests/torch_mirror_geocalib.py::TorchGeoCalib``) -> Flax params for
    :class:`models.geocalib.GeoCalib` (the Gauss-Newton camera solver is
    parameter-free)."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    return {
        "backbone": convert_dinovit(state_dict, "backbone", depth),
        "head": convert_dpt_head(state_dict, "head"),
    }


def convert_prior_depth(state_dict: Mapping, encoder: str = "vits",
                        depth: Optional[int] = None) -> Dict:
    """Prior Depth Anything checkpoint (torch-mirror layout,
    ``tests/torch_mirror_prior.py::TorchPriorDARefiner``) -> Flax params for
    :class:`models.prior_depth.PriorDARefiner` (frozen MDE + 6-channel
    conditioned refiner; both are DINOv2+DPT stacks, so the DA converters
    apply per sub-model)."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    return {
        "mde": convert_dinovit(sd, "mde", depth),
        "mde_head": convert_dpt_head(sd, "mde_head"),
        "cond": convert_dinovit(sd, "cond", depth),
        "refine_head": convert_dpt_head(sd, "refine_head"),
    }


def _fusion_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "resConfUnit1": {
            "conv1": conv2d(sd, f"{prefix}.resConfUnit1.conv1"),
            "conv2": conv2d(sd, f"{prefix}.resConfUnit1.conv2"),
        },
        "resConfUnit2": {
            "conv1": conv2d(sd, f"{prefix}.resConfUnit2.conv1"),
            "conv2": conv2d(sd, f"{prefix}.resConfUnit2.conv2"),
        },
        "out_conv": conv2d(sd, f"{prefix}.out_conv"),
    }


def convert_depth_pro(state_dict: Mapping, vit_depth: int = 24,
                      num_fusions: int = 5) -> Dict:
    """Depth Pro checkpoint (torch-mirror layout,
    ``tests/torch_mirror_depth_pro.py::TorchDepthPro``) -> Flax params for
    :class:`models.depth_pro.DepthPro`."""
    sd = state_dict

    def proj_up(prefix, n_up):
        p = {"proj": conv2d(sd, f"{prefix}.proj")}
        for i in range(n_up):
            p[f"up_{i}"] = conv_transpose_shuffle(sd, f"{prefix}.ups.{i}")
        return p

    dec: Dict[str, Any] = {}
    for i in range(num_fusions):
        if f"decoder.convs.{i}.weight" in sd:
            dec[f"conv_{i}"] = conv2d(sd, f"decoder.convs.{i}")
        fb = _fusion_block(sd, f"decoder.fusions.{i}")
        if i == num_fusions - 1:
            # the coarsest fusion takes a single input -> no resConfUnit1
            fb.pop("resConfUnit1")
        dec[f"fusion_{i}"] = fb
    return {
        "patch_encoder": convert_dinovit(sd, "patch_encoder", vit_depth),
        "image_encoder": convert_dinovit(sd, "image_encoder", vit_depth),
        "upsample_latent0": proj_up("upsample_latent0", 3),
        "upsample_latent1": proj_up("upsample_latent1", 2),
        "upsample0": proj_up("upsample0", 1),
        "upsample1": proj_up("upsample1", 1),
        "upsample2": proj_up("upsample2", 1),
        "upsample_lowres": conv_transpose_shuffle(sd, "upsample_lowres"),
        "fuse_lowres": conv2d(sd, "fuse_lowres"),
        "decoder": dec,
        "head_conv0": conv2d(sd, "head_conv0"),
        "head_up": conv_transpose_shuffle(sd, "head_up"),
        "head_conv1": conv2d(sd, "head_conv1"),
        "head_conv2": conv2d(sd, "head_conv2"),
        "fov": {
            "down0": conv2d(sd, "fov.down0"),
            "fov_proj": linear(sd, "fov.fov_proj"),
            "down1": conv2d(sd, "fov.down1"),
            "down2": conv2d(sd, "fov.down2"),
            "head": linear(sd, "fov.head"),
        },
    }


def convert_metric3d_v2(state_dict: Mapping, encoder: str = "vitl",
                        depth: Optional[int] = None) -> Dict:
    """Metric3D V2 checkpoint (torch-mirror layout,
    ``tests/torch_mirror_metric3d.py::TorchMetric3DV2``) -> Flax params for
    :class:`models.metric3d_v2.Metric3DV2`."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    neck: Dict[str, Any] = {}
    for i in range(4):
        neck[f"project_{i}"] = conv2d(sd, f"neck.projects.{i}")
    neck["resize_0"] = conv_transpose_shuffle(sd, "neck.resize_layers.0")
    neck["resize_1"] = conv_transpose_shuffle(sd, "neck.resize_layers.1")
    neck["resize_3"] = conv2d(sd, "neck.resize_layers.3")
    for i in range(1, 5):
        neck[f"layer{i}_rn"] = conv2d(sd, f"neck.layer{i}_rn")
    for i in (2, 3, 4):
        neck[f"refinenet{i}"] = _fusion_block(sd, f"neck.refinenet{i}")
    return {
        "encoder": convert_dinovit(sd, "encoder", depth),
        "neck": neck,
        "context_conv": conv2d(sd, "context_conv"),
        "init_head": conv2d(sd, "init_head"),
        # z|r fused into one conv (models/metric3d_v2.py::ConvGRU — the
        # _sep_gru layout RAFT/WAFT use); identical math, one MXU matmul
        "gru": (lambda z, r: {
            "convzr": {
                "kernel": np.concatenate([z["kernel"], r["kernel"]],
                                         axis=-1),
                "bias": np.concatenate([z["bias"], r["bias"]]),
            },
            "convq": conv2d(sd, "gru.convq"),
        })(conv2d(sd, "gru.convz"), conv2d(sd, "gru.convr")),
        "pred_encoder": conv2d(sd, "pred_encoder"),
        "delta_head": conv2d(sd, "delta_head"),
        "mask_head": conv2d(sd, "mask_head"),
        "conf_head": conv2d(sd, "conf_head"),
    }


def _aa_block(sd: Mapping, prefix: str) -> Dict:
    """VGGT alternating-attention sub-block (AASubBlock) <- torch mirror."""
    return {
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": linear(sd, f"{prefix}.attn.qkv"),
            "proj": linear(sd, f"{prefix}.attn.proj"),
        },
        "ls1": {"gamma": _t(sd[f"{prefix}.ls1.gamma"])},
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": linear(sd, f"{prefix}.mlp.fc2"),
        },
        "ls2": {"gamma": _t(sd[f"{prefix}.ls2.gamma"])},
    }


def _convert_aggregator(sd: Mapping, prefix: str, vit_depth: int,
                        depth: int) -> Dict:
    agg: Dict[str, Any] = {
        "patch_embed": convert_dinovit(sd, f"{prefix}.patch_embed", vit_depth),
        "camera_token": _t(sd[f"{prefix}.camera_token"]),
        "register_tokens": _t(sd[f"{prefix}.register_tokens"]),
    }
    if f"{prefix}.input_proj.weight" in sd:
        agg["input_proj"] = linear(sd, f"{prefix}.input_proj")
    for i in range(depth):
        agg[f"frame_{i}"] = _aa_block(sd, f"{prefix}.frame_blocks.{i}")
        agg[f"global_{i}"] = _aa_block(sd, f"{prefix}.global_blocks.{i}")
    return agg


def _convert_vggt_dpt(sd: Mapping, prefix: str) -> Dict:
    dpt: Dict[str, Any] = {}
    for i in range(4):
        dpt[f"project_{i}"] = conv2d(sd, f"{prefix}.projects.{i}")
    dpt["resize_0"] = conv_transpose_shuffle(sd, f"{prefix}.resize_layers.0")
    dpt["resize_1"] = conv_transpose_shuffle(sd, f"{prefix}.resize_layers.1")
    dpt["resize_3"] = conv2d(sd, f"{prefix}.resize_layers.3")
    for i in range(1, 5):
        dpt[f"layer{i}_rn"] = conv2d(sd, f"{prefix}.layer{i}_rn")
        dpt[f"refinenet{i}"] = _fusion_block(sd, f"{prefix}.refinenet{i}")
    dpt["output_conv1"] = conv2d(sd, f"{prefix}.output_conv1")
    dpt["output_conv2_0"] = conv2d(sd, f"{prefix}.output_conv2.0")
    dpt["output_conv2_2"] = conv2d(sd, f"{prefix}.output_conv2.2")
    return dpt


def _convert_camera_head(sd: Mapping, prefix: str, trunk_depth: int) -> Dict:
    cam: Dict[str, Any] = {
        "token_norm": layernorm(sd, f"{prefix}.token_norm"),
        "embed_pose": linear(sd, f"{prefix}.embed_pose"),
        "poseLN_modulation": linear(sd, f"{prefix}.poseLN_modulation"),
        "pose_branch_fc1": linear(sd, f"{prefix}.pose_branch.fc1"),
        "pose_branch_fc2": linear(sd, f"{prefix}.pose_branch.fc2"),
    }
    for i in range(trunk_depth):
        b = f"{prefix}.trunk.{i}"
        cam[f"trunk_{i}_norm1"] = layernorm(sd, f"{b}.norm1")
        cam[f"trunk_{i}_qkv"] = linear(sd, f"{b}.qkv")
        cam[f"trunk_{i}_proj"] = linear(sd, f"{b}.proj")
        cam[f"trunk_{i}_ls1"] = {"gamma": _t(sd[f"{b}.ls1.gamma"])}
        cam[f"trunk_{i}_norm2"] = layernorm(sd, f"{b}.norm2")
        cam[f"trunk_{i}_mlp"] = {
            "fc1": linear(sd, f"{b}.mlp.fc1"),
            "fc2": linear(sd, f"{b}.mlp.fc2"),
        }
        cam[f"trunk_{i}_ls2"] = {"gamma": _t(sd[f"{b}.ls2.gamma"])}
    return cam


def convert_vggt(state_dict: Mapping, vit_depth: int = 24, depth: int = 24,
                 trunk_depth: int = 4, with_camera: bool = True) -> Dict:
    """VGGT checkpoint (torch-mirror layout,
    ``tests/torch_mirror_vggt.py::TorchVGGT``) -> Flax params for
    :class:`models.vggt.VGGT` (aggregator / depth_head / camera_head, plus
    point_head when the checkpoint carries one — upstream VGGT's and
    STream3R's pointmap head)."""
    sd = state_dict
    out = {
        "aggregator": _convert_aggregator(sd, "aggregator", vit_depth, depth),
        "depth_head": {"dpt": _convert_vggt_dpt(sd, "depth_head.dpt")},
    }
    if "point_head.dpt.projects.0.weight" in sd:
        out["point_head"] = {"dpt": _convert_vggt_dpt(sd, "point_head.dpt")}
    if with_camera:
        out["camera_head"] = _convert_camera_head(sd, "camera_head", trunk_depth)
    return out


def convert_map_anything(state_dict: Mapping, vit_depth: int = 24,
                         depth: int = 24, trunk_depth: int = 4) -> Dict:
    """MapAnything checkpoint (torch-mirror layout,
    ``tests/torch_mirror_map_anything.py::TorchMapAnything``) -> Flax params
    for :class:`models.map_anything.MapAnything` (aggregator / dense_head /
    camera_head / metric-scale MLP)."""
    sd = state_dict
    return {
        "aggregator": _convert_aggregator(sd, "aggregator", vit_depth, depth),
        "dense_head": {"dpt": _convert_vggt_dpt(sd, "dense_head.dpt")},
        "camera_head": _convert_camera_head(sd, "camera_head", trunk_depth),
        "scale_fc1": linear(sd, "scale_fc1"),
        "scale_fc2": linear(sd, "scale_fc2"),
    }


def convert_cotracker3(state_dict: Mapping, blocks: int = 3) -> Dict:
    """CoTracker3 checkpoint (torch-mirror layout,
    ``tests/torch_mirror_cotracker.py::TorchCoTracker3``) -> Flax params for
    :class:`models.cotracker3.CoTracker3`."""
    sd = state_dict
    p: Dict[str, Any] = {
        "encoder": {
            f"conv{i}": conv2d(sd, f"encoder.conv{i}") for i in range(1, 6)
        },
        "in_proj": linear(sd, "in_proj"),
        "head_coord": linear(sd, "head_coord"),
        "head_vis": linear(sd, "head_vis"),
        "head_feat": linear(sd, "head_feat"),
    }
    for i in range(blocks):
        b = f"blocks.{i}"
        p[f"block_{i}"] = {
            "norm_time": layernorm(sd, f"{b}.norm_time"),
            "time_qkv": linear(sd, f"{b}.time_qkv"),
            "time_proj": linear(sd, f"{b}.time_proj"),
            "norm_track": layernorm(sd, f"{b}.norm_track"),
            "track_qkv": linear(sd, f"{b}.track_qkv"),
            "track_proj": linear(sd, f"{b}.track_proj"),
            "norm_mlp": layernorm(sd, f"{b}.norm_mlp"),
            "mlp_fc1": linear(sd, f"{b}.mlp_fc1"),
            "mlp_fc2": linear(sd, f"{b}.mlp_fc2"),
        }
    return p


def folded_batchnorm(sd: Mapping, prefix: str, eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """BatchNorm2d running stats -> inference affine (scale, bias)."""
    gamma = _t(sd[f"{prefix}.weight"])
    beta = _t(sd[f"{prefix}.bias"])
    mean = _t(sd[f"{prefix}.running_mean"])
    var = _t(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _sep_gru(sd: Mapping, prefix: str) -> Dict:
    """Upstream SepConvGRU convz*/convr*/convq* -> the fused z|r layout of
    :class:`models.flow.raft.SepConvGRU` (kernels concatenated along the
    output-channel axis; identical math)."""
    out: Dict[str, Any] = {}
    for i in (1, 2):
        z = conv2d(sd, f"{prefix}.convz{i}")
        r = conv2d(sd, f"{prefix}.convr{i}")
        out[f"convzr{i}"] = {
            "kernel": np.concatenate([z["kernel"], r["kernel"]], axis=-1),
            "bias": np.concatenate([z["bias"], r["bias"]]),
        }
        out[f"convq{i}"] = conv2d(sd, f"{prefix}.convq{i}")
    return out


def _convert_raft_encoder(sd: Mapping, prefix: str, norm: str) -> Dict:
    p: Dict[str, Any] = {"conv1": conv2d(sd, f"{prefix}.conv1"),
                         "conv2": conv2d(sd, f"{prefix}.conv2")}

    def maybe_norm(dst: Dict, key_dst: str, key_src: str):
        if norm == "batch":
            dst[key_dst] = folded_batchnorm(sd, key_src)
        # instance norm has no params

    maybe_norm(p, "norm1", f"{prefix}.norm1")
    for li in (1, 2, 3):
        for bi in (0, 1):
            b = f"{prefix}.layer{li}.{bi}"
            blk: Dict[str, Any] = {
                "conv1": conv2d(sd, f"{b}.conv1"),
                "conv2": conv2d(sd, f"{b}.conv2"),
            }
            maybe_norm(blk, "norm1", f"{b}.norm1")
            maybe_norm(blk, "norm2", f"{b}.norm2")
            if f"{b}.downsample.0.weight" in sd:
                blk["downsample"] = conv2d(sd, f"{b}.downsample.0")
                maybe_norm(blk, "norm3", f"{b}.downsample.1")
            p[f"layer{li}_{bi}"] = blk
    return p


def convert_raft(state_dict: Mapping) -> Dict:
    """RAFT checkpoint (raft-things.pth etc., possibly 'module.'-prefixed from
    DataParallel — reference ``RAFT/infer.py:62-65``) -> our ``RAFT`` params."""
    sd = _StripPrefixView(state_dict, "module.")
    ub = "update_block"
    step = {
        "block": {
            "encoder": {
                "convc1": conv2d(sd, f"{ub}.encoder.convc1"),
                "convc2": conv2d(sd, f"{ub}.encoder.convc2"),
                "convf1": conv2d(sd, f"{ub}.encoder.convf1"),
                "convf2": conv2d(sd, f"{ub}.encoder.convf2"),
                "conv": conv2d(sd, f"{ub}.encoder.conv"),
            },
            "gru": _sep_gru(sd, f"{ub}.gru"),
            "flow_head_conv1": conv2d(sd, f"{ub}.flow_head.conv1"),
            "flow_head_conv2": conv2d(sd, f"{ub}.flow_head.conv2"),
            "mask_conv0": conv2d(sd, f"{ub}.mask.0"),
            "mask_conv2": conv2d(sd, f"{ub}.mask.2"),
        }
    }
    return {
        "fnet": _convert_raft_encoder(sd, "fnet", "instance"),
        "cnet": _convert_raft_encoder(sd, "cnet", "batch"),
        "update_block": step,
    }


def _down16_encoder(sd: Mapping, prefix: str, norm: str) -> Dict:
    return {
        "enc8": _convert_raft_encoder(sd, f"{prefix}.enc8", norm),
        "down": conv2d(sd, f"{prefix}.down"),
    }


def convert_memfof(state_dict: Mapping) -> Dict:
    """MEMFOF checkpoint (torch-mirror layout,
    ``tests/torch_mirror_memfof.py::TorchMEMFOF``) -> Flax params for
    :class:`models.flow.memfof.MEMFOF`."""
    sd = state_dict
    ub = "update_block"
    return {
        "cnet": _down16_encoder(sd, "cnet", "instance"),
        "fnet": _down16_encoder(sd, "fnet", "instance"),
        "init_conv": conv2d(sd, "init_conv"),
        "att": {
            "to_q": linear(sd, "att.to_q"),
            "to_k": linear(sd, "att.to_k"),
        },
        "update_block": {
            "encoder": {
                "convc1": conv2d(sd, f"{ub}.encoder.convc1"),
                "convc2": conv2d(sd, f"{ub}.encoder.convc2"),
                "convf1": conv2d(sd, f"{ub}.encoder.convf1"),
                "convf2": conv2d(sd, f"{ub}.encoder.convf2"),
                "conv": conv2d(sd, f"{ub}.encoder.conv"),
            },
            "aggregator_to_v": linear(sd, f"{ub}.aggregator_to_v"),
            "aggregator_gamma": _t(sd[f"{ub}.aggregator_gamma"]),
            "gru": _sep_gru(sd, f"{ub}.gru"),
        },
        "flow_head_conv1": conv2d(sd, "flow_head.0"),
        "flow_head_conv2": conv2d(sd, "flow_head.2"),
        "upsample_weight_conv1": conv2d(sd, "upsample_weight.0"),
        "upsample_weight_conv2": conv2d(sd, "upsample_weight.2"),
    }


def convert_sidepth(state_dict: Mapping, encoder: str = "vits",
                    depth: Optional[int] = None) -> Dict:
    """SIDepth checkpoint (torch-mirror layout,
    ``tests/torch_mirror_sidepth.py::TorchSIDepth``) -> Flax params for
    :class:`models.sidepth.SIDepth` (SSI stage + 4-channel SI stage)."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    return {
        "ssi": convert_dinovit(sd, "ssi", depth),
        "ssi_head": convert_dpt_head(sd, "ssi_head"),
        "si": convert_dinovit(sd, "si", depth),
        "si_head": convert_dpt_head(sd, "si_head"),
    }


def convert_align3r(state_dict: Mapping, enc_depth: int = 24,
                    dec_depth: int = 12) -> Dict:
    """Align3R checkpoint (torch-mirror layout,
    ``tests/torch_mirror_align3r.py::TorchAlign3R``) -> Flax params for
    :class:`models.align3r.Align3R` (two-view DUSt3R-style decoder with
    depth-prior injection; heads through :func:`_convert_vggt_dpt`)."""
    sd = state_dict
    out: Dict[str, Any] = {
        "encoder": convert_dinovit(sd, "encoder", enc_depth),
        "decoder_embed": linear(sd, "decoder_embed"),
        "prior_embed": conv2d(sd, "prior_embed"),
        "head1": _convert_vggt_dpt(sd, "head1"),
        "head2": _convert_vggt_dpt(sd, "head2"),
    }
    for side in (1, 2):
        for i in range(dec_depth):
            b = f"dec{side}.{i}"
            out[f"dec{side}_{i}"] = {
                "norm1": layernorm(sd, f"{b}.norm1"),
                "self_q": linear(sd, f"{b}.self_q"),
                "self_kv": linear(sd, f"{b}.self_kv"),
                "self_proj": linear(sd, f"{b}.self_proj"),
                "norm2": layernorm(sd, f"{b}.norm2"),
                "norm_y": layernorm(sd, f"{b}.norm_y"),
                "cross_q": linear(sd, f"{b}.cross_q"),
                "cross_kv": linear(sd, f"{b}.cross_kv"),
                "cross_proj": linear(sd, f"{b}.cross_proj"),
                "norm3": layernorm(sd, f"{b}.norm3"),
                "fc1": linear(sd, f"{b}.fc1"),
                "fc2": linear(sd, f"{b}.fc2"),
            }
    return out


def convert_waft(state_dict: Mapping, encoder: str = "vits",
                 depth: Optional[int] = None) -> Dict:
    """WAFT checkpoint (torch-mirror layout,
    ``tests/torch_mirror_waft.py::TorchWAFT``) -> Flax params for
    :class:`models.flow.waft.WAFT` (DINOv2 backbone + warp-refine update;
    GRU kernels fuse z|r through :func:`_sep_gru`)."""
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    if depth is None:
        depth = VIT_CONFIGS[encoder].depth
    sd = state_dict
    ub = "update_block"
    return {
        "pretrained": convert_dinovit(sd, "pretrained", depth),
        "feat_proj": conv2d(sd, "feat_proj"),
        "feat_up": conv_transpose_shuffle(sd, "feat_up"),
        "ctx_proj": conv2d(sd, "ctx_proj"),
        "ctx_up": conv_transpose_shuffle(sd, "ctx_up"),
        "step": {"block": {
            "enc_conv1": conv2d(sd, f"{ub}.enc_conv1"),
            "enc_conv2": conv2d(sd, f"{ub}.enc_conv2"),
            "gru": _sep_gru(sd, f"{ub}.gru"),
            "flow_head_conv1": conv2d(sd, f"{ub}.flow_head_conv1"),
            "flow_head_conv2": conv2d(sd, f"{ub}.flow_head_conv2"),
        }},
        # the mask head is hoisted out of the scan (final-iteration-only)
        "mask_conv0": conv2d(sd, f"{ub}.mask_conv0"),
        "mask_conv2": conv2d(sd, f"{ub}.mask_conv2"),
    }


def _neuflow_refine(sd: Mapping, prefix: str) -> Dict:
    return {
        "init": conv2d(sd, f"{prefix}.init"),
        "gru": _sep_gru(sd, f"{prefix}.gru"),
        "enc": conv2d(sd, f"{prefix}.enc"),
        "head1": conv2d(sd, f"{prefix}.head1"),
        "head2": conv2d(sd, f"{prefix}.head2"),
    }


def convert_neuflow(state_dict: Mapping) -> Dict:
    """NeuFlow v2 checkpoint (torch-mirror layout,
    ``tests/torch_mirror_neuflow.py::TorchNeuFlow``) -> Flax params for
    :class:`models.flow.neuflow.NeuFlow`."""
    sd = state_dict

    def conv_block(prefix):
        return {
            "conv1": conv2d(sd, f"{prefix}.conv1"),
            "norm1": layernorm(sd, f"{prefix}.norm1"),  # GroupNorm affine
            "conv2": conv2d(sd, f"{prefix}.conv2"),
            "norm2": layernorm(sd, f"{prefix}.norm2"),
        }

    return {
        "backbone": {
            "block1": conv_block("backbone.block1"),
            "block2": conv_block("backbone.block2"),
            "block8": conv_block("backbone.block8"),
            "block16": conv_block("backbone.block16"),
        },
        "cross_attn": {
            "q": linear(sd, "cross_attn.q"),
            "k": linear(sd, "cross_attn.k"),
            "v": linear(sd, "cross_attn.v"),
            "proj": linear(sd, "cross_attn.proj"),
            "norm": layernorm(sd, "cross_attn.norm"),
        },
        "refine16": _neuflow_refine(sd, "refine16"),
        "refine8": _neuflow_refine(sd, "refine8"),
        "merge8": conv2d(sd, "merge8"),
        "mask8": conv2d(sd, "mask8"),
    }


def convert_meflow(state_dict: Mapping) -> Dict:
    """MeFlow checkpoint (torch-mirror layout,
    ``tests/torch_mirror_meflow.py::TorchMeFlow``) -> Flax params for
    :class:`models.flow.meflow.MeFlow`."""
    sd = state_dict
    ub = "update_block"
    return {
        "fnet": _convert_raft_encoder(sd, "fnet", "instance"),
        "cnet": _convert_raft_encoder(sd, "cnet", "batch"),
        "attn_h": {
            "query": conv2d(sd, "attn_h.query_conv"),
            "key": conv2d(sd, "attn_h.key_conv"),
        },
        "attn_v": {
            "query": conv2d(sd, "attn_v.query_conv"),
            "key": conv2d(sd, "attn_v.key_conv"),
        },
        "step": {
            "update_block": {
                "encoder": {
                    "convc1": conv2d(sd, f"{ub}.encoder.convc1"),
                    "convc2": conv2d(sd, f"{ub}.encoder.convc2"),
                    "convf1": conv2d(sd, f"{ub}.encoder.convf1"),
                    "convf2": conv2d(sd, f"{ub}.encoder.convf2"),
                    "conv": conv2d(sd, f"{ub}.encoder.conv"),
                },
                "gru": _sep_gru(sd, f"{ub}.gru"),
                "flow_head_conv1": conv2d(sd, f"{ub}.flow_head.conv1"),
                "flow_head_conv2": conv2d(sd, f"{ub}.flow_head.conv2"),
                "mask_conv0": conv2d(sd, f"{ub}.mask.0"),
                "mask_conv2": conv2d(sd, f"{ub}.mask.2"),
            }
        },
    }


def load_torch_state_dict(path: str) -> Mapping:
    """Load a ``.pth``/``.pt``/``.safetensors`` checkpoint to numpy-friendly
    tensors (CPU)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    return strip_wrapper_prefix(sd)


def strip_wrapper_prefix(sd: Mapping) -> Mapping:
    """Strip a uniform training-wrapper prefix off every checkpoint key.

    Upstream checkpoints saved from ``torch.nn.DataParallel`` carry
    ``module.`` on every key (the reference unwraps exactly this,
    ``RAFT/infer.py:62-65``); ``torch.compile`` saves add ``_orig_mod.``.
    Only strips when EVERY key carries the prefix — a mixed layout is a
    real mismatch the audit should surface, not paper over."""
    for prefix in ("module.", "_orig_mod."):
        keys = list(sd)
        if keys and all(k.startswith(prefix) for k in keys):
            sd = _StripPrefixView(sd, prefix)
    return sd
