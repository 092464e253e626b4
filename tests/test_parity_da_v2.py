"""End-to-end numerical parity: Flax DA-V2 vs the torch mirror, through the
weight converter.

This is the rebuild's version of the reference's torch-vs-TRT max/min parity
protocol (SURVEY.md §4): random torch weights -> ``weights/convert.py`` ->
our model; outputs must agree to tight float tolerance (fp32 compute).
Exercises: patch embed, cls token, pos-embed bicubic interpolation (non-square
input), attention packing, LayerScale, final-norm intermediate taps, every DPT
component including both transpose-conv resize layers, metric + relative
heads, SwiGLU FFN, and register tokens.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    DepthAnythingV2,
)
from monocular_depth_estimation_trt_tpu.models.vit import DinoViT, ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import (
    convert_dinovit,
    convert_dpt_head,
)

from torch_mirror import TorchDepthAnythingV2, TorchDinoViT

TINY = dict(dim=64, depth=4, num_heads=2)
TINY_HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def _tiny_flax(metric=False, ffn="mlp"):
    cfg = ViTConfig(
        dim=TINY["dim"],
        depth=TINY["depth"],
        num_heads=TINY["num_heads"],
        pretrain_img_size=70,
        ffn=ffn,
    )
    return DepthAnythingV2(
        encoder="tiny",
        metric=metric,
        max_depth=20.0,
        dtype=jnp.float32,
        attn_impl="xla",
        vit_config=cfg,
        head_features=TINY_HEAD["features"],
        head_out_channels=TINY_HEAD["out_channels"],
        out_indices=TINY_HEAD["idxs"],
    )


def _tiny_torch(metric=False, ffn="mlp"):
    torch.manual_seed(7)
    m = TorchDepthAnythingV2(
        dim=TINY["dim"],
        depth=TINY["depth"],
        num_heads=TINY["num_heads"],
        features=TINY_HEAD["features"],
        out_channels=TINY_HEAD["out_channels"],
        idxs=TINY_HEAD["idxs"],
        pretrain_img=70,
        metric=metric,
        ffn=ffn,
    )
    # non-trivial weights everywhere
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return m.eval()


def _convert(tm, depth):
    sd = {k: v for k, v in tm.state_dict().items()}
    return {
        "pretrained": convert_dinovit(sd, "pretrained", depth=depth),
        "depth_head": convert_dpt_head(sd, "depth_head"),
    }


@pytest.mark.parametrize("hw", [(70, 70), (84, 56)])
@pytest.mark.parametrize("metric", [False, True])
def test_da_v2_parity(rng, hw, metric):
    tm = _tiny_torch(metric=metric)
    fm = _tiny_flax(metric=metric)
    params = _convert(tm, TINY["depth"])

    x = rng.standard_normal((1, hw[0], hw[1], 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))

    assert ours.shape == ref.shape
    err = np.max(np.abs(ours - ref))
    scale = max(np.max(np.abs(ref)), 1e-6)
    assert err / scale < 2e-3, f"rel err {err / scale:.2e} (abs {err:.2e})"


def test_da_v2_parity_swiglu(rng):
    tm = _tiny_torch(ffn="swiglu")
    fm = _tiny_flax(ffn="swiglu")
    params = _convert(tm, TINY["depth"])
    x = rng.standard_normal((1, 70, 70, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 2e-3


def test_dinovit_register_tokens(rng):
    torch.manual_seed(3)
    tv = TorchDinoViT(64, 2, 2, pretrain_img=70, num_register_tokens=4)
    with torch.no_grad():
        for p in tv.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tv.eval()
    cfg = ViTConfig(dim=64, depth=2, num_heads=2, pretrain_img_size=70,
                    num_register_tokens=4)
    fv = DinoViT(cfg, out_indices=(1,), dtype=jnp.float32, attn_impl="xla")
    params = convert_dinovit(tv.state_dict(), "", depth=2)

    x = rng.standard_normal((1, 70, 70, 3)).astype(np.float32) * 0.5
    ref_patches, ref_cls = tv.get_intermediate_layers(
        torch.from_numpy(x).permute(0, 3, 1, 2), (1,)
    )[0]
    outs = fv.apply({"params": params}, jnp.asarray(x))
    patches, cls = outs[0]
    assert np.max(np.abs(np.asarray(patches) - ref_patches.detach().numpy())) < 1e-4
    assert np.max(np.abs(np.asarray(cls) - ref_cls.detach().numpy())) < 1e-4
