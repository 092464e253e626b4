"""VGGT parity: Flax vs torch mirror through convert_vggt.

Gates the flagship multi-view model end to end at <=2e-3 relative error in
fp32: DINOv2 patch embed, camera/register tokens, alternating frame/global
attention with 2D RoPE, the single 2-channel DPT depth head (exp depth,
1+exp confidence) and the iterative adaLN camera head — and the converter
on the full aggregator/depth_head/camera_head state-dict layout.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_vggt

from torch_mirror_vggt import TorchVGGT

VIT = dict(dim=48, depth=2, num_heads=2)
AGG = dict(dim=64, depth=2, num_heads=4)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
LAYERS = (0, 1, 0, 1)


@pytest.mark.parametrize("s", [1, 2])
def test_vggt_parity(rng, s):
    hw = (70, 70)
    grid = (hw[0] // 14, hw[1] // 14)
    torch.manual_seed(21)
    tm = TorchVGGT(
        vit_dim=VIT["dim"], vit_depth=VIT["depth"], vit_heads=VIT["num_heads"],
        dim=AGG["dim"], depth=AGG["depth"], num_heads=AGG["num_heads"],
        head_layers=LAYERS, grid_hw=grid,
        head_features=HEAD["features"], head_out_channels=HEAD["out_channels"],
        pretrain_img=70,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    cfg = VGGTConfig(
        dim=AGG["dim"], depth=AGG["depth"], num_heads=AGG["num_heads"],
        head_layers=LAYERS, encoder="vits",
        vit_config=ViTConfig(dim=VIT["dim"], depth=VIT["depth"],
                             num_heads=VIT["num_heads"], pretrain_img_size=70),
        head_features=HEAD["features"], head_out_channels=HEAD["out_channels"],
    )
    fm = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla")
    params = convert_vggt(tm.state_dict(), vit_depth=VIT["depth"],
                          depth=AGG["depth"])

    x = rng.standard_normal((1, s, *hw, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        ref_d, ref_c, ref_p = tm(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)
        )
    out = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (out["depth"], ref_d.numpy(), "depth"),
        (out["depth_conf"], ref_c.numpy(), "depth_conf"),
        (out["pose_enc"], ref_p.numpy(), "pose_enc"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"
