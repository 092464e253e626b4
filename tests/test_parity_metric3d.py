"""Metric3D V2 parity: Flax vs torch mirror through convert_metric3d_v2.

Gates the reconstructed RAFT-DPT decoder (DPT neck, ConvGRU iterations,
factor-7 convex upsampling, canonical depth range activation) end to end
at <=2e-3 relative error in fp32 — the rebuild's analogue of the reference's
torch-vs-TRT max/min protocol for Metric3D (``Metric3D_V2/README.md``).
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import (
    Metric3DConfig,
    Metric3DV2,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_metric3d_v2

from torch_mirror_metric3d import TorchMetric3DV2

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
IDXS = (0, 1, 2, 3)


def test_metric3d_parity(rng):
    torch.manual_seed(13)
    tm = TorchMetric3DV2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=IDXS, hidden=32, iters=2, k=7, pretrain_img=70,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = Metric3DV2(
        encoder="tiny", iters=2, dtype=jnp.float32, attn_impl="xla",
        cfg=Metric3DConfig(
            vit_config=ViTConfig(dim=TINY["dim"], depth=TINY["depth"],
                                 num_heads=TINY["num_heads"],
                                 pretrain_img_size=70),
            features=HEAD["features"],
            out_channels=HEAD["out_channels"],
            out_indices=IDXS,
            hidden=32,
            upsample_factor=7,
        ),
    )
    params = convert_metric3d_v2(tm.state_dict(), depth=TINY["depth"])

    # H, W multiples of 14 (patch) with 7x upsample from the 2x patch grid
    hw = (70, 84)
    x = rng.standard_normal((1, *hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_d, ref_n, ref_c = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (out["depth"], ref_d.numpy(), "depth"),
        (out["normal"], ref_n.permute(0, 2, 3, 1).numpy(), "normal"),
        (out["confidence"], ref_c.numpy(), "confidence"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"


def test_canonical_shape_contract():
    """The production 616x1064 canvas factors correctly (44x76 patches,
    88x152 refinement grid, 7x upsample)."""
    assert 616 // 14 * 2 * 7 == 616
    assert 1064 // 14 * 2 * 7 == 1064
