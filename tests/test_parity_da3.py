"""DA-V3 parity: Flax vs torch mirror through convert_depth_anything_v3
(dual-branch DPT head: exp metric depth + sigmoid sky mask)."""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v3 import (
    DA3Config,
    DepthAnythingV3,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import (
    convert_depth_anything_v3,
)

from torch_mirror_da3 import TorchDepthAnythingV3

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
IDXS = (0, 1, 2, 3)


def test_da3_parity(rng):
    torch.manual_seed(31)
    tm = TorchDepthAnythingV3(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=IDXS, pretrain_img=70,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = DepthAnythingV3(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla",
        cfg=DA3Config(
            vit_config=ViTConfig(dim=TINY["dim"], depth=TINY["depth"],
                                 num_heads=TINY["num_heads"],
                                 pretrain_img_size=70),
            features=HEAD["features"],
            out_channels=HEAD["out_channels"],
            out_indices=IDXS,
        ),
    )
    params = convert_depth_anything_v3(tm.state_dict(), depth=TINY["depth"])

    x = rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_d, ref_s = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    depth, sky = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (depth, ref_d.numpy(), "depth"),
        (sky, ref_s.numpy(), "sky"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"
