"""Numerical parity for the camera-aware 3D family (UniDepth V2 / UniK3D /
MoGe-2) — Flax vs the torch mirrors, through the weight converters.

Same protocol as test_parity_da_v2.py: random torch weights ->
weights/convert.py -> our model; outputs agree to <=2e-3 relative error in
fp32. This gates the reconstructed decoder topologies end to end (camera
module, SH ray embedding, conditioned attention decoder, MoGe upsample head,
metric-scale head) and the converters on their state-dict layouts.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.geometric import (
    GeometricConfig,
    GeometricDepthModel,
)
from monocular_depth_estimation_trt_tpu.models.moge2 import MoGe2, MoGeConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import (
    convert_geometric,
    convert_moge2,
)

from torch_mirror_geometric import TorchGeometricModel, TorchMoGe2, real_sh_torch

TINY = dict(dim=64, depth=4, num_heads=2)
DEC = 64
IDXS = (0, 1, 2, 3)


def _randomize(m: torch.nn.Module, seed: int = 11):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return m.eval()


def test_sh_torch_matches_jax(rng):
    v = rng.standard_normal((32, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    from monocular_depth_estimation_trt_tpu.ops.spherical_harmonics import (
        real_spherical_harmonics,
    )

    ours = np.asarray(real_spherical_harmonics(jnp.asarray(v), 8))
    ref = real_sh_torch(torch.from_numpy(v), 8).numpy()
    assert np.allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["unidepth", "unik3d"])
def test_geometric_parity(rng, mode):
    tm = TorchGeometricModel(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        decoder_dim=DEC, idxs=IDXS, mode=mode, pretrain_img=70,
    )
    hw = (70, 84)
    tm.build_camera(hw)
    _randomize(tm)

    fm = GeometricDepthModel(
        encoder="tiny", mode=mode, dtype=jnp.float32, attn_impl="xla",
        cfg=GeometricConfig(
            vit_config=ViTConfig(dim=TINY["dim"], depth=TINY["depth"],
                                 num_heads=TINY["num_heads"],
                                 pretrain_img_size=70),
            decoder_dim=DEC,
            out_indices=IDXS,
        ),
    )
    params = convert_geometric(tm.state_dict(), mode=mode, depth=TINY["depth"])

    x = rng.standard_normal((1, *hw, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_pts, ref_conf, ref_K = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (out["pts_3d"], ref_pts.numpy(), "pts_3d"),
        (out["confidence"], ref_conf.numpy(), "confidence"),
        (out["intrinsics"], ref_K.numpy(), "intrinsics"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"


@pytest.mark.parametrize("predict_normal", [True, False])
def test_moge2_parity(rng, predict_normal):
    tm = TorchMoGe2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        idxs=IDXS, proj_dim=32, up_dims=(16, 16, 8),
        predict_normal=predict_normal, pretrain_img=70, num_tokens=25,
    )
    _randomize(tm, seed=5)

    fm = MoGe2(
        encoder="tiny", num_tokens=25, predict_normal=predict_normal,
        dtype=jnp.float32, attn_impl="xla",
        cfg=MoGeConfig(
            vit_config=ViTConfig(dim=TINY["dim"], depth=TINY["depth"],
                                 num_heads=TINY["num_heads"],
                                 pretrain_img_size=70),
            proj_dim=32,
            up_dims=(16, 16, 8),
            out_indices=IDXS,
        ),
    )
    params = convert_moge2(tm.state_dict(), depth=TINY["depth"],
                           predict_normal=predict_normal)

    x = rng.standard_normal((1, 63, 112, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = fm.apply({"params": params}, jnp.asarray(x))

    keys = ["points", "mask", "metric_scale"] + (
        ["normal"] if predict_normal else []
    )
    for k in keys:
        ours = np.asarray(out[k])
        ref_k = ref[k].numpy()
        assert ours.shape == ref_k.shape, (k, ours.shape, ref_k.shape)
        err = np.max(np.abs(ours - ref_k)) / max(np.max(np.abs(ref_k)), 1e-6)
        assert err < 2e-3, f"{k} rel err {err:.2e}"
