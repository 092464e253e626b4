"""MapAnything parity: Flax vs torch mirror through ``convert_map_anything``
(tiny config, fp32, CPU, S=2 views).

Covers: the shared multi-view aggregator, the 6-channel dense head (unit
forward-facing rays, exp depth-along-ray, expp1 confidence, mask logits),
the cam2world pose head, and the scalar metric-scale MLP.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.map_anything import MapAnything
from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_map_anything

from torch_mirror_map_anything import TorchMapAnything

VIT = dict(dim=48, depth=2, num_heads=2)
AGG = dict(dim=64, depth=2, num_heads=4)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
LAYERS = (0, 1, 0, 1)


def test_map_anything_parity(rng):
    hw = (70, 70)
    grid = (5, 5)
    torch.manual_seed(33)
    tm = TorchMapAnything(
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
    fm = MapAnything(cfg=cfg, dtype=jnp.float32, attn_impl="xla")
    params = convert_map_anything(tm.state_dict(), vit_depth=VIT["depth"],
                                  depth=AGG["depth"])

    x = rng.standard_normal((1, 2, *hw, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        t_ray, t_dar, t_conf, t_logits, t_pose, t_msf = tm(
            torch.from_numpy(x).permute(0, 1, 4, 2, 3)
        )
    out = fm.apply({"params": params}, jnp.asarray(x))

    for ours, ref, name in [
        (out["ray_directions"], t_ray.numpy(), "ray_directions"),
        (out["depth_along_ray"], t_dar.numpy(), "depth_along_ray"),
        (out["conf"], t_conf.numpy(), "conf"),
        (out["mask_logits"], t_logits.numpy(), "mask_logits"),
        (out["pose_enc"], t_pose.numpy(), "pose_enc"),
        (out["metric_scaling_factor"], t_msf.numpy(), "metric_scaling_factor"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"

    # contract invariants: unit forward rays, positive depth/scale
    ray = np.asarray(out["ray_directions"])
    np.testing.assert_allclose(np.linalg.norm(ray, axis=-1), 1.0, atol=1e-5)
    assert (ray[..., 2] > 0).all()
    assert (np.asarray(out["depth_along_ray"]) > 0).all()
    assert (np.asarray(out["metric_scaling_factor"]) > 0).all()


def test_map_anything_registry_nonsquare_geometry():
    """Pipeline-level: for a non-square image the depth output must crop
    the pad-to-square border before resampling (regression — it used to
    stretch the padded square), and img_no_norm must be de-normalized
    [0,1] RGB."""
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    cfg = VGGTConfig(
        dim=64, depth=2, num_heads=4, head_layers=(0, 1, 0, 1),
        encoder="vits",
        vit_config=ViTConfig(dim=48, depth=2, num_heads=2,
                             pretrain_img_size=70),
        head_features=16, head_out_channels=(8, 16, 32, 32),
    )
    with allow_random_weights():
        pipe = build_pipeline("map_anything", input_size=70,
                              precision="fp32", attn_impl="xla",
                              vggt_cfg=cfg)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)  # non-square
    out = pipe(img)
    assert out["depth"].shape == (48, 96)
    assert np.isfinite(np.asarray(out["depth"])).all()
    rgb = np.asarray(out["img_no_norm"])
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
