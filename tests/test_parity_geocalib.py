"""GeoCalib parity + solver correctness (tiny config, fp32, CPU).

1. network fields: Flax vs torch mirror through ``convert_geocalib``;
2. solver: :func:`fit_camera` recovers a known (roll, pitch, focal) from the
   analytic perspective fields — the reference's calibration contract
   (``later/GeoCalib/infer.py:30-39``: roll/pitch/vfov/focal ± uncertainty).
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.geocalib import (
    GeoCalib,
    fit_camera,
    perspective_fields,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_geocalib

from torch_mirror_geocalib import TorchGeoCalib

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def test_geocalib_fields_parity_vs_torch():
    torch.manual_seed(9)
    tm = TorchGeoCalib(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70,
    ).eval()
    fm = GeoCalib(
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_geocalib(tm.state_dict(), depth=TINY["depth"])

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        to = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    fo = fm.apply({"params": params}, jnp.asarray(x))
    for k in ("up_field", "latitude_field", "up_confidence",
              "latitude_confidence"):
        t = to[k].numpy()
        f = np.asarray(fo[k])
        assert f.shape == t.shape
        scale = np.abs(t).max() + 1e-6
        assert np.max(np.abs(f - t)) / scale < 2e-3, k


def test_fit_camera_recovers_synthetic():
    hw = (60, 80)
    roll, pitch, focal = 0.12, -0.25, 95.0
    up, lat = perspective_fields(
        jnp.float32(roll), jnp.float32(pitch), jnp.float32(focal), hw
    )
    w = jnp.ones(hw)
    est = fit_camera(up, lat, w, w, hw, iters=12)
    assert abs(float(est["roll"]) - roll) < 1e-3
    assert abs(float(est["pitch"]) - pitch) < 1e-3
    assert abs(float(est["focal"]) - focal) / focal < 1e-3
    # perfect observations -> near-zero uncertainty
    assert float(est["roll_uncertainty"]) < 1e-3
    # fov consistency
    assert abs(float(est["vfov"]) - 2 * np.arctan(hw[0] / (2 * focal))) < 1e-3


def test_fit_camera_confidence_weighting():
    """Corrupt half the latitude field; downweighting it must rescue the
    estimate (the role of the confidence heads)."""
    hw = (48, 64)
    roll, pitch, focal = -0.08, 0.18, 80.0
    up, lat = perspective_fields(
        jnp.float32(roll), jnp.float32(pitch), jnp.float32(focal), hw
    )
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.uniform(-0.8, 0.8, hw).astype(np.float32))
    bad = jnp.zeros(hw).at[:, : hw[1] // 2].set(1.0)
    lat_bad = lat + noise * bad
    w_lat = 1.0 - bad * 0.999
    est = fit_camera(up, lat_bad, jnp.ones(hw), w_lat, hw, iters=12)
    assert abs(float(est["roll"]) - roll) < 5e-3
    assert abs(float(est["pitch"]) - pitch) < 5e-3
    assert abs(float(est["focal"]) - focal) / focal < 2e-2
