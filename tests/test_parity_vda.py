"""Video Depth Anything parity: Flax window forward vs the torch mirror
through ``convert_vda`` (tiny config, fp32, CPU), plus the super-long-video
window stitching math (scale/shift alignment + cross-fade).

Covers: the per-frame encoder fold, temporal attention placement after each
fusion stage (incl. the sinusoidal temporal PE), the ReLU disparity head,
and the overlapping-window serving protocol of upstream ``run.py`` (the
reference ``later/Video_Depth_Anything/README.md`` pins the contract
"video -> video depth").
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.video_depth_anything import (
    VideoDepthAnything,
    align_scale_shift,
    stitch_window,
    window_starts,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_vda

from torch_mirror_vda import TorchVDA

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def _models():
    torch.manual_seed(11)
    tm = TorchVDA(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70, temporal_heads=2,
    ).eval()
    fm = VideoDepthAnything(
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        num_heads=2,
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_vda(tm.state_dict(), depth=TINY["depth"])
    return tm, fm, params


def test_vda_window_parity_vs_torch():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, 4, 70, 70, 3)).astype(np.float32)

    with torch.no_grad():
        td = tm(torch.from_numpy(clip).permute(0, 1, 4, 2, 3)).numpy()
    fd = np.asarray(fm.apply({"params": params}, jnp.asarray(clip)))

    assert fd.shape == td.shape == (1, 4, 70, 70)
    scale = np.abs(td).max() + 1e-6
    assert np.max(np.abs(fd - td)) / scale < 2e-3
    assert float(fd.min()) >= 0.0


def test_vda_temporal_mixing_matters():
    """Shuffling other frames must change a frame's depth — the property
    that distinguishes VDA from per-frame DA-V2."""
    _, fm, params = _models()
    rng = np.random.default_rng(1)
    clip = rng.standard_normal((1, 4, 70, 70, 3)).astype(np.float32)
    swapped = clip[:, [0, 2, 1, 3]]
    d = np.asarray(fm.apply({"params": params}, jnp.asarray(clip)))
    d2 = np.asarray(fm.apply({"params": params}, jnp.asarray(swapped)))
    assert not np.allclose(d[:, 0], d2[:, 0])


def test_align_scale_shift_recovers_affine():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.1, 5.0, (3, 8, 8)).astype(np.float32)
    y = 2.5 * x - 0.7
    a, b = align_scale_shift(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(a), 2.5, atol=1e-4)
    np.testing.assert_allclose(float(b), -0.7, atol=1e-4)


def test_stitch_window_continuity():
    """An affinely-rescaled re-prediction of the overlap stitches back to
    the previous window exactly (the upstream run.py stitching invariant)."""
    rng = np.random.default_rng(3)
    prev_tail = rng.uniform(0.5, 4.0, (2, 6, 6)).astype(np.float32)
    tail2 = rng.uniform(0.5, 4.0, (2, 6, 6)).astype(np.float32)
    new = jnp.concatenate(
        [jnp.asarray((prev_tail - 0.3) / 1.7), jnp.asarray((tail2 - 0.3) / 1.7)]
    )
    out = np.asarray(stitch_window(jnp.asarray(prev_tail), new, overlap=2))
    np.testing.assert_allclose(out[:2], prev_tail, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[2:], tail2, rtol=1e-4, atol=1e-4)


def test_window_starts_cover_video():
    starts = window_starts(100, 32, 10)
    assert starts[0] == 0 and starts[-1] == 68
    covered = set()
    for s in starts:
        covered.update(range(s, s + 32))
    assert covered == set(range(100))
    assert window_starts(20, 32, 10) == [0]
    assert window_starts(32, 32, 10) == [0]
