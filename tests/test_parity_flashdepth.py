"""FlashDepth parity: Flax temporal step/scan vs the torch mirror through
``convert_flashdepth`` (tiny config, fp32, CPU).

Covers: the Mamba recurrence (conv FIFO + SSM state) across frames, the
temporal-residual placement inside the DPT pyramid, the no-activation final
head + clip(min=0) contract (``later/FlashDepth/wrapper.py:16-25``), and
functional state chaining (single-step calls == lax.scan over the clip).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flashdepth import (
    FlashDepth,
    flashdepth_init_state,
    flashdepth_video,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_flashdepth

from torch_mirror_flashdepth import TorchFlashDepth

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def _models():
    torch.manual_seed(7)
    tm = TorchFlashDepth(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70,
    ).eval()
    fm = FlashDepth(
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_flashdepth(tm.state_dict(), depth=TINY["depth"])
    return tm, fm, params


def test_flashdepth_clip_parity_vs_torch():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32)

    with torch.no_grad():
        td, tstate = tm(torch.from_numpy(clip).permute(0, 1, 4, 2, 3))
    fd, fstate = flashdepth_video(fm, params, jnp.asarray(clip))

    td = td.numpy()
    fd = np.asarray(fd)
    assert fd.shape == td.shape == (1, 3, 70, 70)
    scale = np.abs(td).max() + 1e-6
    assert np.max(np.abs(fd - td)) / scale < 2e-3
    # the temporal state itself must also agree (it feeds the next clip)
    for k in ("conv", "ssm"):
        ts = tstate[k].numpy()
        fs = np.asarray(fstate[k])
        s = np.abs(ts).max() + 1e-6
        assert np.max(np.abs(fs - ts)) / s < 2e-3


def test_flashdepth_temporal_state_matters():
    """Same frame twice: the second depth must differ (the SSM accumulated
    state) — the property that distinguishes FlashDepth from per-frame DA."""
    _, fm, params = _models()
    rng = np.random.default_rng(1)
    frame = rng.standard_normal((1, 70, 70, 3)).astype(np.float32)
    clip = jnp.asarray(np.stack([frame, frame], axis=1))
    depths, _ = flashdepth_video(fm, params, clip)
    d0, d1 = np.asarray(depths[:, 0]), np.asarray(depths[:, 1])
    assert not np.allclose(d0, d1)


def test_flashdepth_step_chaining_equals_scan():
    _, fm, params = _models()
    rng = np.random.default_rng(2)
    clip = rng.standard_normal((1, 2, 70, 70, 3)).astype(np.float32)

    scan_d, _ = flashdepth_video(fm, params, jnp.asarray(clip))

    apply = jax.jit(lambda p, f, s: fm.apply({"params": p}, f, s))
    state = flashdepth_init_state(fm, 1, (5, 5))
    d0, state = apply(params, jnp.asarray(clip[:, 0]), state)
    d1, state = apply(params, jnp.asarray(clip[:, 1]), state)
    np.testing.assert_allclose(np.asarray(scan_d[:, 0]), np.asarray(d0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scan_d[:, 1]), np.asarray(d1),
                               rtol=0, atol=1e-5)
    assert float(np.min(np.asarray(d0))) >= 0.0
