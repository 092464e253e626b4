"""Prior Depth Anything parity: Flax refiner vs the torch mirror through
``convert_prior_depth`` (tiny config, fp32, CPU).

Covers: the frozen-MDE branch, the confidence-weighted scale/shift
alignment (closed-form solve), the confidence blend, the 6-channel
conditioned patch embed, and the bounded log-residual head.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.prior_depth import (
    PriorDARefiner,
    scale_shift_align,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_prior_depth

from torch_mirror_prior import TorchPriorDARefiner

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def test_scale_shift_align_recovers_affine():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.1, 2.0, (2, 10, 12)).astype(np.float32)
    prior = 3.5 * pred + 0.7
    w = rng.uniform(0.5, 1.0, pred.shape).astype(np.float32)
    s, t = scale_shift_align(jnp.asarray(pred), jnp.asarray(prior),
                             jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(s), [3.5, 3.5], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), [0.7, 0.7], rtol=1e-3)


def test_prior_refiner_parity_vs_torch():
    torch.manual_seed(11)
    tm = TorchPriorDARefiner(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70,
    ).eval()
    fm = PriorDARefiner(
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_prior_depth(tm.state_dict(), depth=TINY["depth"])

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 70, 70, 3)).astype(np.float32)
    prior = rng.uniform(0.5, 5.0, (1, 70, 70)).astype(np.float32)
    conf = rng.uniform(0.0, 2.0, (1, 70, 70)).astype(np.float32)

    with torch.no_grad():
        td = tm(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(prior),
            torch.from_numpy(conf),
        ).numpy()
    fd = np.asarray(
        fm.apply({"params": params}, jnp.asarray(img), jnp.asarray(prior),
                 jnp.asarray(conf))
    )
    assert fd.shape == td.shape == (1, 70, 70)
    scale = np.abs(td).max() + 1e-6
    assert np.max(np.abs(fd - td)) / scale < 2e-3
    assert (fd > 0).all()  # metric anchoring: positive prior -> positive depth
