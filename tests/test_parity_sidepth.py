"""SIDepth parity: Flax two-stage SSI->SI pipeline vs the torch mirror
through ``convert_sidepth`` (tiny config, fp32, CPU).

Covers: the SSI relative stage, the per-image max normalization feeding the
4-channel SI patch embed, and the exp(log-depth) SI output.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.sidepth import SIDepth
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_sidepth

from torch_mirror_sidepth import TorchSIDepth

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def _models():
    torch.manual_seed(17)
    tm = TorchSIDepth(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70,
    ).eval()
    fm = SIDepth(
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = convert_sidepth(tm.state_dict(), depth=TINY["depth"])
    return tm, fm, params


def test_sidepth_parity_vs_torch():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 70, 84, 3)).astype(np.float32) * 0.4

    with torch.no_grad():
        r_ssi, r_depth = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    out = fm.apply({"params": params}, jnp.asarray(img))

    for ours, ref, name in [
        (out["ssi"], r_ssi.numpy(), "ssi"),
        (out["depth"], r_depth.numpy(), "depth"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape == (1, 70, 84), name
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"
    assert float(np.asarray(out["depth"]).min()) > 0.0


def test_si_stage_conditions_on_ssi():
    """Perturbing stage-1 weights must change stage-2 output through the
    SSI conditioning channel (the two stages are actually coupled)."""
    import jax

    _, fm, params = _models()
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 70, 70, 3)).astype(np.float32) * 0.4
    base = np.asarray(fm.apply({"params": params}, jnp.asarray(img))["depth"])
    bumped = jax.tree_util.tree_map(lambda x: x, params)
    bumped["ssi_head"]["output_conv2_2"]["bias"] = (
        bumped["ssi_head"]["output_conv2_2"]["bias"] + 1.0
    )
    out2 = np.asarray(fm.apply({"params": bumped}, jnp.asarray(img))["depth"])
    assert not np.allclose(base, out2)


def test_sidepth_registry_pipeline():
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    kw = dict(head_features=HEAD["features"],
              head_out_channels=HEAD["out_channels"],
              out_indices=HEAD["idxs"],
              vit_config=ViTConfig(**TINY, pretrain_img_size=70))
    with allow_random_weights():
        pipe = build_pipeline("sidepth", input_size=28, precision="fp32",
                              attn_impl="xla", model_kw=kw)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    out = pipe(img, viz=True)
    assert out["depth"].shape == (40, 56)
    assert out["ssi"].shape == (40, 56)
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert out["viz"].shape == (40, 56, 3)
