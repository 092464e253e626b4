"""Fidelity promotions for the two previously architecture-matched entries.

bridge  — the reference serves a DA-V2-style DPT graph and a specific
          postprocess: ``F.interpolate(..., align_corners=True)`` +
          ``clamp(1e-3, 1e3)`` (``later/BRIDGE/infer.py:76-78``). The graph/
          converter are already gated by ``test_parity_da_v2.py``; here the
          END-TO-END serving contract is checked against a torch replication
          of that exact postprocess.

litevggt — the reference loads vanilla VGGT weights from ``te_dict.pt`` with
          ``strict=False`` (``later/LiteVGGT/infer.py:28-31``), i.e. the
          checkpoint carries token-merge extras the graph ignores. Here that
          load semantics is DECLARED (``allowed_unconsumed``) so extras are
          reported-not-fatal while a genuinely unknown key still fails.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.weights import convert as C

from torch_mirror import TorchDepthAnythingV2

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def test_bridge_serving_contract_matches_reference_postprocess(rng):
    """Tiny DA graph + bridge postprocess vs the torch replication of
    ``later/BRIDGE/infer.py:72-78`` (forward -> align_corners upsample to the
    original shape -> clamp)."""
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.ops.postprocess import (
        upsample_depth,
    )

    torch.manual_seed(7)
    tm = TorchDepthAnythingV2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=HEAD["idxs"], pretrain_img=70,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    fm = DepthAnythingV2(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla",
        vit_config=ViTConfig(**TINY, pretrain_img_size=70),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=HEAD["idxs"],
    )
    sd = tm.state_dict()
    params = {
        "pretrained": C.convert_dinovit(sd, "pretrained", TINY["depth"]),
        "depth_head": C.convert_dpt_head(sd, "depth_head"),
    }

    x = rng.standard_normal((1, 70, 70, 3)).astype(np.float32) * 0.5
    out_hw = (96, 128)  # non-square original, upsample is load-bearing

    with torch.no_grad():
        td = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    # reference BRIDGE postprocess (infer.py:76-78)
    td = F.interpolate(td[:, None], out_hw, mode="bilinear",
                       align_corners=True)[0, 0]
    td = torch.clamp(td, min=1e-3, max=1e3).numpy()

    depth = fm.apply({"params": params}, jnp.asarray(x))
    ours = np.asarray(
        upsample_depth(depth, out_hw, clamp=(1e-3, 1e3))[0]
    )
    assert ours.shape == td.shape
    scale = max(np.max(np.abs(td)), 1e-6)
    assert np.max(np.abs(ours - td)) / scale < 2e-3


def _vggt_mirror():
    from torch_mirror_vggt import TorchVGGT

    torch.manual_seed(21)
    return TorchVGGT(
        vit_dim=48, vit_depth=2, vit_heads=2, dim=64, depth=2, num_heads=4,
        head_layers=(0, 1, 0, 1), grid_hw=(5, 5), head_features=16,
        head_out_channels=(8, 16, 32, 32), pretrain_img=70,
    )


LITEVGGT_ALLOWED = r"(^|\.)(te|te_dict|token_merge|merge)[._]"


def test_litevggt_strict_false_load_semantics():
    """A te_dict-style checkpoint (VGGT weights + token-merge extras)
    converts cleanly under the declared allowlist; the extras land in the
    report, and an undeclared foreign key still fails."""
    import functools

    tm = _vggt_mirror()
    sd = dict(tm.state_dict())
    sd["te.level_embed"] = torch.zeros(4, 8)
    sd["token_merge.ratio"] = torch.zeros(())

    conv = functools.partial(C.convert_vggt, vit_depth=2, depth=2)
    params, report = C.convert_with_audit(
        conv, sd, strict=True, name="litevggt",
        allowed_unconsumed=LITEVGGT_ALLOWED,
    )
    assert report["unconsumed"] == []
    assert sorted(report["ignored_extra"]) == [
        "te.level_embed", "token_merge.ratio",
    ]
    assert "aggregator" in params or len(params) > 0

    sd["totally_unknown.weight"] = torch.zeros(3)
    try:
        C.convert_with_audit(conv, sd, strict=True,
                             allowed_unconsumed=LITEVGGT_ALLOWED)
    except C.UnconsumedKeysError as e:
        assert "totally_unknown.weight" in str(e)
    else:
        raise AssertionError("undeclared extra key must fail the audit")


def test_litevggt_registry_allowlist_matches():
    """The pattern wired into the registry factory is the one tested here."""
    import inspect

    from monocular_depth_estimation_trt_tpu import registry

    src = inspect.getsource(registry.litevggt)
    assert LITEVGGT_ALLOWED.replace("\\", "\\\\") in src or \
        LITEVGGT_ALLOWED in src


def test_promoted_fidelity_tags():
    from monocular_depth_estimation_trt_tpu.registry import get_fidelity

    assert get_fidelity("bridge") == "converter-verified"
    assert get_fidelity("litevggt") == "converter-verified"
