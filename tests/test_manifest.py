"""Expected-checkpoint-key manifests (weights/manifest.py).

The offline half of real-checkpoint readiness: manifests document, per
family, the exact torch state-dict layout the production converter consumes
(names + shapes), and ``verify_state_dict`` diffs any checkpoint against
them before conversion (the reference's implicit contract is 'whatever
torch.load gives', ``Depth_Anything_V2/infer.py:56`` — we make it checkable).
"""

import json
import os

import numpy as np
import pytest
import torch

from monocular_depth_estimation_trt_tpu.weights.manifest import (
    build_manifest,
    load_manifest,
    manifest_dir,
    manifest_key,
    verify_state_dict,
)


def _tiny_sd():
    from torch_mirror import TorchDepthAnythingV2

    torch.manual_seed(0)
    tm = TorchDepthAnythingV2(
        dim=64, depth=4, num_heads=2, features=16,
        out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3), pretrain_img=70,
    )
    return tm.state_dict()


def test_roundtrip_matches():
    sd = _tiny_sd()
    m = build_manifest("tiny", sd, validated=True)
    rep = verify_state_dict(sd, m)
    assert rep["ok"], rep
    assert rep["expected"] == m["total"] == len(m["keys"])


def test_missing_extra_and_shape_mismatch_reported():
    sd = dict(_tiny_sd())
    m = build_manifest("tiny", sd)

    victim = sorted(sd)[0]
    mutated = dict(sd)
    del mutated[victim]
    mutated["brand_new.weight"] = torch.zeros(3, 3)
    reshaped = sorted(sd)[1]
    mutated[reshaped] = torch.zeros(
        tuple(d + 1 for d in sd[reshaped].shape))

    rep = verify_state_dict(mutated, m)
    assert not rep["ok"]
    assert victim in rep["missing"]
    assert "brand_new.weight" in rep["extra"]
    assert reshaped in rep["shape_mismatch"]


def test_module_prefix_stripped_and_bookkeeping_ignored():
    sd = _tiny_sd()
    m = build_manifest("tiny", sd)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    wrapped["module.bn.num_batches_tracked"] = torch.zeros(1)
    rep = verify_state_dict(wrapped, m)
    assert rep["ok"], rep


def test_manifest_key_family_aliases():
    # the whole DA-V2-architecture family shares one converter layout
    assert manifest_key("distill_any_depth", "vits") == "depth_anything_v2_vits"
    assert manifest_key("depth_anything_ac", "vits") == "depth_anything_v2_vits"
    assert manifest_key("depth_anything_v2", "vitl") == "depth_anything_v2_vitl"
    # encoder-independent families
    assert manifest_key("vggt", "") == "vggt"
    assert manifest_key("streamvggt", "") == "vggt"
    assert manifest_key("depth_pro", "whatever") == "depth_pro"
    assert manifest_key("metric_anything", "vitl") == "metric_anything"


def _committed():
    d = manifest_dir()
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


@pytest.mark.parametrize("fname", _committed() or ["MISSING"])
def test_committed_manifests_are_validated(fname):
    if fname == "MISSING":
        pytest.skip("no manifests generated yet")
    with open(os.path.join(manifest_dir(), fname)) as f:
        m = json.load(f)
    assert m["total"] == len(m["keys"]) > 0
    assert m["validated_by_converter_audit"] is True, (
        f"{fname} was committed without a passing converter audit")
    # every shape is a list of ints
    for k, shp in m["keys"].items():
        assert all(isinstance(d, int) for d in shp), (k, shp)


def test_committed_vits_manifest_matches_fresh_production_mirror():
    """The committed DA-V2 vits manifest must equal a freshly-built
    production-scale mirror state dict — pins generator <-> commit drift."""
    m = load_manifest("depth_anything_v2_vits")
    if m is None:
        pytest.skip("depth_anything_v2_vits manifest not generated")
    from torch_mirror import TorchDepthAnythingV2

    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        HEAD_CONFIGS,
        INTERMEDIATE_LAYER_IDX,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    c = VIT_CONFIGS["vits"]
    tm = TorchDepthAnythingV2(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads,
        features=HEAD_CONFIGS["vits"]["features"],
        out_channels=HEAD_CONFIGS["vits"]["out_channels"],
        idxs=INTERMEDIATE_LAYER_IDX["vits"], pretrain_img=518,
    )
    rep = verify_state_dict(tm.state_dict(), m)
    assert rep["ok"], rep


def test_cli_verify_manifest_rejects_layout_mismatch(tmp_path, capsys):
    """`mdet convert --verify-manifest` exits 2 when the checkpoint layout
    differs from the committed production manifest (a tiny-dim checkpoint
    against the production manifest is exactly such a mismatch)."""
    if load_manifest("depth_anything_v2_vits") is None:
        pytest.skip("manifest not generated")
    ck = tmp_path / "tiny.pth"
    torch.save(_tiny_sd(), str(ck))

    from monocular_depth_estimation_trt_tpu.cli import main

    rc = main(["convert", "depth_anything_v2", "--encoder", "vits",
               "--checkpoint", str(ck), "--verify-manifest", "--report"])
    assert rc == 2
    out = capsys.readouterr().out
    assert "SHAPE MISMATCH" in out or "DIFFERS" in out
