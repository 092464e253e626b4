"""Converter layout-variant fuzzing (round-4 verdict item 6).

The environment is offline — no real upstream checkpoint has ever been
converted — so PARITY.md's claim "a real checkpoint would only need the key
mapping adjusted" must be de-risked adversarially: feed every family
converter plausible upstream layout VARIANTS (split qkv, wrapper prefixes,
extra heads/buffers, deeper nets, missing tensors, safetensors numpy values)
and assert the outcome is either correct consumption or a LOUD structured
diff (``UnconsumedKeysError`` / ``KeyError`` from the converter, or
missing/extra keys from the manifest verifier) — never silent random init.

Variant sources: DataParallel ``module.`` saves (reference
``RAFT/infer.py:62-65``), hub safetensors (``Distill_Any_Depth/
infer.py:60-62``), fused-vs-split qkv across timm/open_clip lineages,
auxiliary training buffers in hub checkpoints.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from monocular_depth_estimation_trt_tpu.weights import convert as C
from monocular_depth_estimation_trt_tpu.weights.manifest import (
    build_manifest,
    verify_state_dict,
)
from test_convert_exhaustive import BUILDERS

# One representative per converter *pattern* keeps the fuzz matrix fast on
# the 1-core CI box; test_convert_exhaustive already runs every family.
FUZZ_FAMILIES = sorted(BUILDERS)


@pytest.fixture(scope="module")
def family_sd():
    cache = {}

    def get(name):
        if name not in cache:
            torch.manual_seed(0)
            tm, converter = BUILDERS[name]()
            cache[name] = (dict(tm.state_dict()), converter)
        return cache[name]

    return get


@pytest.mark.parametrize("name", FUZZ_FAMILIES)
def test_extra_head_is_loud(family_sd, name):
    """An unexpected extra tensor (e.g. an upstream aux head we do not
    model) must raise UnconsumedKeysError naming it, and the manifest diff
    must report it as extra."""
    sd, converter = family_sd(name)
    variant = dict(sd)
    variant["totally_new_aux_head.weight"] = torch.zeros(3, 3)
    with pytest.raises(C.UnconsumedKeysError, match="totally_new_aux_head"):
        C.convert_with_audit(converter, variant, strict=True, name=name)
    report = verify_state_dict(variant, build_manifest(name, sd))
    assert not report["ok"]
    assert "totally_new_aux_head.weight" in report["extra"]
    assert report["missing"] == []


@pytest.mark.parametrize("name", FUZZ_FAMILIES)
def test_missing_tensor_is_loud(family_sd, name):
    """A missing tensor (renamed block upstream) must fail conversion with
    the missing key in the error, and the manifest diff must list it."""
    sd, converter = family_sd(name)
    variant = dict(sd)
    # drop the first weight-bearing tensor a converter must read
    victim = next(k for k in variant if k.endswith(".weight"))
    del variant[victim]
    with pytest.raises(KeyError):
        C.convert_with_audit(converter, variant, strict=True, name=name)
    report = verify_state_dict(variant, build_manifest(name, sd))
    assert not report["ok"] and victim in report["missing"]


@pytest.mark.parametrize("name", FUZZ_FAMILIES)
def test_bookkeeping_buffers_are_tolerated(family_sd, name):
    """BatchNorm/SWA bookkeeping buffers in hub checkpoints must neither
    fail the strict audit nor dirty the manifest diff."""
    sd, converter = family_sd(name)
    variant = dict(sd)
    variant["encoder.bn.num_batches_tracked"] = torch.tensor(7)
    variant["n_averaged"] = torch.tensor(3)
    _, report = C.convert_with_audit(converter, variant, strict=True,
                                     name=name)
    assert report["unconsumed"] == []
    vreport = verify_state_dict(variant, build_manifest(name, sd))
    assert vreport["ok"], vreport


@pytest.mark.parametrize("name", FUZZ_FAMILIES)
def test_numpy_values_convert_identically(family_sd, name):
    """safetensors loads yield numpy arrays, not torch tensors
    (``load_torch_state_dict``); converters must be value-type agnostic."""
    sd, converter = family_sd(name)
    as_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    p_t, _ = C.convert_with_audit(converter, dict(sd), strict=True, name=name)
    p_n, _ = C.convert_with_audit(converter, as_np, strict=True, name=name)
    flat_t, flat_n = _flatten(p_t), _flatten(p_n)
    assert flat_t.keys() == flat_n.keys()
    for k in flat_t:
        np.testing.assert_array_equal(flat_t[k], flat_n[k])


@pytest.mark.parametrize("prefix", ["module.", "_orig_mod."])
def test_wrapper_prefix_stripped_on_load(tmp_path, prefix):
    """DataParallel / torch.compile checkpoints carry a uniform wrapper
    prefix; the load path must strip it so the converter sees the canonical
    layout (reference RAFT/infer.py:62-65 unwraps .module)."""
    sd, converter = _small_family()
    wrapped = {prefix + k: v for k, v in sd.items()}
    path = tmp_path / "wrapped.pth"
    torch.save(wrapped, str(path))
    loaded = C.load_torch_state_dict(str(path))
    assert set(loaded) == set(sd)
    _, report = C.convert_with_audit(converter, loaded, strict=True,
                                     name="wrapped")
    assert report["unconsumed"] == []


def test_mixed_prefix_not_papered_over(tmp_path):
    """A PARTIAL wrapper prefix is a real layout mismatch — the loader must
    NOT strip it, and the audit must be loud."""
    sd, converter = _small_family()
    items = list(sd.items())
    wrapped = {("module." + k if i % 2 else k): v
               for i, (k, v) in enumerate(items)}
    path = tmp_path / "mixed.pth"
    torch.save(wrapped, str(path))
    loaded = C.load_torch_state_dict(str(path))
    assert any(k.startswith("module.") for k in loaded)
    with pytest.raises((KeyError, C.UnconsumedKeysError)):
        C.convert_with_audit(converter, loaded, strict=True, name="mixed")


def test_split_qkv_variant_is_loud(family_sd):
    """Some ViT lineages ship q/k/v as separate projections instead of the
    fused qkv our DINOv2 layout expects; the diff must name exactly the
    fused keys as missing and the split keys as extra, proving 'only the
    key mapping needs adjusting'."""
    sd, converter = family_sd("depth_anything_v2")
    variant = dict(sd)
    qkv_keys = [k for k in sd if k.endswith("attn.qkv.weight")]
    assert qkv_keys
    for k in qkv_keys:
        w = variant.pop(k)
        b = variant.pop(k.replace(".weight", ".bias"))
        d = w.shape[0] // 3
        for i, nm in enumerate("qkv"):
            variant[k.replace("qkv.weight", f"{nm}.weight")] = (
                w[i * d:(i + 1) * d])
            variant[k.replace("qkv.weight", f"{nm}.bias")] = (
                b[i * d:(i + 1) * d])
    with pytest.raises(KeyError):
        C.convert_with_audit(converter, variant, strict=True, name="splitqkv")
    report = verify_state_dict(variant, build_manifest("da", sd))
    assert not report["ok"]
    assert set(qkv_keys) <= set(report["missing"])
    assert any(k.endswith("attn.q.weight") for k in report["extra"])


def test_deeper_net_variant_is_loud(family_sd):
    """An upstream with MORE blocks than our config (wrong encoder preset
    picked) leaves the extra blocks unconsumed — loud, with the block names
    in the error."""
    sd, converter = family_sd("depth_anything_v2")
    variant = dict(sd)
    depth = max(int(k.split(".")[2]) for k in sd
                if k.startswith("pretrained.blocks.")) + 1
    for k, v in sd.items():
        pre = f"pretrained.blocks.{depth - 1}."
        if k.startswith(pre):
            variant[f"pretrained.blocks.{depth}." + k[len(pre):]] = v
    with pytest.raises(C.UnconsumedKeysError,
                       match=rf"blocks\.{depth}\."):
        C.convert_with_audit(converter, variant, strict=True, name="deeper")


def test_shape_mismatch_reported_by_manifest(family_sd):
    """Same names, different width (wrong encoder size): the manifest diff
    reports shape mismatches keyed by tensor."""
    sd, _ = family_sd("depth_anything_v2")
    variant = dict(sd)
    victim = next(k for k in sd if k.endswith("attn.qkv.weight"))
    variant[victim] = torch.zeros(8, 8)
    report = verify_state_dict(variant, build_manifest("da", sd))
    assert not report["ok"] and victim in report["shape_mismatch"]


def _small_family():
    # neuflow: small, and its converter has NO internal prefix stripping
    # (convert_raft strips `module.` per-key itself — its upstream ships
    # DataParallel saves — which would mask the mixed-prefix probe)
    torch.manual_seed(0)
    tm, converter = BUILDERS["neuflow"]()
    return dict(tm.state_dict()), converter


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        kk = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, kk))
        else:
            out[kk] = np.asarray(v)
    return out
