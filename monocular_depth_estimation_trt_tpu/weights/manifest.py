"""Expected-checkpoint-key manifests (round-3 verdict item 3).

A manifest pins, per model family, the exact torch ``state_dict`` layout our
converter consumes at production scale: tensor names, shapes and count. It is
generated from the same torch mirrors that gate the converters
(``scripts/gen_manifests.py``) and validated at generation time by running
the production converter under ``convert_with_audit`` strict mode — so a
committed manifest is, by construction, exactly the key set the converter
maps.

Use: before trusting a real upstream checkpoint (the reference downloads
these from the hub, e.g. ``Depth_Anything_V2/README.md:22-36``), diff it
against the manifest with ``mdet convert ... --verify-manifest`` — a layout
mismatch (renamed block, extra head, different depth) is reported as
missing/extra/shape-mismatched keys BEFORE conversion, instead of surfacing
as an :class:`UnconsumedKeysError` mid-conversion or, unaudited, as silently
random-init Flax params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional

from monocular_depth_estimation_trt_tpu.weights.convert import _AUDIT_IGNORE

MANIFEST_VERSION = 1


def manifest_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "manifests")


def manifest_path(key: str) -> str:
    return os.path.join(manifest_dir(), f"{key}.json")


# Registry model name -> manifest family. Families sharing one converter
# layout share one manifest (e.g. the whole DA-V2 family: reference
# Distill_Any_Depth/infer.py:50-58 and Depth_Anything_AC load the same
# architecture; metric DA-V2 checkpoints differ only in head activation).
_FAMILY_ALIASES = {
    "distill_any_depth": "depth_anything_v2",
    "depth_anything_ac": "depth_anything_v2",
    "dkt": "depth_anything_v2",
    "bridge": "depth_anything_v2",
    "unidepth_v2": "unidepth",
    "streamvggt": "vggt",
    "litevggt": "vggt",
    "metric_anything": "metric_anything",
}

# Families whose manifest is encoder-independent (fixed production config).
_NO_ENCODER = {
    "depth_pro", "vggt", "map_anything", "raft", "neuflow", "meflow",
    "memfof", "metric_anything", "cotracker3", "align3r", "stream3r",
}


def manifest_key(model: str, encoder: str = "") -> str:
    """Resolve (registry model, encoder) to a manifest file key."""
    fam = _FAMILY_ALIASES.get(model, model)
    if fam in _NO_ENCODER or not encoder:
        return fam
    return f"{fam}_{encoder}"


def load_manifest(key: str) -> Optional[Dict[str, Any]]:
    path = manifest_path(key)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def build_manifest(name: str, sd: Mapping, *, config: Optional[Dict] = None,
                   validated: bool = False) -> Dict[str, Any]:
    """Manifest dict from a torch ``state_dict`` (tensor name -> shape)."""
    keys = {}
    for k in sorted(sd):
        if _AUDIT_IGNORE.search(k):
            continue
        v = sd[k]
        keys[k] = list(getattr(v, "shape", ()))
    return {
        "version": MANIFEST_VERSION,
        "name": name,
        "config": config or {},
        "total": len(keys),
        "validated_by_converter_audit": validated,
        "keys": keys,
    }


def save_manifest(manifest: Dict[str, Any]) -> str:
    os.makedirs(manifest_dir(), exist_ok=True)
    path = manifest_path(manifest["name"])
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return path


def verify_state_dict(sd: Mapping, manifest: Dict[str, Any]) -> Dict[str, Any]:
    """Diff a checkpoint against a manifest.

    Returns a report with ``missing`` (expected, absent from the checkpoint),
    ``extra`` (present, not expected), ``shape_mismatch`` ({key: (got,
    want)}) and ``ok``. ``module.`` prefixes are stripped (the converters'
    ``_StripPrefixView`` behavior) and bookkeeping tensors
    (``num_batches_tracked`` etc.) are ignored, matching the audit rules.
    """
    got: Dict[str, Any] = {}
    for k in sd:
        if _AUDIT_IGNORE.search(k):
            continue
        kk = k[len("module."):] if k.startswith("module.") else k
        got[kk] = list(getattr(sd[k], "shape", ()))
    want = manifest["keys"]
    missing = sorted(k for k in want if k not in got)
    extra = sorted(k for k in got if k not in want)
    shape_mismatch = {
        k: {"checkpoint": got[k], "manifest": want[k]}
        for k in want
        if k in got and list(got[k]) != list(want[k])
    }
    return {
        "manifest": manifest["name"],
        "expected": len(want),
        "present": len(got),
        "missing": missing,
        "extra": extra,
        "shape_mismatch": shape_mismatch,
        "ok": not missing and not extra and not shape_mismatch,
    }


def format_report(report: Dict[str, Any], max_items: int = 10) -> str:
    lines = [
        f"manifest {report['manifest']}: expected {report['expected']} "
        f"tensors, checkpoint has {report['present']}"
    ]

    def _section(title, items):
        if not items:
            return
        lines.append(f"  {title} ({len(items)}):")
        for k in items[:max_items]:
            lines.append(f"    {k}")
        if len(items) > max_items:
            lines.append(f"    ... (+{len(items) - max_items} more)")

    _section("MISSING from checkpoint", report["missing"])
    _section("EXTRA in checkpoint", report["extra"])
    if report["shape_mismatch"]:
        lines.append(f"  SHAPE MISMATCH ({len(report['shape_mismatch'])}):")
        for k, v in list(report["shape_mismatch"].items())[:max_items]:
            lines.append(
                f"    {k}: checkpoint {v['checkpoint']} vs manifest "
                f"{v['manifest']}"
            )
    lines.append("  layout MATCHES the manifest" if report["ok"]
                 else "  layout DIFFERS from the manifest")
    return "\n".join(lines)
