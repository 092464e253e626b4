"""Merge benchmark rows from a partial run into BENCH_ALL.json.

`bench_all.py --models <subset> --out partial.json` writes ONLY the subset
rows; overwriting BENCH_ALL.json with that would drop every other model's
record. This helper replaces/appends rows by their `model` tag instead:

    python scripts/merge_bench.py partial.json [BENCH_ALL.json]

Rows with an `error` field never overwrite a previous good row (a TPU-worker
flake must not erase a real measurement).

Every merge also re-stamps each row's `fidelity` from the live registry:
fidelity is registry metadata joined into the row at bench time, so a family
promoted after its last hardware run (e.g. bridge/litevggt in round 3) must
not stay stale in the raw JSON. Measurements are never touched.

Invariant this relies on: fidelity promotions are label-only (documentation
of reconstruction confidence) — they never change the measured architecture
or perf path. If a future promotion ships code changes, the FPS row predates
them; the original tag is preserved as `fidelity_at_bench` on first restamp
so rows stay auditable.

    python scripts/merge_bench.py --refresh-fidelity [BENCH_ALL.json]

re-stamps without merging anything.
"""

from __future__ import annotations

import json
import os
import sys
import time

# `python scripts/merge_bench.py` puts scripts/ (not the repo root) on
# sys.path; the registry import below needs the root.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


_REGISTRY_WARNED = False


def _live_fidelity(tag: str):
    """Registry fidelity for a bench-row tag (``vggt_s2`` -> entry ``vggt``);
    None when the tag matches no registry entry or the package can't import
    (the latter is warned once — a silent None here would make a broken
    package indistinguishable from 'nothing was stale')."""
    global _REGISTRY_WARNED
    try:
        from monocular_depth_estimation_trt_tpu.registry import (
            get_fidelity,
            list_models,
        )
    except Exception as exc:
        if not _REGISTRY_WARNED:
            _REGISTRY_WARNED = True
            print(f"[merge_bench] WARNING: registry unavailable ({exc!r}) — "
                  "fidelity tags NOT refreshed", file=sys.stderr)
        return None
    for name in sorted(list_models(), key=len, reverse=True):
        if tag == name or tag.startswith(name + "_"):
            return get_fidelity(name)
    return None


def refresh_fidelity(rows: list) -> int:
    """Re-stamp ``fidelity`` on each row from the live registry. Returns the
    number of rows whose tag changed."""
    changed = 0
    for row in rows:
        fid = _live_fidelity(row.get("model", ""))
        if fid and row.get("fidelity") != fid:
            row.setdefault("fidelity_at_bench", row.get("fidelity"))
            row["fidelity"] = fid
            changed += 1
    return changed


def refresh_int8_ratios(rows: list) -> int:
    """Recompute each ``<tag>_int8`` row's ``bf16_fps``/``speedup_vs_bf16``
    from the CURRENT ``<tag>`` row. bench_all's isolate mode measures each
    row in its own subprocess, so an int8 row measured in the same window as
    a fresh bf16 row still joins the PREVIOUS BENCH_ALL value; after a merge
    both rows are present and the ratio must reference the merged bf16.
    Returns the number of rows updated."""
    by_tag = {r.get("model"): r for r in rows}
    changed = 0
    for row in rows:
        tag = row.get("model", "")
        if not tag.endswith("_int8") or row.get("error") or not row.get("fps"):
            continue
        base = by_tag.get(tag[: -len("_int8")])
        if not base or base.get("error") or not base.get("fps"):
            continue
        bf16 = base["fps"]
        if row.get("bf16_fps") != bf16:
            row["bf16_fps"] = bf16
            row["speedup_vs_bf16"] = round(row["fps"] / bf16, 2)
            changed += 1
    return changed


def merge(partial_path: str, all_path: str = "BENCH_ALL.json") -> int:
    with open(partial_path) as f:
        partial = json.load(f)["results"]
    with open(all_path) as f:
        full = json.load(f)

    by_tag = {r["model"]: i for i, r in enumerate(full["results"])}
    replaced = appended = skipped = 0
    for row in partial:
        i = by_tag.get(row["model"])
        if row.get("error") and i is not None and not full["results"][i].get("error"):
            skipped += 1
            continue
        if i is None:
            full["results"].append(row)
            by_tag[row["model"]] = len(full["results"]) - 1
            appended += 1
        else:
            full["results"][i] = row
            replaced += 1

    restamped = refresh_fidelity(full["results"])
    ratios = refresh_int8_ratios(full["results"])
    full["timestamp"] = time.time()
    with open(all_path, "w") as f:
        json.dump(full, f, indent=2)
    print(f"[merge_bench] {all_path}: {replaced} replaced, {appended} "
          f"appended, {skipped} error rows skipped, "
          f"{restamped} fidelity tags refreshed, "
          f"{ratios} int8 ratios recomputed")
    return 0


def refresh_only(all_path: str = "BENCH_ALL.json") -> int:
    with open(all_path) as f:
        full = json.load(f)
    restamped = refresh_fidelity(full["results"])
    if restamped:
        with open(all_path, "w") as f:
            json.dump(full, f, indent=2)
    print(f"[merge_bench] {all_path}: {restamped} fidelity tags refreshed")
    return 0


if __name__ == "__main__":
    if sys.argv[1:2] == ["--refresh-fidelity"]:
        sys.exit(refresh_only(*sys.argv[2:]))
    sys.exit(merge(*sys.argv[1:]))
