#!/usr/bin/env python
"""Regenerate the README model-zoo table from BENCH_ALL.json.

Keeps the published numbers mechanically in sync with the last full
benchmark run (honesty fix from the round-1 review: the table must carry a
fidelity column and only measured numbers). Rewrites the block between
``<!-- BENCH_TABLE_START -->`` and ``<!-- BENCH_TABLE_END -->``.

Usage: python scripts/gen_readme_table.py [BENCH_ALL.json] [README.md]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# allow running as `python scripts/gen_readme_table.py` from anywhere
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

# model tag -> (task, reference dir) for the table's context columns
META = {
    "depth_anything_v2_vits": ("depth", "`Depth_Anything_V2/`"),
    "depth_anything_v2_vitl": ("depth (north star)", "`Depth_Anything_V2/`"),
    "distill_any_depth_vits": ("depth", "`Distill_Any_Depth/`"),
    "depth_anything_ac_vits": ("depth (adverse)", "`Depth_Anything_AC/`"),
    "depth_anything_v3": ("depth + sky", "`Depth_Anything_V3/`"),
    "depth_pro": ("metric depth (1536²)", "`Depth_Pro/`"),
    "unidepth_v2_vitb": ("points+conf+K", "`Uni_Depth_V2/`"),
    "unik3d_vitb": ("rays×distance", "`UniK3D/`"),
    "metric3d_v2_vitl": ("canonical depth (616×1064)", "`Metric3D_V2/`"),
    "moge2_vits": ("points+normal+mask+scale", "`MoGe_2/`"),
    "metric_anything_vitl": ("points+mask+scale", "`Metric_Anything/`"),
    "vggt": ("multi-view geometry", "`VGGT/`"),
    "streamvggt": ("streaming geometry", "`StreamVGGT/`"),
    "raft": ("optical flow", "`RAFT/`"),
    "neuflow": ("optical flow", "`NeuFlow/`"),
    "meflow": ("optical flow (1D corr)", "`MeFlow/`"),
    "memfof": ("optical flow (3-frame)", "`MEMFOF/`"),
    "dkt": ("transparent depth", "`later/DKT`"),
    "bridge": ("depth", "`later/BRIDGE`"),
    "litevggt": ("multi-view geometry", "`later/LiteVGGT`"),
    "flashdepth_vits": ("streaming video depth", "`later/FlashDepth`"),
    "prior_depth_anything_vits": ("prior-refined depth",
                                  "`later/Prior_Depth_Anything`"),
    "dinov3_vits16": ("depth (RoPE backbone)", "`later/DINOv3`"),
    "geocalib": ("camera calibration", "`later/GeoCalib`"),
    "map_anything": ("metric 3D mapping", "`later/Map_Anything`"),
    "cotracker3": ("point tracking", "`later/CoTracker3`"),
    "video_depth_anything_vits": ("video depth (32-frame windows)",
                                  "`later/Video_Depth_Anything`"),
    "stream3r": ("causal pointmaps", "`later/STream3R`"),
    "align3r": ("pairwise 3D + pose", "`later/Align3R`"),
    "waft": ("optical flow (warp-only)", "`later/WAFT`"),
    "dkt_vits": ("transparent depth", "`later/DKT`"),
    "bridge_vits": ("depth", "`later/BRIDGE`"),
    "flashdepth": ("streaming video depth", "`later/FlashDepth`"),
    "sidepth_vits": ("scale-invariant depth", "`later/SIDepth`"),
    "depth_anything_v2_vits_b8": ("depth (batched offline serving)",
                                  "`Depth_Anything_V2/`"),
    "depth_anything_ac_vits_b8": ("depth (batched offline serving)",
                                  "`Depth_Anything_AC/`"),
    "depth_anything_v2_vitl_b4": ("depth (batched offline serving)",
                                  "`Depth_Anything_V2/`"),
    "megasam": ("video SLAM (LM-BA solves/s)", "`later/MegaSaM`"),
    "vipe": ("video pose engine (LM-BA solves/s)", "`later/VIPE`"),
    "wildgs_slam": ("splat-SLAM (mapping steps/s)", "`later/WildGS-SLAM`"),
    "depth_anything_v2_vitl_int8": ("depth, int8 w8a8", "`Depth_Anything_V2/`"),
    "depth_anything_v2_vits_int8": ("depth, int8 w8a8", "`Depth_Anything_V2/`"),
    "metric3d_v2_vitl_int8": ("canonical depth, int8 w8a8", "`Metric3D_V2/`"),
    "depth_pro_int8": ("metric depth, int8 w8a8", "`Depth_Pro/`"),
    "vggt_int8": ("multi-view geometry, int8 w8a8", "`VGGT/`"),
    "vggt_s2": ("multi-view geometry (S=2)", "`VGGT/`"),
    "vggt_s4": ("multi-view geometry (S=4)", "`VGGT/`"),
    "vggt_s8": ("multi-view geometry (S=8)", "`VGGT/`"),
}

FID_SHORT = {
    "converter-verified": "✅ converter+mirror",
    "architecture-matched": "◻ architecture",
    "approximated": "≈ approximated",
}

START = "<!-- BENCH_TABLE_START -->"
END = "<!-- BENCH_TABLE_END -->"


def live_fidelity(tag: str):
    """Current registry fidelity for a bench-row tag (e.g. ``bridge_vits`` ->
    registry entry ``bridge``). The registry is the source of truth — a tag
    promoted after the last bench run must not stay stale in the README."""
    try:
        from monocular_depth_estimation_trt_tpu.registry import (
            get_fidelity,
            list_models,
        )
    except Exception:
        return None
    for name in sorted(list_models(), key=len, reverse=True):
        if tag == name or tag.startswith(name + "_"):
            return get_fidelity(name)
    return None


def make_table(bench: dict) -> str:
    rows = [r for r in bench["results"] if r.get("fps")]
    lines = [
        "| Model | Task | Reference dir | TPU v5e FPS | TRT FPS | speedup"
        " | fidelity |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        tag = r["model"]
        task, ref = META.get(tag, ("", "—"))
        base = r.get("baseline_trt_fps")
        sp = r.get("speedup_vs_trt")
        base_s = str(base) if base else "—"
        sp_s = f"{sp:.1f}×" if sp else "—"
        if r.get("speedup_vs_bf16"):  # int8 rows compare to their bf16 row
            base_s = f"bf16: {r['bf16_fps']}"
            sp_s = f"{r['speedup_vs_bf16']:.2f}× vs bf16"
        fid = live_fidelity(tag) or r.get("fidelity", "")
        lines.append(
            f"| `{tag}` | {task} | {ref} | {r['fps']:.1f} | "
            f"{base_s} | {sp_s} | "
            f"{FID_SHORT.get(fid, fid)} |"
        )
    ok = [r["speedup_vs_trt"] for r in rows if r.get("speedup_vs_trt")]
    if ok:
        geo = float(np.exp(np.mean(np.log(ok))))
        lines.append("")
        lines.append(
            f"Geomean speedup over the {len(ok)} configs with published TRT "
            f"baselines: **{geo:.2f}×**. Staged (`later/`) families have no "
            "reference TRT numbers — the reference never wired them."
        )
    errored = [r for r in bench["results"] if "error" in r]
    if errored:
        lines.append("")
        for r in errored:
            lines.append(
                f"*`{r['model']}` is missing from this run: the development "
                "TPU worker crashed on it (known intermittent axon kernel "
                "fault, see CLAUDE.md) — re-run "
                f"`python bench_all.py --isolate --models {r['model']}`.*"
            )
    return "\n".join(lines)


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ALL.json"
    readme_path = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    with open(bench_path) as f:
        bench = json.load(f)
    with open(readme_path) as f:
        text = f.read()
    if START not in text or END not in text:
        print(f"markers {START}/{END} not found in {readme_path}")
        return 1
    head, rest = text.split(START, 1)
    _, tail = rest.split(END, 1)
    new = head + START + "\n" + make_table(bench) + "\n" + END + tail
    with open(readme_path, "w") as f:
        f.write(new)
    print(f"rewrote table in {readme_path} from {bench_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
