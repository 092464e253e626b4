#!/usr/bin/env python
"""Generate offline mirror dumps for validate_real_ckpts.sh --offline.

The environment has zero network egress, so the "online half" of checkpoint
validation (resolve hf: URI -> verify manifest -> strict-audit convert ->
parity run) has never executed end-to-end. This script synthesizes each
family's checkpoint AT PRODUCTION SCALE from the same torch mirrors that
pin the converters (scripts/gen_manifests.py::PRODUCTION) and saves it at
the exact local-mirror path the ``hf:`` resolver checks first
(``$MDET_HF_CACHE/<org>/<repo>/<file>``, weights/store.py::resolve_checkpoint)
— so ``scripts/validate_real_ckpts.sh`` then exercises its real steps
verbatim, fully offline: URI resolution, ``--verify-manifest`` layout diff,
strict key-consumption audit, conversion, param caching, and the example-
image run. safetensors URIs are written as real safetensors files (the
dtype/format path differs from torch.save — worth exercising).

Usage: python scripts/gen_offline_mirrors.py [--only fam1,fam2] [--list]
       [--cache DIR]    (default: $MDET_HF_CACHE or <repo cache>/hf)
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import gen_manifests as GM  # noqa: E402  (PRODUCTION mirror builders)

# hf URI (as used in validate_real_ckpts.sh) -> PRODUCTION manifest key.
# streamvggt/litevggt resolve through the vggt manifest alias; their
# upstream files carry extras our mirrors cannot know, so they are not
# dumped here (the vggt dump covers the shared layout).
MIRROR_FILES = {
    "depth-anything/Depth-Anything-V2-Small/depth_anything_v2_vits.pth":
        "depth_anything_v2_vits",
    "depth-anything/Depth-Anything-V2-Base/depth_anything_v2_vitb.pth":
        "depth_anything_v2_vitb",
    "depth-anything/Depth-Anything-V2-Large/depth_anything_v2_vitl.pth":
        "depth_anything_v2_vitl",
    "xingyang1/Distill-Any-Depth/small/model.safetensors":
        "depth_anything_v2_vits",
    "depth-anything/DA3METRIC-LARGE/model.safetensors":
        "depth_anything_v3_vitl",
    "Ruicheng/moge-2-vits-normal/model.pt": "moge2_vits",
    "Ruicheng/moge-2-vitl-normal/model.pt": "moge2_vitl",
    "yjh001/metricanything_student_pointmap/student_pointmap.pt":
        "metric_anything",
    "lpiccinelli/unik3d-vitb/model.safetensors": "unik3d_vitb",
    "facebook/VGGT-1B/model.safetensors": "vggt",
    "yslan/STream3R/model.safetensors": "stream3r",
    "egorchistov/optical-flow-MEMFOF-Tartan-T-TSKH/model.safetensors":
        "memfof",
    "facebook/map-anything/model.safetensors": "map_anything",
    "facebook/cotracker3/scaled_online.pth": "cotracker3",
    "Eyeline-Labs/FlashDepth/flashdepth-s/iter_14001.pth":
        "flashdepth_vits",
    "Dingning/BRIDGE/bridge.pth": "depth_anything_v2_vits",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated manifest "
                    "keys or 'small' (skip the >0.5 GB families)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--cache", default="")
    args = ap.parse_args()
    if args.list:
        for rel, key in sorted(MIRROR_FILES.items()):
            print(f"{key:<28} {rel}")
        return 0

    import torch

    cache = args.cache or os.environ.get("MDET_HF_CACHE")
    if not cache:
        from monocular_depth_estimation_trt_tpu.weights.store import cache_dir

        cache = os.path.join(cache_dir(), "hf")

    big = {"vggt", "stream3r", "map_anything", "depth_anything_v2_vitl",
           "depth_anything_v3_vitl", "moge2_vitl", "metric_anything"}
    want = None
    if args.only == "small":
        want = {k for k in MIRROR_FILES.values() if k not in big}
    elif args.only:
        want = set(args.only.split(","))

    def wanted(key: str) -> bool:
        if want is None:
            return True
        # accept exact manifest keys and registry-family prefixes
        # (validate_real_ckpts.sh passes e.g. "depth_anything_v2")
        return key in want or any(key.startswith(w) for w in want)

    # build each unique mirror once, save to every path that shares it
    by_key = {}
    for rel, key in MIRROR_FILES.items():
        if not wanted(key):
            continue
        by_key.setdefault(key, []).append(rel)

    for key in sorted(by_key):
        print(f"[gen_offline_mirrors] {key}: building production mirror ...",
              flush=True)
        torch.manual_seed(0)
        with torch.no_grad():
            tm, _, _ = GM.PRODUCTION[key]()
            sd = tm.state_dict()
            for rel in by_key[key]:
                dst = os.path.join(cache, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if rel.endswith(".safetensors"):
                    from safetensors.numpy import save_file

                    save_file({k: v.detach().cpu().contiguous().numpy()
                               for k, v in sd.items()}, dst)
                else:
                    torch.save(sd, dst)
                print(f"[gen_offline_mirrors]   -> {dst} "
                      f"({os.path.getsize(dst) / 1e6:.0f} MB)", flush=True)
        del tm, sd
        gc.collect()
    print("[gen_offline_mirrors] done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
