#!/usr/bin/env python
"""Generate production-scale expected-checkpoint-key manifests.

For each model family: instantiate the torch mirror (the layout oracle that
already gates the converter at tiny scale, ``tests/test_convert_exhaustive``)
at PRODUCTION scale, run the production converter over its ``state_dict``
under ``convert_with_audit`` strict mode (proving the manifest key set is
exactly what the converter consumes — no missing, no leftover), and write
``monocular_depth_estimation_trt_tpu/weights/manifests/<key>.json``.

These manifests let ``mdet convert --verify-manifest`` diff a real upstream
checkpoint (reference downloads: ``Depth_Anything_V2/README.md:22-36``,
``VGGT/README.md`` etc.) against our expected layout BEFORE conversion —
the offline half of round-3 verdict item 3; the online half is
``scripts/validate_real_ckpts.sh``.

Usage: python scripts/gen_manifests.py [--only key1,key2] [--list]
(CPU-only; the big families materialize full fp32 params — VGGT ~5 GB RAM.)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def _vit(enc):
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        HEAD_CONFIGS,
        INTERMEDIATE_LAYER_IDX,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    return VIT_CONFIGS[enc], HEAD_CONFIGS[enc], INTERMEDIATE_LAYER_IDX[enc]


def _da_v2(enc):
    from torch_mirror import TorchDepthAnythingV2

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchDepthAnythingV2(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads,
        features=h["features"], out_channels=h["out_channels"],
        idxs=idxs, pretrain_img=518,
    )
    conv = functools.partial(C.convert_depth_anything_v2, encoder=enc)
    cfg = dict(encoder=enc, dim=c.dim, depth=c.depth, input=518)
    return tm, conv, cfg


def _da3(enc="vitl"):
    from torch_mirror_da3 import TorchDepthAnythingV3

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchDepthAnythingV3(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads,
        features=h["features"], out_channels=h["out_channels"],
        idxs=idxs, pretrain_img=518,
    )
    return (tm, functools.partial(C.convert_depth_anything_v3, encoder=enc),
            dict(encoder=enc, dim=c.dim, depth=c.depth, input=518))


def _depth_pro():
    from torch_mirror_depth_pro import TorchDepthPro

    from monocular_depth_estimation_trt_tpu.models.depth_pro import (
        HOOK_BLOCK_IDS,
    )
    from monocular_depth_estimation_trt_tpu.weights import convert as C

    # upstream apple ml-depth-pro ViT-L/16@384 preset
    # (models/depth_pro.py::DepthProConfig defaults)
    tm = TorchDepthPro(
        img_size=1536, window=384, stride0=288, stride1=192,
        vit_dim=1024, vit_depth=24, vit_heads=16, vit_patch=16,
        hook_ids=HOOK_BLOCK_IDS, decoder_features=256,
        dims_encoder=(256, 512, 1024, 1024),
    )
    return (tm, functools.partial(C.convert_depth_pro, vit_depth=24),
            dict(img_size=1536, window=384, vit="vitl16_384"))


def _geometric(mode, enc):
    from torch_mirror_geometric import TorchGeometricModel

    from monocular_depth_estimation_trt_tpu.models.geometric import (
        DECODER_DIMS,
    )
    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, _, idxs = _vit(enc)
    tm = TorchGeometricModel(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads,
        decoder_dim=DECODER_DIMS[enc], idxs=idxs, mode=mode,
        pretrain_img=518,
    )
    tm.build_camera((518, 518))
    return (tm, functools.partial(C.convert_geometric, encoder=enc,
                                  mode=mode),
            dict(encoder=enc, mode=mode, decoder_dim=DECODER_DIMS[enc],
                 input=518))


def _moge2(enc="vits", predict_normal=True, num_tokens=1800):
    from torch_mirror_geometric import TorchMoGe2

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, _, idxs = _vit(enc)
    tm = TorchMoGe2(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads, idxs=idxs,
        proj_dim=512, up_dims=(256, 128, 64),
        predict_normal=predict_normal, pretrain_img=518,
        num_tokens=num_tokens,
    )
    return (tm, functools.partial(C.convert_moge2, encoder=enc,
                                  predict_normal=predict_normal),
            dict(encoder=enc, predict_normal=predict_normal,
                 num_tokens=num_tokens))


def _metric3d(enc="vitl"):
    from torch_mirror_metric3d import TorchMetric3DV2

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchMetric3DV2(
        dim=c.dim, depth=c.depth, num_heads=c.num_heads,
        features=h["features"], out_channels=h["out_channels"], idxs=idxs,
        hidden=128, iters=4, k=7, pretrain_img=518,
    )
    return (tm, functools.partial(C.convert_metric3d_v2, encoder=enc),
            dict(encoder=enc, hidden=128, canvas="616x1064"))


def _vggt(with_point_head=False):
    from torch_mirror_vggt import TorchVGGT

    from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
    from monocular_depth_estimation_trt_tpu.weights import convert as C

    g = VGGTConfig()  # production defaults (facebook/VGGT-1B layout)
    vc, _, _ = _vit("vitl")
    tm = TorchVGGT(
        vit_dim=vc.dim, vit_depth=vc.depth, vit_heads=vc.num_heads,
        dim=g.dim, depth=g.depth, num_heads=g.num_heads,
        head_layers=g.head_layers, grid_hw=(37, 37),
        num_register_tokens=g.num_register_tokens,
        head_features=g.head_features,
        head_out_channels=g.head_out_channels, pretrain_img=518,
        with_point_head=with_point_head,
    )
    return (tm, functools.partial(C.convert_vggt, vit_depth=vc.depth,
                                  depth=g.depth),
            dict(vit="vitl", dim=g.dim, depth=g.depth,
                 with_point_head=with_point_head))


def _map_anything():
    from torch_mirror_map_anything import TorchMapAnything

    from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
    from monocular_depth_estimation_trt_tpu.weights import convert as C

    g = VGGTConfig()
    vc, _, _ = _vit("vitl")
    tm = TorchMapAnything(
        vit_dim=vc.dim, vit_depth=vc.depth, vit_heads=vc.num_heads,
        dim=g.dim, depth=g.depth, num_heads=g.num_heads,
        head_layers=g.head_layers, grid_hw=(37, 37),
        head_features=g.head_features,
        head_out_channels=g.head_out_channels, pretrain_img=518,
    )
    return (tm, functools.partial(C.convert_map_anything,
                                  vit_depth=vc.depth, depth=g.depth),
            dict(vit="vitl", dim=g.dim, depth=g.depth))


def _raft():
    from torch_mirror_raft import TorchRAFT

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    return TorchRAFT(), C.convert_raft, dict(iters="param-free")


def _neuflow():
    from torch_mirror_neuflow import TorchNeuFlow

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    return (TorchNeuFlow(dim=128, iters16=2, iters8=2), C.convert_neuflow,
            dict(dim=128))


def _meflow():
    from torch_mirror_meflow import TorchMeFlow

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    return TorchMeFlow(iters=2), C.convert_meflow, dict(iters="param-free")


def _memfof():
    from torch_mirror_memfof import TorchMEMFOF

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    return TorchMEMFOF(iters=2), C.convert_memfof, dict(iters="param-free")


def _flashdepth(enc="vits"):
    from torch_mirror_flashdepth import TorchFlashDepth

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchFlashDepth(c.dim, c.depth, c.num_heads, h["features"],
                         h["out_channels"], idxs, pretrain_img=518)
    return (tm, functools.partial(C.convert_flashdepth, encoder=enc),
            dict(encoder=enc, mamba="d_state16_conv4_expand2", input=518))


def _vda(enc="vits"):
    from torch_mirror_vda import TorchVDA

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchVDA(c.dim, c.depth, c.num_heads, h["features"],
                  h["out_channels"], idxs, pretrain_img=518,
                  temporal_heads=8)
    return (tm, functools.partial(C.convert_vda, encoder=enc),
            dict(encoder=enc, temporal_heads=8, input=518))


def _dinov3(enc="vitl16"):
    from torch_mirror_dinov3 import TorchDINOv3Depther

    from monocular_depth_estimation_trt_tpu.models.dinov3 import (
        DINOV3_CONFIGS,
        DINOV3_HEAD_CONFIGS,
    )
    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c = DINOV3_CONFIGS[enc]
    h = DINOV3_HEAD_CONFIGS[enc]
    tm = TorchDINOv3Depther(c.dim, c.depth, c.num_heads, h["features"],
                            h["out_channels"], h["idxs"], patch=16)
    return (tm, functools.partial(C.convert_dinov3, encoder=enc),
            dict(encoder=enc, patch=16, rope="param-free", input=1024))


def _geocalib(enc="vits"):
    from torch_mirror_geocalib import TorchGeoCalib

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchGeoCalib(c.dim, c.depth, c.num_heads, h["features"],
                       h["out_channels"], idxs, pretrain_img=518)
    return (tm, functools.partial(C.convert_geocalib, encoder=enc),
            dict(encoder=enc, n_out=5, input=322))


def _prior_depth(enc="vits"):
    from torch_mirror_prior import TorchPriorDARefiner

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchPriorDARefiner(c.dim, c.depth, c.num_heads, h["features"],
                             h["out_channels"], idxs, pretrain_img=518)
    return (tm, functools.partial(C.convert_prior_depth, encoder=enc),
            dict(encoder=enc, stages="mde+cond6ch+refine", input=518))


def _sidepth(enc="vits"):
    from torch_mirror_sidepth import TorchSIDepth

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, h, idxs = _vit(enc)
    tm = TorchSIDepth(c.dim, c.depth, c.num_heads, h["features"],
                      h["out_channels"], idxs, pretrain_img=518)
    return (tm, functools.partial(C.convert_sidepth, encoder=enc),
            dict(encoder=enc, stages="ssi+si4ch", input=518))


def _cotracker3():
    from torch_mirror_cotracker import TorchCoTracker3

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    tm = TorchCoTracker3()  # production defaults (models/cotracker3.py)
    return (tm, functools.partial(C.convert_cotracker3, blocks=3),
            dict(dim=128, d_model=256, blocks=3, levels=4, radius=3))


def _align3r():
    from torch_mirror_align3r import TorchAlign3R

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    # production Align3R (models/align3r.py defaults): DUSt3R-style ViT-L/16
    # encoder + 768x12 decoder pair, taps evenly spaced over the decoder
    dec_depth = 12
    taps = (dec_depth // 4 - 1, dec_depth // 2 - 1,
            3 * dec_depth // 4 - 1, dec_depth - 1)
    tm = TorchAlign3R(1024, 24, 16, 768, dec_depth, 12, 128,
                      (96, 192, 384, 768), taps, patch=16, pretrain_img=512)
    return (tm, functools.partial(C.convert_align3r, enc_depth=24,
                                  dec_depth=dec_depth),
            dict(enc="vitl16", dec_dim=768, dec_depth=dec_depth, input=512))


def _waft(enc="vits"):
    from torch_mirror_waft import TorchWAFT

    from monocular_depth_estimation_trt_tpu.weights import convert as C

    c, _, _ = _vit(enc)
    tm = TorchWAFT(c.dim, c.depth, c.num_heads, iters=8, hidden=128,
                   pretrain_img=518)
    return (tm, functools.partial(C.convert_waft, encoder=enc),
            dict(encoder=enc, iters=8, hidden=128, input="280x504"))


# manifest key -> builder. Keys must match weights/manifest.py::manifest_key
# for the registry names users pass to `mdet convert`.
PRODUCTION = {
    "depth_anything_v2_vits": lambda: _da_v2("vits"),
    "depth_anything_v2_vitb": lambda: _da_v2("vitb"),
    "depth_anything_v2_vitl": lambda: _da_v2("vitl"),
    "depth_anything_v3_vitl": lambda: _da3("vitl"),
    "depth_pro": _depth_pro,
    "unidepth_vits": lambda: _geometric("unidepth", "vits"),
    "unidepth_vitb": lambda: _geometric("unidepth", "vitb"),
    "unidepth_vitl": lambda: _geometric("unidepth", "vitl"),
    "unik3d_vitb": lambda: _geometric("unik3d", "vitb"),
    "unik3d_vitl": lambda: _geometric("unik3d", "vitl"),
    "metric3d_v2_vitl": lambda: _metric3d("vitl"),
    "moge2_vits": lambda: _moge2("vits", True, 1800),
    "moge2_vitl": lambda: _moge2("vitl", True, 1800),
    "metric_anything": lambda: _moge2("vitl", False, 3600),
    "vggt": _vggt,
    "stream3r": lambda: _vggt(with_point_head=True),
    "map_anything": _map_anything,
    "raft": _raft,
    "neuflow": _neuflow,
    "meflow": _meflow,
    "memfof": _memfof,
    # round-5: the previously unmanifested families (round-4 verdict
    # "missing" item 3 — exactly the medium-confidence reconstructions
    # where a layout diff is most likely)
    "flashdepth_vits": lambda: _flashdepth("vits"),
    "video_depth_anything_vits": lambda: _vda("vits"),
    "dinov3_vits16": lambda: _dinov3("vits16"),
    "dinov3_vitl16": lambda: _dinov3("vitl16"),
    "geocalib_vits": lambda: _geocalib("vits"),
    "prior_depth_anything_vits": lambda: _prior_depth("vits"),
    "sidepth_vits": lambda: _sidepth("vits"),
    "cotracker3": _cotracker3,
    "align3r": _align3r,
    "waft_vits": lambda: _waft("vits"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        for k in sorted(PRODUCTION):
            print(k)
        return 0

    import torch

    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_with_audit,
    )
    from monocular_depth_estimation_trt_tpu.weights.manifest import (
        build_manifest,
        save_manifest,
    )

    want = set(args.only.split(",")) if args.only else set(PRODUCTION)
    failed = []
    for key in sorted(PRODUCTION):
        if key not in want:
            continue
        print(f"[gen_manifests] {key}: building production mirror ...",
              flush=True)
        torch.manual_seed(0)
        with torch.no_grad():
            tm, conv, cfg = PRODUCTION[key]()
            sd = tm.state_dict()
            try:
                _, report = convert_with_audit(conv, sd, strict=True,
                                               name=key)
                validated = True
                print(f"[gen_manifests] {key}: converter consumed "
                      f"{report['consumed']}/{report['total']} tensors",
                      flush=True)
            except Exception as e:  # keep generating; flag the failure
                validated = False
                failed.append(key)
                print(f"[gen_manifests] {key}: AUDIT FAILED: {e}",
                      flush=True)
            m = build_manifest(key, sd, config=cfg, validated=validated)
            path = save_manifest(m)
            print(f"[gen_manifests] {key}: {m['total']} tensors -> {path}",
                  flush=True)
        del tm, sd
    if failed:
        print(f"[gen_manifests] FAILED audits: {failed}")
        return 1
    print("[gen_manifests] all manifests validated by converter audit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
