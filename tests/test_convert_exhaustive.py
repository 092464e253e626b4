"""Key-exhaustiveness audit: every family converter must consume EVERY
tensor of its (tiny) torch-mirror checkpoint under ``convert_with_audit``
strict mode.

This is the structural half of the parity gate: the parity tests prove the
consumed keys land in the right places; this proves no key is silently
dropped — the failure mode that would turn an upstream layout mismatch into
silent random-init on a real checkpoint (round-2 verdict, "What's missing"
item 1).
"""

import functools

import pytest
import torch

from monocular_depth_estimation_trt_tpu.weights import convert as C

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))
VGGT_VIT = dict(dim=48, depth=2, num_heads=2)
VGGT_AGG = dict(dim=64, depth=2, num_heads=4)
VGGT_LAYERS = (0, 1, 0, 1)


def _da_v2():
    from torch_mirror import TorchDepthAnythingV2

    tm = TorchDepthAnythingV2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=HEAD["idxs"], pretrain_img=70,
    )

    def conv(sd):
        return {
            "pretrained": C.convert_dinovit(sd, "pretrained", TINY["depth"]),
            "depth_head": C.convert_dpt_head(sd, "depth_head"),
        }

    return tm, conv


def _da3():
    from torch_mirror_da3 import TorchDepthAnythingV3

    tm = TorchDepthAnythingV3(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=HEAD["idxs"], pretrain_img=70,
    )
    return tm, functools.partial(C.convert_depth_anything_v3,
                                 depth=TINY["depth"])


def _depth_pro():
    from torch_mirror_depth_pro import TorchDepthPro

    tm = TorchDepthPro(
        img_size=512, window=128, stride0=96, stride1=64,
        vit_dim=32, vit_depth=3, vit_heads=2, vit_patch=16, hook_ids=(0, 1),
        decoder_features=16, dims_encoder=(8, 16, 32, 32),
    )
    return tm, functools.partial(C.convert_depth_pro, vit_depth=3)


def _geometric(mode):
    from torch_mirror_geometric import TorchGeometricModel

    tm = TorchGeometricModel(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        decoder_dim=64, idxs=HEAD["idxs"], mode=mode, pretrain_img=70,
    )
    tm.build_camera((70, 84))
    return tm, functools.partial(C.convert_geometric, mode=mode,
                                 depth=TINY["depth"])


def _moge2(predict_normal):
    from torch_mirror_geometric import TorchMoGe2

    tm = TorchMoGe2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        idxs=HEAD["idxs"], proj_dim=32, up_dims=(16, 16, 8),
        predict_normal=predict_normal, pretrain_img=70, num_tokens=25,
    )
    return tm, functools.partial(C.convert_moge2, depth=TINY["depth"],
                                 predict_normal=predict_normal)


def _metric3d():
    from torch_mirror_metric3d import TorchMetric3DV2

    tm = TorchMetric3DV2(
        dim=TINY["dim"], depth=TINY["depth"], num_heads=TINY["num_heads"],
        features=HEAD["features"], out_channels=HEAD["out_channels"],
        idxs=HEAD["idxs"], hidden=32, iters=2, k=7, pretrain_img=70,
    )
    return tm, functools.partial(C.convert_metric3d_v2, depth=TINY["depth"])


def _vggt(with_point_head=False):
    from torch_mirror_vggt import TorchVGGT

    tm = TorchVGGT(
        vit_dim=VGGT_VIT["dim"], vit_depth=VGGT_VIT["depth"],
        vit_heads=VGGT_VIT["num_heads"], dim=VGGT_AGG["dim"],
        depth=VGGT_AGG["depth"], num_heads=VGGT_AGG["num_heads"],
        head_layers=VGGT_LAYERS, grid_hw=(5, 5),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], pretrain_img=70,
        with_point_head=with_point_head,
    )
    return tm, functools.partial(C.convert_vggt, vit_depth=VGGT_VIT["depth"],
                                 depth=VGGT_AGG["depth"])


def _map_anything():
    from torch_mirror_map_anything import TorchMapAnything

    tm = TorchMapAnything(
        vit_dim=VGGT_VIT["dim"], vit_depth=VGGT_VIT["depth"],
        vit_heads=VGGT_VIT["num_heads"], dim=VGGT_AGG["dim"],
        depth=VGGT_AGG["depth"], num_heads=VGGT_AGG["num_heads"],
        head_layers=VGGT_LAYERS, grid_hw=(5, 5),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], pretrain_img=70,
    )
    return tm, functools.partial(C.convert_map_anything,
                                 vit_depth=VGGT_VIT["depth"],
                                 depth=VGGT_AGG["depth"])


def _cotracker():
    from torch_mirror_cotracker import TorchCoTracker3

    cfg = dict(dim=16, d_model=32, iters=2, blocks=2, levels=2, radius=2,
               num_heads=4)
    return (TorchCoTracker3(**cfg),
            functools.partial(C.convert_cotracker3, blocks=cfg["blocks"]))


def _single_head(mirror_module, mirror_cls, converter):
    mod = __import__(mirror_module)
    tm = getattr(mod, mirror_cls)(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"], pretrain_img=70,
    )
    return tm, functools.partial(converter, depth=TINY["depth"])


def _dinov3():
    from torch_mirror_dinov3 import TorchDINOv3Depther

    tm = TorchDINOv3Depther(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
    )

    def conv(sd):
        return {
            "backbone": C.convert_dinovit(sd, "backbone", TINY["depth"]),
            "head": C.convert_dpt_head(sd, "head"),
        }

    return tm, conv


def _vda():
    from torch_mirror_vda import TorchVDA

    tm = TorchVDA(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
        pretrain_img=70, temporal_heads=2,
    )
    return tm, functools.partial(C.convert_vda, depth=TINY["depth"])


def _align3r():
    from torch_mirror_align3r import TorchAlign3R

    tm = TorchAlign3R(
        64, 2, 2, 48, 4, 2,
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"], pretrain_img=64,
    )
    return tm, functools.partial(C.convert_align3r, enc_depth=2, dec_depth=4)


def _waft():
    from torch_mirror_waft import TorchWAFT

    tm = TorchWAFT(TINY["dim"], TINY["depth"], TINY["num_heads"], iters=2,
                   pretrain_img=70)
    return tm, functools.partial(C.convert_waft, depth=TINY["depth"])


def _raft():
    from torch_mirror_raft import TorchRAFT

    return TorchRAFT(), C.convert_raft


def _neuflow():
    from torch_mirror_neuflow import TorchNeuFlow

    return TorchNeuFlow(dim=128, iters16=2, iters8=2), C.convert_neuflow


def _meflow():
    from torch_mirror_meflow import TorchMeFlow

    return TorchMeFlow(iters=2), C.convert_meflow


def _memfof():
    from torch_mirror_memfof import TorchMEMFOF

    return TorchMEMFOF(iters=2), C.convert_memfof


BUILDERS = {
    "depth_anything_v2": _da_v2,
    "depth_anything_v3": _da3,
    "depth_pro": _depth_pro,
    "unidepth": lambda: _geometric("unidepth"),
    "unik3d": lambda: _geometric("unik3d"),
    "metric3d_v2": _metric3d,
    "moge2": lambda: _moge2(True),
    "metric_anything": lambda: _moge2(False),
    "vggt": _vggt,
    "stream3r_point_head": lambda: _vggt(with_point_head=True),
    "map_anything": _map_anything,
    "cotracker3": _cotracker,
    "flashdepth": lambda: _single_head("torch_mirror_flashdepth",
                                       "TorchFlashDepth",
                                       C.convert_flashdepth),
    "geocalib": lambda: _single_head("torch_mirror_geocalib", "TorchGeoCalib",
                                     C.convert_geocalib),
    "sidepth": lambda: _single_head("torch_mirror_sidepth", "TorchSIDepth",
                                    C.convert_sidepth),
    "prior_depth": lambda: _single_head("torch_mirror_prior",
                                        "TorchPriorDARefiner",
                                        C.convert_prior_depth),
    "dinov3": _dinov3,
    "vda": _vda,
    "align3r": _align3r,
    "waft": _waft,
    "raft": _raft,
    "neuflow": _neuflow,
    "meflow": _meflow,
    "memfof": _memfof,
}


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_converter_consumes_every_checkpoint_tensor(name):
    torch.manual_seed(0)
    tm, converter = BUILDERS[name]()
    sd = tm.state_dict()
    _, report = C.convert_with_audit(converter, sd, strict=True, name=name)
    assert report["unconsumed"] == []
    # everything not consumed must be explicitly-ignorable bookkeeping
    ignored = [k for k in sd if C._AUDIT_IGNORE.search(k)]
    assert report["consumed"] + len(ignored) >= report["total"]
