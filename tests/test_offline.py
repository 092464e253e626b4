"""Batched offline serving: process_images_batched end-to-end + the
`mdet batch` CLI surface (round-2 verdict "Weak" item 1 — the path existed
with no caller and no test).

CPU runs exercise the Python-decode fallback; when the native hostio library
is present the decode ring is used automatically (same contract, covered
for the pump primitive in test_native.py).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.apps.offline import (
    process_images_batched,
)
from monocular_depth_estimation_trt_tpu.config import ModelSpec
from monocular_depth_estimation_trt_tpu.pipelines import DepthPipeline


def _toy_pipeline(hw=(16, 16)):
    spec = ModelSpec(model="toy_offline", input_hw=hw)

    def forward(params, img_u8, out_hw):
        x = img_u8.astype(jnp.float32) / 255.0
        return {"depth": x[..., 0] * params["scale"]}

    return DepthPipeline(spec, forward, {"scale": jnp.float32(2.0)},
                         viz="none")


def _write_images(tmp_path, n, hw=(16, 16)):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        p = str(tmp_path / f"frame_{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_process_images_batched_covers_every_frame(tmp_path):
    """11 frames, batch 4: three dispatches (4+4+3-padded), every original
    index delivered exactly once, padded tail indices never delivered."""
    paths = _write_images(tmp_path, 11)
    pipe = _toy_pipeline()
    seen = {}

    def on_result(start_idx, host):
        d = np.asarray(host["depth"])
        assert d.shape == (4, 16, 16)
        for j in range(d.shape[0]):
            if start_idx + j < len(paths):
                seen[start_idx + j] = d[j]

    stats = process_images_batched(pipe, paths, batch=4, on_result=on_result)
    assert stats["frames"] == 11
    assert stats["batch"] == 4
    assert sorted(seen) == list(range(11))
    assert stats["fps"] > 0


def test_process_images_batched_numerics_match_single(tmp_path):
    """The batched engine must produce the same depth as per-frame calls."""
    import cv2

    paths = _write_images(tmp_path, 4)
    pipe = _toy_pipeline()
    got = {}

    def on_result(start_idx, host):
        for j in range(4):
            got[start_idx + j] = np.asarray(host["depth"])[j]

    process_images_batched(pipe, paths, batch=4, on_result=on_result)
    for i, p in enumerate(paths):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        single = pipe(img)
        assert np.allclose(got[i], np.asarray(single["depth"]), atol=1e-5), i


def test_batch_cli_end_to_end(tmp_path, monkeypatch):
    """`mdet batch --images-dir ... --save` writes per-image npz+jpg and
    prints the one-line JSON stats."""
    _write_images(tmp_path, 5)
    out_dir = tmp_path / "out"

    from monocular_depth_estimation_trt_tpu import cli
    from monocular_depth_estimation_trt_tpu import registry

    def fake_build(name, **kw):
        assert name == "toy"
        return _toy_pipeline()

    monkeypatch.setattr(registry, "build_pipeline", fake_build)
    rc = cli.main([
        "batch", "toy", "--images-dir", str(tmp_path), "--batch", "2",
        "--out", str(out_dir), "--save",
    ])
    assert rc == 0
    npzs = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    jpgs = [f for f in os.listdir(out_dir) if f.endswith(".jpg")]
    assert len(npzs) == 5 and len(jpgs) == 5
    d = np.load(out_dir / npzs[0])["depth"]
    assert d.shape == (16, 16) and np.isfinite(d).all()


def test_batch_cli_precision_passthrough(tmp_path, monkeypatch):
    """--precision flows into build_pipeline (int8 batched offline serving)."""
    _write_images(tmp_path, 2)
    from monocular_depth_estimation_trt_tpu import cli, registry

    seen = {}

    def fake_build(name, **kw):
        seen.update(kw)
        return _toy_pipeline()

    monkeypatch.setattr(registry, "build_pipeline", fake_build)
    rc = cli.main(["batch", "toy", "--images-dir", str(tmp_path),
                   "--batch", "2", "--out", str(tmp_path / "o"),
                   "--precision", "int8"])
    assert rc == 0
    assert seen.get("precision") == "int8"


def test_batch_cli_rejects_ambiguous_inputs(tmp_path):
    from monocular_depth_estimation_trt_tpu import cli

    rc = cli.main(["batch", "toy"])  # neither --images-dir nor --video
    assert rc == 2


def test_moge_batched_serving_keeps_program_split(monkeypatch, rng):
    """MoGePipeline.batch_engine_for must keep the model/postprocess split —
    the base class's fused vmap(forward) is the program shape that
    deterministically kernel-faults the dev TPU worker (registry.py
    _SplitEngine docstring). Also checks batched == per-frame numerics."""
    import jax
    import jax.numpy as jnp

    import monocular_depth_estimation_trt_tpu.models.moge2 as moge_mod
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline

    real = moge_mod.MoGe2
    vit_cfg = ViTConfig(dim=48, depth=2, num_heads=2, pretrain_img_size=70)

    def tiny(encoder="vits", **kw):
        kw.update(cfg=moge_mod.MoGeConfig(
            vit_config=vit_cfg, proj_dim=32, up_dims=(16, 16, 8),
            out_indices=(0, 1, 0, 1)))
        kw["num_tokens"] = 25
        return real(encoder="tiny", **kw)

    monkeypatch.setattr(moge_mod, "MoGe2", tiny)
    m = tiny(dtype=jnp.float32, attn_impl="xla", predict_normal=True)
    params = m.init(jax.random.PRNGKey(7),
                    jnp.zeros((1, 63, 112, 3)))["params"]
    pipe = build_pipeline("moge2", input_hw=(63, 112), params=params,
                          precision="fp32", attn_impl="xla")

    eng = pipe.batch_engine_for((63, 112), 2)
    assert hasattr(eng, "e1") and hasattr(eng, "e2"), type(eng)  # split

    frames = rng.integers(0, 255, (2, 63, 112, 3), dtype=np.uint8)
    out = pipe.batch_call(frames)
    single = pipe(frames[0])
    assert np.allclose(out["depth"][0], single["depth"], atol=1e-4,
                       rtol=1e-4)
