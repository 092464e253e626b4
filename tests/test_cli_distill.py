"""`mdet distill` end-to-end: teacher→student training from the CLI.

Runs the real command path (image loading, teacher pseudo-labels via
batch_call, student train steps, orbax train-state artifact) with the
DA-V2 class swapped for a tiny config so the whole loop fits a CPU test.
"""

import os

import numpy as np
import pytest


def _write_images(tmp_path, n=3, hw=(40, 48)):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(n):
        cv2.imwrite(str(d / f"f{i}.png"),
                    rng.integers(0, 255, (*hw, 3), dtype=np.uint8))
    return str(d)


@pytest.fixture
def tiny_da(monkeypatch):
    """Swap DepthAnythingV2 for a 2-block/64-dim config everywhere it is
    imported at call time (cli.cmd_distill and registry._build_da_family)."""
    import monocular_depth_estimation_trt_tpu.models.depth_anything_v2 as da_mod
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    real = da_mod.DepthAnythingV2
    cfg = ViTConfig(dim=64, depth=2, num_heads=4, pretrain_img_size=56)

    def tiny(encoder="vits", **kw):
        kw.update(
            vit_config=cfg,
            head_features=16,
            head_out_channels=(8, 16, 32, 32),
            out_indices=(0, 1, 0, 1),
        )
        return real(encoder="tiny", **kw)

    monkeypatch.setattr(da_mod, "DepthAnythingV2", tiny)
    return tiny


@pytest.mark.slow
def test_cli_distill_promote_backs_up_cache(tmp_path, monkeypatch, tiny_da):
    """--promote installs distilled params in the weights cache and moves an
    existing entry aside instead of clobbering it."""
    import numpy as np

    from monocular_depth_estimation_trt_tpu import cli
    from monocular_depth_estimation_trt_tpu.weights.store import (
        _params_dir,
        save_params,
    )

    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path / "cache"))
    name = "depth_anything_v2_vits_518x518_bf16"
    save_params(name, {"seed_marker": np.zeros(2, np.float32)})

    images = _write_images(tmp_path, n=2)
    rc = cli.main([
        "distill", "--teacher-encoder", "vits", "--student-encoder", "vits",
        "--images-dir", images, "--size", "56", "--batch", "2",
        "--steps", "1", "--out", str(tmp_path / "out"), "--promote",
    ])
    assert rc == 0
    assert os.path.isdir(_params_dir(name))
    bak = _params_dir(name) + ".pre-distill-bak"
    assert os.path.isdir(bak)  # the pre-existing entry was preserved


@pytest.mark.slow
def test_cli_distill_end_to_end(tmp_path, monkeypatch, tiny_da):
    from monocular_depth_estimation_trt_tpu import cli

    images = _write_images(tmp_path)
    out = str(tmp_path / "out")
    rc = cli.main([
        "distill",
        "--teacher", "depth_anything_v2", "--teacher-encoder", "vits",
        "--student", "depth_anything_v2", "--student-encoder", "vits",
        "--images-dir", images,
        "--size", "56", "--batch", "2", "--steps", "3", "--lr", "1e-3",
        "--out", out,
    ])
    assert rc == 0
    ckpts = [p for p in os.listdir(out) if p.startswith("distill_")]
    assert ckpts, os.listdir(out)

    # The artifact is a restorable TrainState that resumes at step 3.
    import jax.numpy as jnp
    import optax

    from monocular_depth_estimation_trt_tpu.training import (
        create_train_state,
        load_train_state,
    )

    model = tiny_da(dtype=jnp.float32)
    params = model.init(
        __import__("jax").random.PRNGKey(0), jnp.zeros((1, 56, 56, 3))
    )["params"]
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, warmup_steps=10,
                                               decay_steps=11)
    like = create_train_state(params, optax.adamw(sched, weight_decay=1e-4))
    st = load_train_state(os.path.join(out, ckpts[0]), like)
    assert int(st.step) == 3


@pytest.mark.slow
def test_cli_distill_qat(tmp_path, monkeypatch, tiny_da):
    """--qat: the student trains through the fake-quant (STE) graph; the
    resulting params keep the standard tree (promotable, int8-servable)."""
    from monocular_depth_estimation_trt_tpu import cli

    images = _write_images(tmp_path)
    out = str(tmp_path / "out")
    rc = cli.main([
        "distill",
        "--teacher", "depth_anything_v2", "--teacher-encoder", "vits",
        "--student", "depth_anything_v2", "--student-encoder", "vits",
        "--images-dir", images,
        "--size", "56", "--batch", "2", "--steps", "2", "--lr", "1e-3",
        "--out", out, "--qat",
    ])
    assert rc == 0

    # restorable with the STANDARD (non-quant) param tree
    import jax
    import jax.numpy as jnp
    import optax

    from monocular_depth_estimation_trt_tpu.training import (
        create_train_state,
        load_train_state,
    )

    model = tiny_da(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, warmup_steps=10,
                                               decay_steps=11)
    like = create_train_state(params, optax.adamw(sched, weight_decay=1e-4))
    ckpts = [p for p in os.listdir(out) if p.startswith("distill_")]
    st = load_train_state(os.path.join(out, ckpts[0]), like)
    assert int(st.step) == 2
