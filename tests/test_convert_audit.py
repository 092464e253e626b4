"""Conversion audit layer: key-consumption tracking, strict unconsumed-key
failure, hf: URI resolution, and the `mdet convert --report` surface.

De-risks the day real upstream checkpoints appear (round-2 verdict item 3):
a layout mismatch must surface as a loud diff, not silent random init.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.weights.convert import (
    TrackedStateDict,
    UnconsumedKeysError,
    _StripPrefixView,
    conv2d,
    convert_with_audit,
    linear,
)
from monocular_depth_estimation_trt_tpu.weights.store import (
    MissingCheckpointError,
    get_or_convert_params,
    resolve_checkpoint,
)


def _sd(**arrays):
    return {k: np.asarray(v, dtype=np.float32) for k, v in arrays.items()}


def _toy_converter(sd):
    return {"lin": linear(sd, "fc")}


def test_tracked_reads_are_recorded_contains_is_not():
    sd = _sd(a=[1.0], b=[2.0])
    t = TrackedStateDict(sd)
    assert "a" in t  # membership check must NOT count as consumption
    assert t.accessed == set()
    _ = t["a"]
    assert t.accessed == {"a"}


def test_audit_passes_when_all_consumed():
    sd = _sd(**{"fc.weight": np.zeros((3, 5)), "fc.bias": np.zeros(3)})
    params, report = convert_with_audit(_toy_converter, sd, name="toy")
    assert params["lin"]["kernel"].shape == (5, 3)
    assert report["consumed"] == report["total"] == 2
    assert report["unconsumed"] == []


def test_audit_strict_raises_on_unconsumed():
    sd = _sd(**{"fc.weight": np.zeros((3, 5)), "fc.bias": np.zeros(3),
                "extra_head.weight": np.zeros((2, 3))})
    with pytest.raises(UnconsumedKeysError, match="extra_head.weight"):
        convert_with_audit(_toy_converter, sd, name="toy")
    # non-strict: same call returns the report instead
    _, report = convert_with_audit(_toy_converter, sd, strict=False)
    assert report["unconsumed"] == ["extra_head.weight"]


def test_audit_ignores_bn_bookkeeping():
    sd = _sd(**{"fc.weight": np.zeros((3, 5)), "fc.bias": np.zeros(3),
                "bn.num_batches_tracked": np.zeros(())})
    _, report = convert_with_audit(_toy_converter, sd)  # must not raise
    assert report["unconsumed"] == []


def test_strip_prefix_view_preserves_tracking():
    """convert_raft's module.-strip must not read values eagerly."""
    sd = _sd(**{"module.c.weight": np.zeros((4, 2, 3, 3)),
                "module.c.bias": np.zeros(4),
                "module.unused.weight": np.zeros((1, 1))})
    t = TrackedStateDict(sd)
    view = _StripPrefixView(t, "module.")
    out = conv2d(view, "c")
    assert out["kernel"].shape == (3, 3, 2, 4)
    # tracking recorded the ORIGINAL key names, and only the read ones
    assert t.accessed == {"module.c.weight", "module.c.bias"}


def test_store_conversion_is_audited(tmp_path, monkeypatch):
    """get_or_convert_params hard-fails on unconsumed tensors by default and
    proceeds under MDET_LOOSE_CONVERT=1."""
    import flax.linen as nn

    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    model, example = Toy(), jnp.zeros((1, 5))

    from safetensors.numpy import save_file

    ckpt = str(tmp_path / "toy.safetensors")
    save_file({"fc.weight": np.zeros((3, 5), np.float32),
               "fc.bias": np.zeros(3, np.float32),
               "stale.weight": np.zeros((2, 2), np.float32)}, ckpt)

    def conv(sd):
        lin = linear(sd, "fc")
        return {"Dense_0": lin}

    with pytest.raises(UnconsumedKeysError):
        get_or_convert_params("toy_audit", model, example,
                              torch_ckpt=ckpt, converter=conv)
    monkeypatch.setenv("MDET_LOOSE_CONVERT", "1")
    p = get_or_convert_params("toy_audit", model, example,
                              torch_ckpt=ckpt, converter=conv)
    assert p["Dense_0"]["kernel"].shape == (5, 3)


def test_report_only_mode_never_caches(tmp_path, monkeypatch):
    import flax.linen as nn

    monkeypatch.setenv("MDET_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("MDET_CONVERT_REPORT_ONLY", "1")

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    from safetensors.numpy import save_file

    ckpt = str(tmp_path / "toy.safetensors")
    save_file({"fc.weight": np.zeros((3, 5), np.float32),
               "fc.bias": np.zeros(3, np.float32)}, ckpt)
    p = get_or_convert_params(
        "toy_report", Toy(), jnp.zeros((1, 5)),
        torch_ckpt=ckpt, converter=lambda sd: {"Dense_0": linear(sd, "fc")},
    )
    assert p["Dense_0"]["kernel"].shape == (5, 3)
    assert not os.path.isdir(os.path.join(str(tmp_path), "params",
                                          "toy_report"))


def test_resolve_checkpoint_plain_path_passthrough():
    assert resolve_checkpoint("/some/where.pth") == "/some/where.pth"


def test_resolve_checkpoint_hf_local_mirror(tmp_path, monkeypatch):
    mirror = tmp_path / "hfmirror"
    target = mirror / "org" / "repo" / "model.safetensors"
    target.parent.mkdir(parents=True)
    target.write_bytes(b"x")
    monkeypatch.setenv("MDET_HF_CACHE", str(mirror))
    got = resolve_checkpoint("hf:org/repo/model.safetensors")
    assert got == str(target)


def test_resolve_checkpoint_hf_malformed():
    with pytest.raises(MissingCheckpointError, match="malformed"):
        resolve_checkpoint("hf:just-a-repo")


def test_resolve_checkpoint_hf_offline_graceful(tmp_path, monkeypatch):
    monkeypatch.setenv("MDET_HF_CACHE", str(tmp_path / "empty"))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    with pytest.raises(MissingCheckpointError, match="Offline"):
        resolve_checkpoint("hf:org/repo/nope.pth")
