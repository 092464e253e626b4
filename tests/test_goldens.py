"""Golden-artifact regression tests — EVERY registered family (SURVEY.md §4).

The reference's quality gate is committed golden outputs (depth .npz + README
max/min values) diffed across engine rebuilds. Here: deterministic tiny
models (fixed seeds, fp32, CPU) with committed golden outputs per family,
built by the shared table in ``golden_specs.py``. A drift beyond tolerance
means a semantic change to the model graph or the shared ops beneath it —
bump the golden deliberately (``python scripts/gen_goldens.py <name>``),
never silently.

The torch-mirror parity suite catches *conversion* drift; these catch a
silent numeric regression from refactors of shared ops (resize, DPT fusion,
samplers, attention) across the whole zoo — including families whose parity
test would still pass because both sides changed together.
"""

import os

import numpy as np
import pytest

from golden_specs import SPECS

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# reference parity bar is 1e-2 (BASELINE.json); the regression bar is tighter
REL_TOL = 1e-3

_SLOW = {"depth_pro", "memfof"}  # big tiny-configs (512px pyramid / 3-frame)


def _param(name):
    marks = [pytest.mark.slow] if name in _SLOW else []
    return pytest.param(name, marks=marks)


def test_every_registered_family_has_a_golden():
    from monocular_depth_estimation_trt_tpu.registry import list_models

    registered = set(list_models())
    missing = sorted(registered - set(SPECS))
    assert not missing, f"families without a golden builder: {missing}"
    stale = sorted(set(SPECS) - registered)
    assert not stale, f"golden builders for unregistered families: {stale}"


@pytest.mark.parametrize("name", [_param(n) for n in sorted(SPECS)])
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"golden_{name}.npz")
    assert os.path.exists(path), (
        f"missing fixture {path} — run scripts/gen_goldens.py {name}"
    )
    golden = np.load(path)
    out = SPECS[name]()
    assert set(out) == set(golden.files), (
        f"{name}: output keys {sorted(out)} != fixture keys "
        f"{sorted(golden.files)}"
    )
    for k in sorted(out):
        ours, ref = np.asarray(out[k]), golden[k]
        assert ours.shape == ref.shape, (name, k, ours.shape, ref.shape)
        scale = max(np.max(np.abs(ref)), 1e-3)
        err = np.max(np.abs(ours - ref)) / scale
        assert err < REL_TOL, f"{name}.{k} golden drift rel err {err:.2e}"
