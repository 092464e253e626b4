#!/usr/bin/env python
"""(Re)generate the committed golden fixtures for every registered family.

Usage::

    python scripts/gen_goldens.py            # all families
    python scripts/gen_goldens.py raft vggt  # a subset

Writes ``tests/goldens/golden_<name>.npz``. Runs on CPU (forced) so fixtures
are host-reproducible; fp32 everywhere (see tests/golden_specs.py).
Regenerate ONLY on a deliberate semantic change — the diff in the npz is the
reviewable record of the change.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np  # noqa: E402

from golden_specs import SPECS  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main(argv):
    names = argv or sorted(SPECS)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        out = SPECS[name]()
        path = os.path.join(GOLDEN_DIR, f"golden_{name}.npz")
        np.savez_compressed(path, **out)
        sizes = {k: list(v.shape) for k, v in out.items()}
        print(f"[MDET] wrote {path}: {sizes}")


if __name__ == "__main__":
    main(sys.argv[1:])
