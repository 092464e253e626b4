#!/usr/bin/env bash
# Full local CI: tests (CPU, 8 virtual devices) + multichip dryrun + native
# build + headline bench smoke (TPU if available, else skipped).
#
# --fast: parallel workers (pytest-xdist, per-worker cache dirs via
# conftest.py) and skip @slow tests — the under-10-minute pre-commit gate.
# The full serial suite remains the merge gate.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST=0
[[ "${1:-}" == "--fast" ]] && FAST=1

echo "== native build =="
make -C native

echo "== test suite (CPU backend) =="
if [[ "$FAST" == 1 ]]; then
    python -m pytest tests/ -q -n auto -m "not slow"
else
    python -m pytest tests/ -q
fi

echo "== multichip dryrun =="
python __graft_entry__.py

echo "== headline bench (single chip; skipped without TPU) =="
if python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; then
    MDET_BENCH_ITERS=20 python bench.py
else
    echo "no TPU backend; skipped"
fi
echo "CI OK"
