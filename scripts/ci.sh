#!/usr/bin/env bash
# Full local CI: tests (CPU, 8 virtual devices) + multichip dryrun + native
# build + headline bench smoke (TPU if available, else skipped).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C native

echo "== test suite (CPU backend) =="
python -m pytest tests/ -q

echo "== multichip dryrun =="
python __graft_entry__.py

echo "== headline bench (single chip; skipped without TPU) =="
if python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; then
    MDET_BENCH_ITERS=20 python bench.py
else
    echo "no TPU backend; skipped"
fi
echo "CI OK"
