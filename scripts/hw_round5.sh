#!/usr/bin/env bash
# Round-5 hardware measurement plan — run top-to-bottom in one good tunnel
# window; each step is independently resumable (persistent XLA cache).
# Usage: scripts/hw_round5.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/mdet_tpu/xla_cache}"

want() { [ $# -eq 0 ] && return 0; for s in "$@"; do [ "$s" = "$STEP" ] && return 0; done; return 1; }
ARGS=("$@")

run() { # run <step> <cmd...>
  STEP="$1"; shift
  want "${ARGS[@]}" || return 0
  echo "=== [hw_round5] $STEP: $*"
  timeout "${MDET_STEP_TIMEOUT:-2400}" "$@"
  echo "=== [hw_round5] $STEP done (rc=$?)"
}

# 1. metric3d: in-situ prefix bisect (the trustworthy localization)
run metric3d_prefix python scripts/metric3d_prefix_bisect.py --iters 30

# 2. metric3d: encoder sub-stages at N=3349 (why 36.8% vs 90.8% @518²?)
run metric3d_tokens python scripts/roofline_vitl.py --tokens 3349 \
    --stages block_scan,attn_scan,mlp_scan,dense_chain,attn_kernel --iters 20

# 3. metric3d: refine-stage sub-op bisect (fused-GRU A/B included)
run refine_bisect python scripts/refine_bisect.py

# 4. metric3d: stage table after the round-5 fixes
run metric3d_stages python scripts/roofline_metric3d.py --iters 30

# 5. per-stage rooflines for the remaining big families
run roofline_depth_pro python scripts/roofline_family.py depth_pro --iters 10
run roofline_vggt1 python scripts/roofline_family.py vggt --views 1 --iters 15
run roofline_vggt4 python scripts/roofline_family.py vggt --views 4 --iters 10
run roofline_vggt8 python scripts/roofline_family.py vggt --views 8 --iters 8
run roofline_moge2 python scripts/roofline_family.py moge2 --iters 20
run roofline_metric_anything python scripts/roofline_family.py metric_anything --iters 15

# 6. chip-side serving grid (batcher isolated from the tunnel) + mixed cell
run load_chip python scripts/load_harness.py --chip-side --duration 12 \
    --concurrency 1,4,8,16 --max-batch 1,4,8 --out LOAD_CHIP.json
run load_mixed python scripts/load_harness.py --chip-side --mixed \
    --duration 12 --concurrency 8 --max-batch 8 --out LOAD_MIXED.json

# 7. the full BENCH_ALL re-measure (isolated; merges via merge_bench)
run bench_all python bench_all.py --isolate

# 8. headline driver bench sanity
run bench env MDET_BENCH_ITERS=50 python bench.py
