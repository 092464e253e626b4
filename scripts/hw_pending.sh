#!/bin/bash
# Pending round-3 hardware measurements — run when the axon TPU tunnel is up.
# Each step is timeout-bounded (the tunnel intermittently hangs, CLAUDE.md);
# bench_all runs --isolate (per-row subprocess + retries) so one worker
# crash cannot poison the suite. Safe to re-run: the XLA persistent cache
# makes repeats cheap and merge_bench never lets an error row clobber a
# good one.
set -ux
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/mdet_tpu/xla_cache

# 1. headline bench (driver contract: ONE JSON line)
timeout 2400 env MDET_BENCH_ITERS=50 python bench.py 2>&1 | tee /tmp/hw_bench.log

# 2. int8 QUANT_SUITE rows (vs each config's recorded bf16 row)
timeout 14400 python bench_all.py --isolate \
    --models depth_anything_v2_vitl_int8,depth_anything_v2_vits_int8,metric3d_v2_vitl_int8,depth_pro_int8,vggt_int8 \
    --out BENCH_QUANT.json 2>&1 | tee /tmp/hw_quant.log

# 2b. batched offline-serving rows (BATCHED_SUITE; PERF.md's plateau
#     numbers become reproducible rows)
timeout 7200 python bench_all.py --isolate \
    --models depth_anything_v2_vits_b8,depth_anything_ac_vits_b8,depth_anything_v2_vitl_b4 \
    --out BENCH_BATCHED.json 2>&1 | tee /tmp/hw_batched.log

# 3. fold the new rows into the zoo table + regenerate README
python scripts/merge_bench.py BENCH_QUANT.json BENCH_ALL.json
python scripts/merge_bench.py BENCH_BATCHED.json BENCH_ALL.json
python scripts/gen_readme_table.py

# 4. serialized-artifact smoke on real TPU: export, serve from the file,
#    and bench it with the same protocol (expected: FPS == live row)
timeout 2400 python -m monocular_depth_estimation_trt_tpu --allow-random-weights \
    export depth_anything_v2 --encoder vits --out /tmp/da_vits_hw.mdeteng \
    2>&1 | tee /tmp/hw_export.log
timeout 2400 python -m monocular_depth_estimation_trt_tpu run \
    --engine /tmp/da_vits_hw.mdeteng --image data/example.jpg \
    --out /tmp/hw_engine_out 2>&1 | tee -a /tmp/hw_export.log
timeout 2400 python -m monocular_depth_estimation_trt_tpu bench \
    --engine /tmp/da_vits_hw.mdeteng --iterations 50 2>&1 | tee -a /tmp/hw_export.log

echo "[hw_pending] done — update docs/QUANT.md + docs/PERF.md 'pending' notes"
