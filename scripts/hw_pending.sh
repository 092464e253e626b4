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

# 5. HTTP serving load test on the real chip: dynamic batching evidence
#    (--max-batch 1 vs 8 under 8 concurrent clients; small pre-resized
#    image so the 1-core host isn't the bottleneck)
python - <<'PYEOF'
import cv2
img = cv2.imread("data/example.jpg")
cv2.imwrite("/tmp/loadtest_518.jpg", cv2.resize(img, (518, 518)))
PYEOF
for MB in 1 8; do
  timeout 1800 python -m monocular_depth_estimation_trt_tpu \
      serve depth_anything_v2 --encoder vits --allow-random-weights \
      --port 8311 --max-batch $MB > /tmp/hw_serve_$MB.log 2>&1 &
  echo $! > /tmp/hw_serve.pid
  # the port binds only AFTER warmup compiles (minutes on the tunnel even
  # with a warm XLA cache) — poll /v1/health, bounded, before load-testing
  HEALTHY=0
  for _ in $(seq 180); do
    if curl -sf --max-time 5 http://127.0.0.1:8311/v1/health >/dev/null; then
      HEALTHY=1
      break
    fi
    kill -0 $(cat /tmp/hw_serve.pid) || break  # server died: stop waiting
    sleep 10
  done
  if [ "$HEALTHY" = 1 ]; then
    timeout 900 python scripts/load_test.py --url http://127.0.0.1:8311 \
        --image /tmp/loadtest_518.jpg --clients 8 --seconds 30 \
        2>&1 | tee /tmp/hw_loadtest_mb$MB.json
  else
    # don't burn 15 min connecting to a dead port / tee tracebacks as rows
    echo "{\"error\": \"server never became healthy (max-batch $MB)\"}" \
        | tee /tmp/hw_loadtest_mb$MB.json
  fi
  kill $(cat /tmp/hw_serve.pid) || true
  sleep 3
done

echo "[hw_pending] done — update docs/QUANT.md + docs/PERF.md 'pending' notes"
echo "[hw_pending] serve load-test rows: /tmp/hw_loadtest_mb1.json /tmp/hw_loadtest_mb8.json"
