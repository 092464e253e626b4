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

# 6. pipelined-video A/B: wall-clock FPS with and without the one-in-
#    flight readback overlap (MDET_VIDEO_SYNC=1 forces the old path)
python - <<'PYEOF'
import cv2, numpy as np
w = cv2.VideoWriter("/tmp/hw_clip.mp4", cv2.VideoWriter_fourcc(*"mp4v"),
                    30, (518, 518))
rng = np.random.default_rng(0)
for _ in range(120):
    w.write(rng.integers(0, 255, (518, 518, 3), dtype=np.uint8))
w.release()
PYEOF
for MODE in pipelined sync; do
  SYNC=""; [ "$MODE" = sync ] && SYNC=1
  timeout 2400 env MDET_VIDEO_SYNC=$SYNC python - <<PYEOF 2>&1 | tee /tmp/hw_video_$MODE.json
import json, time
from monocular_depth_estimation_trt_tpu.registry import build_pipeline
from monocular_depth_estimation_trt_tpu.weights.store import set_allow_random_weights
from monocular_depth_estimation_trt_tpu.apps.streaming import run_video
set_allow_random_weights(True)
pipe = build_pipeline("depth_anything_v2", encoder="vits")
run_video(pipe, "/tmp/hw_clip.mp4", "/tmp/hw_clip_out.mp4", max_frames=10)  # warm
t0 = time.time()
run_video(pipe, "/tmp/hw_clip.mp4", "/tmp/hw_clip_out.mp4")
dt = time.time() - t0
print(json.dumps({"metric": "video_wallclock_fps_$MODE",
                  "value": round(120 / dt, 2), "unit": "fps"}))
PYEOF
done

echo "[hw_pending] done — update docs/QUANT.md + docs/PERF.md 'pending' notes"
echo "[hw_pending] serve load-test rows: /tmp/hw_loadtest_mb1.json /tmp/hw_loadtest_mb8.json"
echo "[hw_pending] video A/B rows: /tmp/hw_video_pipelined.json /tmp/hw_video_sync.json"
