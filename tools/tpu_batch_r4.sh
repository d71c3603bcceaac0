#!/bin/bash
# Round-4 TPU measurement batch (VERDICT r3 #1/#3/#4/#5/#6): every
# hardware number the round needs, in one resumable, timeout-bounded
# script.  Fire it the moment the tunnel is up (tools/tpu_watch.sh does);
# each step logs to tpu_runs/r4/NN_name.log, continues on failure, and is
# SKIPPED if its .ok marker already exists, so a mid-batch tunnel drop
# costs only the unfinished steps on rerun.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=tpu_runs/r4
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "== $name: already done, skipping" | tee -a "$SUMMARY"
    return 0
  fi
  echo "== $name: start $(date -u +%H:%M:%S)" | tee -a "$SUMMARY"
  if timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.ok"
    echo "== $name: OK ($(date -u +%H:%M:%S))" | tee -a "$SUMMARY"
  else
    echo "== $name: FAILED rc=$? ($(date -u +%H:%M:%S))" | tee -a "$SUMMARY"
  fi
}

# 1. Driver-visible north-star bench (writes the same JSON the driver records)
step 01_bench 3000 python bench.py

# 2. Device correctness gate, all six scenes (earth's first hardware run)
step 02_golden 5400 python tools/tpu_golden_check.py

# 3. Per-scene throughput rows (BASELINE round-4 column)
step 03_cornell 1800 python tools/scenebench.py cornell_box 400 400 128 10
step 04_emissive 1800 python tools/scenebench.py emissive 400 400 128 10
step 05_balls 1800 python tools/scenebench.py balls 400 400 128 10
step 06_shrek 1800 python tools/scenebench.py shrek_quads 400 400 128 10
step 07_rtw_64_8 1800 python tools/scenebench.py rtw_final 400 400 64 8
step 08_rtw_128_10 2400 python tools/scenebench.py rtw_final 400 400 128 10
step 09_earth 1800 python tools/scenebench.py earth 400 400 128 10

# 4. Beyond-reference feature throughput on hardware (BASELINE "pending" rows)
step 10_rr 1800 python tools/scenebench.py cornell_box 400 400 128 10 3 --rr=3
step 11_clamp 1800 python tools/scenebench.py cornell_box 400 400 128 10 3 --clamp=0.25
step 12_adaptive 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --adaptive
step 13_denoise 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --denoise=3

# 5. Roofline audit: measured VPU peak (replaces the assumed denominator)
step 14_vpu_peak 2400 python tools/vpu_peak.py

# 6. Russian-roulette cash-out on the deep convergence config (VERDICT #4)
step 15_deep_plain 2400 python tools/scenebench.py cornell_box 400 400 8192 50 1
step 16_deep_rr 2400 python tools/scenebench.py cornell_box 400 400 8192 50 1 --rr=3

# 7. shard_map overhead on one chip (VERDICT #6)
step 17_shard_overhead 3000 python tools/shard_overhead.py 400 400 1024 10

# 8. Production-resolution adaptive/denoise quality + overhead (VERDICT #5)
step 18_quality 5400 python tools/quality_prodres.py cornell_box balls --size=400 --spp=8,32 --seeds=3

# 9. Per-kernel device-time table for the FLOP-model cross-check (VERDICT #3b)
step 19_profile 2400 python -m zig_weekend_raytracer_tpu.cli \
  --image_width=400 --image_height=400 --samples_per_pixel=128 \
  --ray_bounce_max_depth=10 --scene=cornell_box --profile=device \
  --image_out_path=/tmp/prof_cornell.ppm

echo "== batch complete $(date -u +%H:%M:%S)" | tee -a "$SUMMARY"
