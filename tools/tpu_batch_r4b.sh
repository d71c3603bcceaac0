#!/bin/bash
# Round-4 SECOND measurement batch: re-records every number that moved
# after the tile-width landing (per-scene rows, commit 6559745) plus the
# follow-ups it exposed (deep-config sort grid, image scenes at rows 64,
# adaptive/denoise after the short-pass narrowing, shard overhead).
#
# The first batch's pattern (tools/tpu_batch_r4.sh) gates on tunnel
# AVAILABILITY; this one also gates on tunnel HEALTH — the 2026-08-19
# session saw the tunnel up but degraded ~2x (cached cornell 0.107 s ->
# 0.219-0.294 s), which silently corrupts steady-state records.  Step 00
# renders the fully-cached cornell config and ABORTS the batch unless it
# hits the healthy-window number, so a rerun later costs nothing.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=tpu_runs/r4b
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

# 0. HEALTH GATE: cached cornell must run at the healthy-window speed.
#    (0.107 s measured healthy; 0.15 s threshold leaves ~40% slack while
#    rejecting the observed 2x degradation.)
if [ ! -f "$OUT/00_health.ok" ]; then
  timeout 900 python tools/scenebench.py cornell_box 400 400 128 10 4 \
    > "$OUT/00_health.log" 2>&1
  BEST=$(grep -o "best [0-9.]*s" "$OUT/00_health.log" | grep -o "[0-9.]*")
  if python -c "import sys; sys.exit(0 if float('${BEST:-9}') < 0.15 else 1)"; then
    touch "$OUT/00_health.ok"
    echo "== 00_health: OK (best ${BEST}s)" | tee -a "$SUMMARY"
  else
    echo "== 00_health: DEGRADED (best ${BEST:-none}s >= 0.15) — aborting; rerun later" \
      | tee -a "$SUMMARY"
    exit 75
  fi
fi

# 1. Driver-visible bench + device gate at the new rows
step 01_bench 3000 python bench.py
step 02_golden 5400 python tools/tpu_golden_check.py

# 2. Per-scene rows (final round-4 BASELINE column)
step 03_cornell 1800 python tools/scenebench.py cornell_box 400 400 128 10 6
step 04_emissive 1800 python tools/scenebench.py emissive 400 400 128 10 6
step 05_balls 1800 python tools/scenebench.py balls 400 400 128 10 4
step 06_shrek 1800 python tools/scenebench.py shrek_quads 400 400 128 10 4
step 07_earth 1800 python tools/scenebench.py earth 400 400 128 10 4
step 08_rtw_64_8 1800 python tools/scenebench.py rtw_final 400 400 64 8 4
step 09_rtw_128_10 2400 python tools/scenebench.py rtw_final 400 400 128 10 3

# 3. Deep-config grid: {rows 8, 64} x {sorted, nosort} — the morning
#    31.4 s (rows 8, sorted) vs 5.1 s (rows 64, sorted) vs <=8.6/9.2 s
#    (nosort, degraded) needs a clean 4-way to locate the sort pathology.
step 10_deep_r8_sort 2400 env ZWRT_ROWS=8 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 11_deep_r8_nosort 2400 env ZWRT_ROWS=8 ZWRT_NO_SORT=1 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 12_deep_r64_sort 2400 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 13_deep_r64_nosort 2400 env ZWRT_NO_SORT=1 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 14_deep_rr 2400 python tools/scenebench.py cornell_box 400 400 8192 50 2 --rr=3

# 4. Features at the new rows (post-narrowing, traced-sigma filter)
step 15_rr 1200 python tools/scenebench.py cornell_box 400 400 128 10 4 --rr=3
step 16_clamp 1200 python tools/scenebench.py cornell_box 400 400 128 10 4 --clamp=0.25
step 17_adaptive 1800 python tools/scenebench.py cornell_box 400 400 128 10 4 --adaptive
step 18_denoise 1800 python tools/scenebench.py cornell_box 400 400 128 10 3 --denoise=3

# 5. Shard overhead at the new rows + prodres wall columns (traced sigma)
step 19_shard 2400 python tools/shard_overhead.py
step 20_quality 5400 python tools/quality_prodres.py cornell_box balls

# 6. Tree scenes at intermediate widths: the 64-row loss on balls does
#    not price 16/32 (granularity 2048/4096, trace-loop ILP 2-4x).
step 21_rtw_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py rtw_final 400 400 64 8 3
step 22_rtw_r32 2400 env ZWRT_ROWS=32 python tools/scenebench.py rtw_final 400 400 64 8 3
step 23_balls_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py balls 400 400 128 10 3

# 7. Per-kernel device-time table at the new tile width (where did the
#    remaining non-issue time go — VMEM story).
step 24_profile 2400 python -m zig_weekend_raytracer_tpu.cli \
  --image_width=400 --image_height=400 --samples_per_pixel=128 \
  --ray_bounce_max_depth=10 --scene=cornell_box --profile=device \
  --image_out_path=/tmp/r4b_profile.ppm

# 8. Speculative two-successor traversal A/B (opt-in ZWRT_TRAV=spec):
#    overlaps both successors' loads+slab tests with the any() reduction
#    the round-3 queue experiment identified as the serial bound.
step 25_rtw_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py rtw_final 400 400 64 8 3
step 26_balls_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py balls 400 400 128 10 3
