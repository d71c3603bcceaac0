#!/bin/bash
# Round-4 THIRD measurement batch: the tail of r4b that never ran before
# the session ended — intermediate tile widths for tree scenes (the 64-row
# loss on balls does not price 16/32), the per-kernel device-time table at
# the new width, and the speculative two-successor traversal A/B
# (commit 254adcf, opt-in ZWRT_TRAV=spec).
#
# Same health-gate pattern as tpu_batch_r4b.sh: a degraded tunnel (seen
# 2x on 2026-08-19) silently corrupts steady-state records, so step 00
# renders the fully-cached cornell config and aborts unless it hits the
# healthy-window number.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=tpu_runs/r4c
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

# 0. HEALTH GATE (cached cornell; 0.107 s healthy, 0.15 s threshold).
if [ ! -f "$OUT/00_health.ok" ]; then
  timeout 900 python tools/scenebench.py cornell_box 400 400 128 10 4 \
    > "$OUT/00_health.log" 2>&1
  # scenebench prints 'best 0.107s' (space-separated) — ADVICE r4 fix
  best=$(grep -o 'best [0-9.]*s' "$OUT/00_health.log" | tail -1 | grep -o '[0-9.]*')
  if [ -z "$best" ] || ! python -c "exit(0 if float('$best') < 0.15 else 1)"; then
    echo "== ABORT: tunnel degraded (cached cornell best=$best, need <0.15 s)" | tee -a "$SUMMARY"
    exit 75  # EX_TEMPFAIL: transient, rerun later (matches tpu_batch_r4b.sh)
  fi
  touch "$OUT/00_health.ok"
  echo "== 00_health: OK (best=$best)" | tee -a "$SUMMARY"
fi

# 1. Speculative two-successor traversal A/B (most direct lever first).
step 25_rtw_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py rtw_final 400 400 64 8 3
step 26_balls_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py balls 400 400 128 10 3

# 2. Tree scenes at intermediate widths (granularity 2048/4096, ILP 2-4x).
step 21_rtw_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py rtw_final 400 400 64 8 3
step 22_rtw_r32 2400 env ZWRT_ROWS=32 python tools/scenebench.py rtw_final 400 400 64 8 3
step 23_balls_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py balls 400 400 128 10 3

# 3. Per-kernel device-time table at the new tile width.
step 24_profile 2400 python -m zig_weekend_raytracer_tpu.cli \
  --image_width=400 --image_height=400 --samples_per_pixel=128 \
  --ray_bounce_max_depth=10 --scene=cornell_box --profile=device \
  --image_out_path=/tmp/r4c_profile.ppm

echo "== batch complete $(date -u +%H:%M:%S)" | tee -a "$SUMMARY"
