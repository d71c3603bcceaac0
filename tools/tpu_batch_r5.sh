#!/bin/bash
# Round-5 measurement batch, part 1 (VERDICT r4 #1/#4/#7): one green batch
# that reproduces, with COMMITTED logs, every number BASELINE.md cited from
# the lost r4b/12-20 session — deep-config grid +/- RR, feature rows,
# shard overhead, production-res quality — plus the never-run r4c tail
# (spec-traversal A/B, intermediate tile widths for tree scenes) and
# 2x same-session repetitions of the contested headline cells
# (cornell/emissive) so BASELINE can report median-of-session.
#
# Gate semantics (VERDICT r4 #4 + ADVICE): tools/tpu_health.py emits JSON
# and distinguishes unavailable/degraded/healthy; the stepper RETRIES a
# degraded window with backoff instead of aborting, and distinguishes
# "tunnel died" (health probe fails after the step fails -> retry) from
# "the step itself crashed on a healthy device" (FAILED rc recorded, batch
# continues).  Exit 75 (EX_TEMPFAIL) only if health never returns within
# the retry budget.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5}
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"
HEALTH_TRIES=${ZWRT_HEALTH_TRIES:-8}
HEALTH_SLEEP=${ZWRT_HEALTH_SLEEP:-180}

note() { echo "$@" | tee -a "$SUMMARY"; }

wait_healthy() {  # block until the tunnel is healthy; exit 75 if it never is
  local i
  for i in $(seq 1 "$HEALTH_TRIES"); do
    if timeout 700 python tools/tpu_health.py > "$OUT/health_last.json" 2>"$OUT/health_last.err"; then
      note "== health: $(cat "$OUT/health_last.json")"
      return 0
    fi
    note "== health try $i/$HEALTH_TRIES: $(cat "$OUT/health_last.json" 2>/dev/null || echo probe-crashed) — sleeping ${HEALTH_SLEEP}s"
    sleep "$HEALTH_SLEEP"
  done
  note "== ABORT: tunnel never healthy after $HEALTH_TRIES tries"
  exit 75
}

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    note "== $name: already done, skipping"
    return 0
  fi
  local attempt rc
  for attempt in 1 2 3; do
    note "== $name: attempt $attempt start $(date -u +%H:%M:%S)"
    timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "$OUT/$name.ok"
      note "== $name: OK ($(date -u +%H:%M:%S))"
      return 0
    fi
    # Step failed: was it the tunnel or the step?  Probe health.
    if timeout 700 python tools/tpu_health.py > "$OUT/health_last.json" 2>/dev/null; then
      note "== $name: FAILED rc=$rc on a HEALTHY device (real crash) — not retrying"
      return 0
    fi
    note "== $name: rc=$rc with tunnel unhealthy — waiting for recovery, then retrying"
    wait_healthy
  done
  note "== $name: FAILED rc=$rc after 3 attempts"
}

note "== batch r5 start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# 1. Driver-visible bench + six-scene device gate
step 01_bench 3000 python bench.py
step 02_golden 5400 python tools/tpu_golden_check.py

# 2. Per-scene table (contested cells cornell/emissive run TWICE for
#    median-of-session; the rest once, 4 reps)
step 03_cornell_a 1800 python tools/scenebench.py cornell_box 400 400 128 10 6
step 03_cornell_b 1800 python tools/scenebench.py cornell_box 400 400 128 10 6
step 04_emissive_a 1800 python tools/scenebench.py emissive 400 400 128 10 6
step 04_emissive_b 1800 python tools/scenebench.py emissive 400 400 128 10 6
step 05_balls 1800 python tools/scenebench.py balls 400 400 128 10 4
step 06_shrek 1800 python tools/scenebench.py shrek_quads 400 400 128 10 4
step 07_earth 1800 python tools/scenebench.py earth 400 400 128 10 4
step 08_rtw_64_8 1800 python tools/scenebench.py rtw_final 400 400 64 8 4
step 09_rtw_128_10 2400 python tools/scenebench.py rtw_final 400 400 128 10 3

# 3. Deep-config grid (the lost r4b/10-14 claims): {rows 8,64} x {sort,
#    nosort}, + RR on the winner.  8192spp/depth50 = the README deep
#    convergence artifact config.
step 10_deep_r8_sort 2400 env ZWRT_ROWS=8 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 11_deep_r8_nosort 2400 env ZWRT_ROWS=8 ZWRT_NO_SORT=1 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 12_deep_r64_sort 2400 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 13_deep_r64_nosort 2400 env ZWRT_NO_SORT=1 python tools/scenebench.py cornell_box 400 400 8192 50 2
step 14_deep_rr 2400 python tools/scenebench.py cornell_box 400 400 8192 50 2 --rr=3

# 4. Feature rows at bench scale (the lost r4b/15-18 claims)
step 15_rr 1200 python tools/scenebench.py cornell_box 400 400 128 10 4 --rr=3
step 16_clamp 1200 python tools/scenebench.py cornell_box 400 400 128 10 4 --clamp=0.25
step 17_adaptive 1800 python tools/scenebench.py cornell_box 400 400 128 10 4 --adaptive
step 18_denoise 1800 python tools/scenebench.py cornell_box 400 400 128 10 3 --denoise=3

# 5. Shard overhead + production-res quality (lost r4b/19-20 claims)
step 19_shard 2400 python tools/shard_overhead.py
step 20_quality 5400 python tools/quality_prodres.py cornell_box balls

# 6. Tree scenes at intermediate tile widths (never-run r4c tail)
step 21_rtw_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py rtw_final 400 400 64 8 3
step 22_rtw_r32 2400 env ZWRT_ROWS=32 python tools/scenebench.py rtw_final 400 400 64 8 3
step 23_balls_r16 2400 env ZWRT_ROWS=16 python tools/scenebench.py balls 400 400 128 10 3
step 24_balls_r32 2400 env ZWRT_ROWS=32 python tools/scenebench.py balls 400 400 128 10 3

# 7. Speculative two-successor traversal A/B (never-run r4c tail)
step 25_rtw_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py rtw_final 400 400 64 8 3
step 26_balls_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py balls 400 400 128 10 3

# 8. Per-kernel device-time table at the production tile width
step 27_profile 2400 python -m zig_weekend_raytracer_tpu.cli \
  --image_width=400 --image_height=400 --samples_per_pixel=128 \
  --ray_bounce_max_depth=10 --scene=cornell_box --profile=device \
  --image_out_path=/tmp/r5_profile.ppm

note "== batch complete $(date -u +%H:%M:%S)"
