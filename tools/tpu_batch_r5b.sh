#!/bin/bash
# Round-5 measurement batch, part 2: the experiments that need the round-5
# code (coherence-sorted packing A/B, device-validated VPU peak, device-side
# adaptive planner, texture LUT mode) plus the roofline-constants
# regeneration.  Same retry-not-abort gate semantics as tpu_batch_r5.sh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5b}
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"
HEALTH_TRIES=${ZWRT_HEALTH_TRIES:-8}
HEALTH_SLEEP=${ZWRT_HEALTH_SLEEP:-180}

note() { echo "$@" | tee -a "$SUMMARY"; }

wait_healthy() {
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
    if timeout 700 python tools/tpu_health.py > "$OUT/health_last.json" 2>/dev/null; then
      note "== $name: FAILED rc=$rc on a HEALTHY device (real crash) — not retrying"
      return 0
    fi
    note "== $name: rc=$rc with tunnel unhealthy — waiting for recovery, then retrying"
    wait_healthy
  done
  note "== $name: FAILED rc=$rc after 3 attempts"
}

note "== batch r5b start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# 1. VPU peak with device time + scaling check; regenerate the committed
#    roofline constants (VERDICT r4 #2), then the census constant, then a
#    bench reading them.
step 01_vpu_peak 3600 python tools/vpu_peak.py --update-constants
step 02_census 1800 python tools/op_census.py cornell_box 10 --update-constants
step 03_bench 3000 python bench.py

# 2. Coherence-sorted packing A/B on the tree scenes (VERDICT r4 #3)
step 04_balls_plain 1800 python tools/scenebench.py balls 400 400 128 10 4
step 05_balls_coh 1800 env ZWRT_COHERENT=1 python tools/scenebench.py balls 400 400 128 10 4
step 06_rtw_plain 2400 python tools/scenebench.py rtw_final 400 400 64 8 3
step 07_rtw_coh 2400 env ZWRT_COHERENT=1 python tools/scenebench.py rtw_final 400 400 64 8 3

# 3. Device-side adaptive planner (VERDICT r4 #6): target <= 2x uniform
step 08_adaptive 1800 python tools/scenebench.py cornell_box 400 400 128 10 4 --adaptive

# 4. Texture LUT mode A/B (VERDICT r4 #5): shrek at several budgets, rtw
#    and earth at the default budget.  Quality delta vs the exact path is
#    measured by the scenebench mean plus tools/imgdiff.py offline.
step 09_shrek_plain 1800 python tools/scenebench.py shrek_quads 400 400 128 10 4
step 10_shrek_lut8k 1800 env ZWRT_TEX_LUT=8192 python tools/scenebench.py shrek_quads 400 400 128 10 4
step 11_shrek_lut32k 2400 env ZWRT_TEX_LUT=32768 python tools/scenebench.py shrek_quads 400 400 128 10 3
step 12_rtw_lut8k 2400 env ZWRT_TEX_LUT=8192 python tools/scenebench.py rtw_final 400 400 64 8 3
step 13_earth_lut8k 2400 env ZWRT_TEX_LUT=8192 python tools/scenebench.py earth 400 400 128 10 3

# 5. Re-measure the r5 batch's one degraded-window outlier (rtw 64/8 read
#    37 s in tpu_runs/r5/08; expected ~1.35 s)
step 14_rtw_64_8 1800 python tools/scenebench.py rtw_final 400 400 64 8 4

# 6. Speculative two-successor traversal A/B (r5 steps 25/26 crashed on a
#    Mosaic i1-vector-select; fixed — the carried hit mask is i32 now)
step 15_rtw_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py rtw_final 400 400 64 8 3
step 16_balls_spec 2400 env ZWRT_TRAV=spec python tools/scenebench.py balls 400 400 128 10 3

note "== batch complete $(date -u +%H:%M:%S)"
