#!/bin/bash
# Round-5 measurement batch, part 3: texture-LUT image-quality deltas +
# a final six-scene device golden gate over the round-5 kernel changes.
# Same retry-not-abort gate semantics as tpu_batch_r5.sh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5c}
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

# 1. Texture-LUT image-quality deltas (VERDICT r4 #5: publish the delta
#    next to the throughput A/B) — exact vs LUT at matched sample counts
step 01_lutq_shrek 3600 python tools/lut_quality.py shrek_quads 8192 32768 --spp=64
step 02_lutq_rtw 3600 python tools/lut_quality.py rtw_final 8192 --spp=32 --depth=8
step 03_lutq_earth 3600 python tools/lut_quality.py earth 8192 --spp=64

# 2. Six-scene device golden gate after the round-5 kernel changes
step 04_golden 5400 python tools/tpu_golden_check.py

note "== batch complete $(date -u +%H:%M:%S)"

# 3. VPU-peak re-run with the per-zone device-time breakdown (the r5b run
#    read identical 141.3 ms device totals for rows=8 and rows=64 — the
#    latency-bound story — but wall < device suggests either early host
#    reads or double-counted trace rows; the zone breakdown disambiguates)
step 05_vpu_zones 3600 python tools/vpu_peak.py --update-constants

# 4. Shrek LUT A/B re-run (r5b steps 10-11 ran before the u32->f32 cast
#    fix) + the LUT x coherent combination on rtw
step 06_shrek_lut8k 1800 env ZWRT_TEX_LUT=8192 python tools/scenebench.py shrek_quads 400 400 128 10 4
step 07_shrek_lut32k 2400 env ZWRT_TEX_LUT=32768 python tools/scenebench.py shrek_quads 400 400 128 10 3
step 08_rtw_lut_coh 2400 env ZWRT_TEX_LUT=8192 ZWRT_COHERENT=1 python tools/scenebench.py rtw_final 400 400 64 8 3
step 09_rtw_lut_128_10 2400 env ZWRT_TEX_LUT=8192 python tools/scenebench.py rtw_final 400 400 128 10 3
step 10_earth_lut32k 1800 env ZWRT_TEX_LUT=32768 python tools/scenebench.py earth 400 400 128 10 3
