#!/bin/bash
# Round-5 measurement batch, part 4: the two tile-width questions the
# round-5 results re-opened.
#   (a) rows=128 for brute scenes — the round-4 sweep stopped at 64
#       (8/16/32/64 -> 244.6/282.6/285.0/296.8 Mpaths/s on cornell
#       @1024spp); if the trend holds past 64 the north star moves.
#   (b) rows=16/32 for LUT-mode rtw — the tree-scene width negative
#       (tpu_runs/r5/21-24) was measured in EXACT/atlas mode; the LUT
#       path removed the suspend/resume structure that dominated those
#       runs, so the divergence-vs-ILP balance must be re-priced.
# Same retry-not-abort gate semantics as tpu_batch_r5c.sh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5d}
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

note "== batch r5d start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# (a) rows=128 on the brute scenes, with same-session rows=64 controls
step 01_cornell_r64_ctl 2400 python tools/scenebench.py cornell_box 400 400 1024 10 3
step 02_cornell_r128 3600 env ZWRT_ROWS=128 python tools/scenebench.py cornell_box 400 400 1024 10 3
step 03_emissive_r64_ctl 2400 python tools/scenebench.py emissive 400 400 128 10 4
step 04_emissive_r128 3600 env ZWRT_ROWS=128 python tools/scenebench.py emissive 400 400 128 10 4

# (b) LUT-mode rtw tile width (coherent stays default-on for tree scenes)
step 05_rtw_lut_coh_r8_ctl 2400 env ZWRT_TEX_LUT=8192 python tools/scenebench.py rtw_final 400 400 64 8 3
step 06_rtw_lut_coh_r16 3600 env ZWRT_TEX_LUT=8192 ZWRT_ROWS=16 python tools/scenebench.py rtw_final 400 400 64 8 3
step 07_rtw_lut_coh_r32 3600 env ZWRT_TEX_LUT=8192 ZWRT_ROWS=32 python tools/scenebench.py rtw_final 400 400 64 8 3

# (b') shrek under LUT is already fused-megakernel; its tree gate keeps
# rows=8 — price 16/32 there too (compile ~13 min each, one-time)
step 08_shrek_lut8k_r16 3600 env ZWRT_TEX_LUT=8192 ZWRT_ROWS=16 python tools/scenebench.py shrek_quads 400 400 128 10 3
step 09_shrek_lut8k_r32 3600 env ZWRT_TEX_LUT=8192 ZWRT_ROWS=32 python tools/scenebench.py shrek_quads 400 400 128 10 3

note "== batch r5d complete $(date -u +%H:%M:%S)"
