#!/bin/bash
# Round-5 measurement batch, part 8: supersampled rendering A/B.
#
# --supersample=K renders at K x resolution with spp/K^2 per subpixel and
# box-downsamples (same box filter + budget, unbiased).  The r5g
# resolution-scaling sweep measured balls +23% per-path at 2x resolution
# (tighter tile view cones shrink the lockstep traversal union) — this
# batch prices whether that effect survives the smaller per-subpixel
# sample count at the committed 400x400 configs.  Plain controls run in
# the SAME session.  Same retry-not-abort gate as r5f/r5g.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5h}
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

note "== batch r5h start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# Tree scenes: the coherence candidates (plain controls same-session).
step 01_balls_plain 2400 python tools/scenebench.py balls 400 400 128 10 3
step 02_balls_ss2 2400 python tools/scenebench.py balls 400 400 128 10 3 --supersample=2
step 03_rtw_plain 2400 python tools/scenebench.py rtw_final 400 400 64 8 3
step 04_rtw_ss2 2400 python tools/scenebench.py rtw_final 400 400 64 8 3 --supersample=2
# Brute scene: expect roughly the r5g 800-px rate minus the shorter
# per-subpixel sample amortization.
step 05_cornell_plain 2400 python tools/scenebench.py cornell_box 400 400 128 10 3
step 06_cornell_ss2 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --supersample=2

note "== batch r5h complete $(date -u +%H:%M:%S)"
