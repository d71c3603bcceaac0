#!/bin/bash
# Round-5 measurement batch, part 7: resolution scaling.
#
# Every committed throughput number so far is at 400x400 — this batch
# checks that path throughput holds as the IMAGE grows (the production
# question: does the wavefront chunking keep the chip saturated at 4x
# and 16x the pixel count, or does some fixed structure bite?).
# cornell (brute megakernel, rows=64) and balls (tree scene, rows=8)
# at 800x800 and 1600x1600.  Same retry-not-abort gate as r5f.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5g}
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

note "== batch r5g start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# 400x400 control in the SAME session (tunnel state varies day to day;
# scaling must be judged against a same-session anchor).
step 01_cornell_400 2400 python tools/scenebench.py cornell_box 400 400 128 10 3
step 02_cornell_800 2400 python tools/scenebench.py cornell_box 800 800 128 10 3
step 03_cornell_1600 3600 python tools/scenebench.py cornell_box 1600 1600 128 10 3
step 04_balls_400 2400 python tools/scenebench.py balls 400 400 128 10 3
step 05_balls_800 3600 python tools/scenebench.py balls 800 800 128 10 3

note "== batch r5g complete $(date -u +%H:%M:%S)"
