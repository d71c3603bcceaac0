#!/bin/bash
# Round-5 measurement batch, part 5: sharded adaptive on hardware.
# Same retry-not-abort gate semantics as tpu_batch_r5c.sh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5e}
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

note "== batch r5e start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# Sharded adaptive on the real chip (1-device mesh): the shard_map
# plumbing + psum'd plan pipeline must not cost wall vs the direct
# single-device adaptive path (r5b/08: 0.294 s at this config).
step 01_adaptive_ctl 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --adaptive=1
step 02_adaptive_shard_samples 3600 python tools/scenebench.py cornell_box 400 400 128 10 3 --adaptive=1 --shard=samples
step 03_adaptive_shard_rows 3600 python tools/scenebench.py cornell_box 400 400 128 10 3 --adaptive=1 --shard=rows

note "== batch r5e complete $(date -u +%H:%M:%S)"
