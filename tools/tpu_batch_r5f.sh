#!/bin/bash
# Round-5 measurement batch, part 6: end-of-round confirmation.
#
# The sharded renderer was unified after the r5e batch (render_sharded
# gained dynamic sample0/sample_count and render_batch_sharded became a
# delegation, commit 3206064) — this batch re-confirms on hardware that
# (a) the north-star bench + six-scene golden gate still hold after every
# round-5 code change, and (b) the refactored sharded paths (uniform
# samples/rows + progressive checkpoint x shard) run green on the chip.
# Same retry-not-abort gate semantics as tpu_batch_r5e.sh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
OUT=${ZWRT_BATCH_OUT:-tpu_runs/r5f}
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

note "== batch r5f start $(date -u +%H:%M:%S) $(date -u +%Y-%m-%d)"
wait_healthy

# North-star bench (driver methodology) + six-scene device golden gate.
step 01_bench 3600 python bench.py
step 02_golden 3600 python tools/tpu_golden_check.py

# Refactored sharded paths on hardware (1-device mesh): uniform render
# through render_sharded in both modes (r5/19 baseline: <= ~5% overhead).
step 03_shard_samples 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --shard=samples
step 04_shard_rows 2400 python tools/scenebench.py cornell_box 400 400 128 10 3 --shard=rows

# Progressive checkpoint x shard through the CLI (render_batch_sharded
# post-unification): full render in 4 batches, then verify the output is
# a valid image and report stage timings.
step 05_progressive_shard 2400 python -m zig_weekend_raytracer_tpu.cli \
  --image_width=400 --image_height=400 --scene=cornell_box \
  --samples_per_pixel=128 --ray_bounce_max_depth=10 \
  --checkpoint="$OUT/ckpt.npz" --checkpoint_batch_spp=32 \
  --shard=samples --image_out_path="$OUT/progressive_shard.ppm" --stats=1

note "== batch r5f complete $(date -u +%H:%M:%S)"
