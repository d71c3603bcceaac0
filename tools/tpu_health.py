"""Tunnel health probe: prints ONE JSON line and exits 0 (healthy) or
75/EX_TEMPFAIL (unavailable or degraded).

    {"healthy": true, "best_s": 0.107, "threshold_s": 0.15, "reason": "ok"}

Replaces the grep-a-log gates in tools/tpu_batch_r4{b,c}.sh (the r4c grep
pattern never matched scenebench's output, so that batch self-aborted —
ADVICE round 4).  Machine-readable, and distinguishes the three states the
bash gates conflated:

  * unavailable — the device probe (fresh interpreter, hard timeout) hung
    or raised: the tunnel is DOWN.  Pattern from bench.py:probe_tpu.
  * degraded    — device answers but the fully-cached cornell render runs
    slower than THRESHOLD_S (observed 2x degradation windows on
    2026-08-19 silently corrupt steady-state records).
  * healthy     — cached cornell at the healthy-window speed.

The render itself runs in a child subprocess under a hard timeout so a
tunnel that dies mid-probe can never hang the caller.

Usage: python tools/tpu_health.py [--threshold=0.15] [--reps=3]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EX_TEMPFAIL = 75
PROBE_TIMEOUT_S = 75
CHILD_TIMEOUT_S = 600  # cached compile; generous for a cold jit over the tunnel


def _emit(healthy: bool, best_s, threshold: float, reason: str) -> int:
    print(json.dumps({
        "healthy": healthy,
        "best_s": best_s,
        "threshold_s": threshold,
        "reason": reason,
    }))
    return 0 if healthy else EX_TEMPFAIL


def _child(reps: int) -> None:
    """Render the fully-cached cornell bench config; print best seconds."""
    import time

    import numpy as np

    import zig_weekend_raytracer_tpu as zwrt

    scene = zwrt.models.load_scene("cornell_box")
    renderer = zwrt.render.Renderer(samples_per_pixel=128, max_ray_bounce_depth=10)
    fb = renderer.render_device(scene, 400, 400)
    float(fb.sum())  # force: tunneled block_until_ready returns early
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fb = renderer.render_device(scene, 400, 400)
        float(fb.sum())
        best = min(best, time.time() - t0)
    assert not np.isnan(np.asarray(fb)).any(), "NaN framebuffer in health probe"
    print(f"HEALTH_BEST {best:.4f}")


def main() -> int:
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    threshold = float(opts.get("threshold", 0.15))
    reps = int(opts.get("reps", 3))

    from bench import probe_tpu  # reuse the hardened device probe

    platform = probe_tpu(PROBE_TIMEOUT_S)
    if platform is None:
        return _emit(False, None, threshold, "unavailable: device probe hung or raised")
    if platform != "tpu":
        return _emit(False, None, threshold, f"unavailable: platform is '{platform}'")

    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", f"--reps={reps}"],
            capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return _emit(False, None, threshold,
                     f"unavailable: probe render exceeded {CHILD_TIMEOUT_S}s")
    best = None
    for line in res.stdout.splitlines():
        if line.startswith("HEALTH_BEST "):
            best = float(line.split()[1])
    if best is None:
        tail = (res.stderr or res.stdout).strip()[-300:]
        return _emit(False, None, threshold,
                     f"unavailable: probe render died rc={res.returncode}: {tail}")
    if best >= threshold:
        return _emit(False, best, threshold,
                     f"degraded: cached cornell {best:.3f}s >= {threshold}s")
    return _emit(True, best, threshold, "ok")


if __name__ == "__main__":
    if "--child" in sys.argv:
        reps = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--reps=")), "3"))
        _child(reps)
    else:
        sys.exit(main())
