"""Profiler zones: the TPU-native equivalent of the reference's Tracy
integration.

The reference instruments hot paths with ``ztracy.ZoneN`` zones that compile
to no-op stubs unless Tracy is enabled at build time
(reference: build.zig:53,69-77; libs/ztracy/src/ztracy.zig:6-23).  Here zones
map to ``jax.profiler`` trace annotations (visible in XProf / TensorBoard /
Perfetto) plus ``jax.named_scope`` so the zone names survive into HLO.  The
same compile-out semantics apply: when profiling is disabled (the default)
``named_zone`` is a no-op context manager.

Zone names mirror the reference's Tracy zone set so traces can be compared
side-by-side: Renderer::render, rayColorLine, rayColor, BVH::hit,
Sphere::hit, AABB::hit, Material::scatter, ImageTexture::value, ...
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_enabled = os.environ.get("ZWRT_PROFILE", "0") not in ("", "0", "false")

# host-side zone accumulator: name -> [count, total_s, min_s, max_s]
# (the Tracy-lite statistics view: per-zone wall clock without a trace
# viewer, the analog of Tracy's live zone table)
_zones: dict = {}


def set_profiling(enabled: bool) -> None:
    global _enabled
    _enabled = bool(enabled)


def profiling_enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def named_zone(name: str):
    """Zone annotation; no-op unless profiling is enabled.

    When enabled, also accumulates HOST wall-clock per zone (async device
    work counts only up to dispatch unless the zone blocks on a result —
    same caveat as any host-side profiler around an async runtime)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
            yield
    finally:
        dt = time.perf_counter() - t0
        z = _zones.get(name)
        if z is None:
            _zones[name] = [1, dt, dt, dt]
        else:
            z[0] += 1
            z[1] += dt
            z[2] = min(z[2], dt)
            z[3] = max(z[3], dt)


def zone_summary() -> dict:
    """{zone: (count, total_s, min_s, max_s)} accumulated so far."""
    return {k: tuple(v) for k, v in _zones.items()}


def reset_zones() -> None:
    _zones.clear()


def format_zone_summary() -> str:
    """Tracy-lite per-zone statistics table (sorted by total time)."""
    if not _zones:
        return "no profiler zones recorded (is ZWRT_PROFILE/--profile on?)"
    rows = sorted(_zones.items(), key=lambda kv: -kv[1][1])
    name_w = max(4, max(len(k) for k, _ in rows))
    lines = [
        f"{'zone':<{name_w}}  {'count':>7}  {'total':>10}  "
        f"{'mean':>10}  {'min':>10}  {'max':>10}"
    ]
    for name, (n, tot, mn, mx) in rows:
        lines.append(
            f"{name:<{name_w}}  {n:>7}  {tot * 1e3:>8.2f}ms  "
            f"{tot / n * 1e3:>8.2f}ms  {mn * 1e3:>8.2f}ms  "
            f"{mx * 1e3:>8.2f}ms"
        )
    return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace for the enclosed block (viewable in
    TensorBoard/Perfetto), the analog of running the reference under the
    Tracy viewer."""
    with jax.profiler.trace(log_dir):
        yield
