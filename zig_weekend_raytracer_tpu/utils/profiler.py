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

import jax

_enabled = os.environ.get("ZWRT_PROFILE", "0") not in ("", "0", "false")


def set_profiling(enabled: bool) -> None:
    global _enabled
    _enabled = bool(enabled)


def profiling_enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def named_zone(name: str):
    """Zone annotation; no-op unless profiling is enabled."""
    if not _enabled:
        yield
        return
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace for the enclosed block (viewable in
    TensorBoard/Perfetto), the analog of running the reference under the
    Tracy viewer."""
    with jax.profiler.trace(log_dir):
        yield
