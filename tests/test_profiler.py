"""Host-side zone statistics (the Tracy-lite CLI view).

The reference gets live per-zone stats from the Tracy viewer
(src/render.zig:30 etc.); without a viewer this framework accumulates
host wall-clock per named_zone and prints a table (utils/profiler.py).
"""

import time

from zig_weekend_raytracer_tpu.utils import profiler


def setup_function(_fn):
    profiler.reset_zones()
    profiler.set_profiling(True)


def teardown_function(_fn):
    profiler.set_profiling(False)
    profiler.reset_zones()


def test_zone_accumulation_counts_and_times():
    for _ in range(3):
        with profiler.named_zone("unit::fast"):
            pass
    with profiler.named_zone("unit::slow"):
        time.sleep(0.01)
    s = profiler.zone_summary()
    assert s["unit::fast"][0] == 3
    n, tot, mn, mx = s["unit::slow"]
    assert n == 1
    assert tot >= 0.009
    assert mn <= mx <= tot + 1e-9


def test_zones_noop_when_disabled():
    profiler.set_profiling(False)
    with profiler.named_zone("unit::off"):
        pass
    assert "unit::off" not in profiler.zone_summary()


def test_format_table_sorted_by_total():
    with profiler.named_zone("unit::big"):
        time.sleep(0.01)
    with profiler.named_zone("unit::small"):
        pass
    out = profiler.format_zone_summary()
    lines = out.splitlines()
    assert "zone" in lines[0] and "count" in lines[0]
    assert lines[1].startswith("unit::big")
    assert "unit::small" in out


def test_cli_profile_flag_prints_table(tmp_path, capsys):
    from zig_weekend_raytracer_tpu.cli import main

    out_path = tmp_path / "p.ppm"
    rc = main([
        "--image_width=8", "--image_height=8", "--samples_per_pixel=1",
        "--ray_bounce_max_depth=2", "--scene=cornell_box",
        f"--image_out_path={out_path}", "--profile=true",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Renderer::render" in captured
    assert "count" in captured


def test_parse_device_trace_aggregates_device_pids(tmp_path):
    """parse_device_trace sums X-event durations on device timelines only
    and maps op names onto the reference's zone vocabulary."""
    import gzip
    import json
    import os

    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/host:CPU"}},
            {"ph": "M", "pid": 2, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "X", "pid": 1, "tid": 0, "ts": 0, "dur": 5000,
             "name": "host_thing"},
            {"ph": "X", "pid": 2, "tid": 0, "ts": 0, "dur": 2000,
             "name": "jit__fused/pallas_call.bounce_kernel"},
            {"ph": "X", "pid": 2, "tid": 0, "ts": 3000, "dur": 1000,
             "name": "jit__fused/pallas_call.bounce_kernel"},
            {"ph": "X", "pid": 2, "tid": 0, "ts": 5000, "dur": 500,
             "name": "atlas_gather.1"},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    agg = profiler.parse_device_trace(str(tmp_path))
    bounce = agg["rayColor (bounce megakernel)"]
    assert bounce == (2, 3.0)  # 3000 us -> 3 ms, host event excluded
    atlas = agg["ImageTexture::value (atlas pass)"]
    assert atlas == (1, 0.5)
    table = profiler.format_device_summary(agg)
    assert "rayColor (bounce megakernel)" in table
    assert "TOTAL" in table


def test_zone_mapping_no_substring_misattribution():
    """Generic HLO names must bucket by op KIND, never by substring
    (round-3 bug class: a fusion whose name contained "while"/"gather"
    landed in "render loop"/"atlas" silently)."""
    z = profiler._zone_for
    # a fusion with a suggestive name is still a fusion
    assert z("fusion.gather_things.3") == "XLA fusion"
    assert z("jit(render)/while/body/fusion.7") == "XLA fusion"
    # bare op kinds map to their kind zones (with or without path prefix)
    assert z("while.4") == "render loop (while)"
    assert z("jit(render)/while.4") == "render loop (while)"
    assert z("gather.12") == "gather op"
    assert z("copy-start.2") == "memcpy"
    assert z("dynamic-update-slice.9") == "scatter/update op"
    # our kernels match by their real emitted names wherever they appear
    assert z("jit__fused/pallas_call._bounce_kernel") == \
        "rayColor (bounce megakernel)"
    assert z("_fused_render_kernel.0") == \
        "rayColorLine (whole-render megakernel)"
    assert z("tree_kernel.1") == "BVH::hit (tree traversal kernel)"
    # named_zone scopes survive into metadata paths
    assert z("jit(render)/atlas/gather.3") == \
        "ImageTexture::value (atlas pass)"
    # unknown ops keep their own (truncated) name, not a stolen zone
    assert z("exp.77") == "exp"


def test_cli_profile_device_runs(tmp_path, capsys):
    """--profile=device captures a trace around the render and prints the
    device table (empty-on-CPU message is acceptable — CPU traces carry no
    device timeline)."""
    from zig_weekend_raytracer_tpu.cli import main

    out_path = tmp_path / "p.ppm"
    rc = main([
        "--image_width=8", "--image_height=8", "--samples_per_pixel=1",
        "--ray_bounce_max_depth=2", "--scene=cornell_box",
        f"--image_out_path={out_path}", "--profile=device",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert ("device zone" in captured) or ("no device trace" in captured)
