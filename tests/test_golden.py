"""Golden-region tests: pin the Cornell composition against regressions
(swapped walls, broken light, dead importance sampling).

The reference has no golden tests (SURVEY.md §4); these are statistical so
they're robust to Monte-Carlo noise and sampler changes.
"""

import numpy as np
import pytest

import zig_weekend_raytracer_tpu as zwrt
from zig_weekend_raytracer_tpu.render import Renderer


@pytest.fixture(scope="module")
def cornell_fb():
    scene = zwrt.models.load_scene("cornell_box")
    return Renderer(samples_per_pixel=24, max_ray_bounce_depth=6, seed=0).render(
        scene, 40, 40
    )


def test_wall_colors_on_correct_sides(cornell_fb):
    """Camera at (278,278,-800) looking +z: image-right = -x, so the green
    wall (x=555) is LEFT and the red wall (x=0) is RIGHT."""
    fb = cornell_fb
    left = fb[10:30, 2:8]    # green wall region
    right = fb[10:30, 32:38]  # red wall region
    assert left[..., 1].mean() > 2.0 * left[..., 0].mean()   # green >> red
    assert right[..., 0].mean() > 2.0 * right[..., 1].mean()  # red >> green


def test_ceiling_light_is_bright_white(cornell_fb):
    fb = cornell_fb
    light = fb[4:7, 16:24]  # top-center
    assert light.mean() > 5.0  # emits (15,15,15)
    # white: channels balanced
    ratios = light.mean(axis=(0, 1))
    assert ratios.max() / ratios.min() < 1.5


def test_scene_is_lit(cornell_fb):
    """Importance sampling working => interior is visibly lit, not black."""
    interior = cornell_fb[15:35, 10:30]
    assert interior.mean() > 0.05
    assert np.isfinite(cornell_fb).mean() > 0.999


def test_floor_brighter_than_ceiling_corners(cornell_fb):
    # light points down; floor receives direct light
    floor = cornell_fb[36:40, 12:28].mean()
    corner = cornell_fb[6:9, 2:5].mean()
    assert floor > corner
