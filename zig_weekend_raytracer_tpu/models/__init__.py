"""The built-in scene library ("model zoo"), mirroring the reference's five
scenes (src/scene.zig:18-34) constant-for-constant:

  * balls        — book-1 final: ~488 random spheres, checker ground, DoF
  * shrek_quads  — 5 image-textured quads
  * emissive     — quad + sphere area lights, glass sphere in the light list
  * cornell_box  — Cornell walls, glass sphere, rotated+translated metal box
  * rtw_final    — book-2 final: ground boxes, instanced 1000-sphere cluster
"""

from __future__ import annotations

import enum
import os
from typing import Callable, Dict, Optional

from ..scene import Scene
from .balls import load_scene_balls
from .shrek_quads import load_scene_shrek_quads
from .emissive import load_scene_emissive
from .cornell_box import load_scene_cornell_box
from .earth import load_scene_earth
from .rtw_final import load_scene_rtw_final
from .scenefile import load_scene_file

DEFAULT_ASSET_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "assets")
)


class SceneType(enum.Enum):
    """--scene choices (reference: src/scene.zig:18-24)."""

    BALLS = "balls"
    SHREK_QUADS = "shrek_quads"
    EMISSIVE = "emissive"
    CORNELL_BOX = "cornell_box"
    RTW_FINAL = "rtw_final"
    # extension: BASELINE config 2 (earth.png ships unused in the
    # reference's assets — no reference scene to match, see models/earth.py)
    EARTH = "earth"


SCENE_BUILDERS: Dict[SceneType, Callable[..., Scene]] = {
    SceneType.BALLS: load_scene_balls,
    SceneType.SHREK_QUADS: load_scene_shrek_quads,
    SceneType.EMISSIVE: load_scene_emissive,
    SceneType.CORNELL_BOX: load_scene_cornell_box,
    SceneType.RTW_FINAL: load_scene_rtw_final,
    SceneType.EARTH: load_scene_earth,
}


def load_scene(
    scene_type, seed: int = 0, asset_dir: Optional[str] = None
) -> Scene:
    """Factory (reference: loadScene, src/scene.zig:26-34)."""
    if isinstance(scene_type, str):
        scene_type = SceneType(scene_type)
    builder = SCENE_BUILDERS[scene_type]
    return builder(seed=seed, asset_dir=asset_dir or DEFAULT_ASSET_DIR)
