"""Declarative JSON scene files (models/scenefile.py).

Beyond-reference capability: the reference compiles scenes into the binary
(src/scene.zig); here a data file reaches the identical SceneBuilder path,
so a file-built scene renders BITWISE equal to the same scene built in
Python."""

import json

import numpy as np
import pytest

from zig_weekend_raytracer_tpu.models import load_scene_file
from zig_weekend_raytracer_tpu.render import Renderer
from zig_weekend_raytracer_tpu.scene import Camera, SceneBuilder


def _write(tmp_path, doc, name="scene.json"):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


_MINI = {
    "background": [0.0, 0.0, 0.0],
    "camera": {"look_from": [0, 2, 6], "look_at": [0, 1, 0],
               "vfov_degrees": 45},
    "textures": {
        "red": {"solid": [0.65, 0.05, 0.05]},
        "white": {"solid": [0.73, 0.73, 0.73]},
        "check": {"checker": {"inv_scale": 0.5, "even": "red",
                               "odd": "white"}},
        "bright": {"solid": [8, 8, 8]},
    },
    "materials": {
        "floor": {"lambertian": "check"},
        "ball": {"metal": {"albedo": [0.8, 0.7, 0.6], "fuzz": 0.05}},
        "glass": {"dielectric": 1.5},
        "lamp": {"diffuse_light": "bright"},
    },
    "entities": [
        {"quad": {"start": [-6, 0, -6], "edge_u": [12, 0, 0],
                  "edge_v": [0, 0, 12], "material": "floor"}},
        {"sphere": {"center": [-1.2, 1, 0], "radius": 1,
                    "material": "ball"}},
        {"sphere": {"center": [1.2, 1, 0], "radius": 1,
                    "material": "glass"}},
        {"quad": {"start": [-1, 4, -1], "edge_u": [2, 0, 0],
                  "edge_v": [0, 0, 2], "material": "lamp"}, "light": True},
    ],
}


def _mini_builder():
    b = SceneBuilder()
    b.set_background((0, 0, 0))
    b.set_camera(Camera(look_from=(0, 2, 6), look_at=(0, 1, 0),
                        vfov_degrees=45))
    red = b.solid_color((0.65, 0.05, 0.05))
    white = b.solid_color((0.73, 0.73, 0.73))
    check = b.checkerboard(0.5, red, white)
    bright = b.solid_color((8, 8, 8))
    floor = b.lambertian(check)
    ball = b.metal((0.8, 0.7, 0.6), 0.05)
    glass = b.dielectric(1.5)
    lamp = b.diffuse_light(bright)
    b.add(b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12), floor))
    b.add(b.sphere((-1.2, 1, 0), 1, ball))
    b.add(b.sphere((1.2, 1, 0), 1, glass))
    light = b.add(b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), lamp))
    b.set_lights([light])
    return b.compile()


def test_file_scene_matches_python_scene_bitwise(tmp_path):
    scene_f = load_scene_file(_write(tmp_path, _MINI))
    scene_p = _mini_builder()
    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
    np.testing.assert_array_equal(
        np.asarray(r.render(scene_f, 8, 8)),
        np.asarray(r.render(scene_p, 8, 8)),
    )


def test_kitchen_sink_entities_compile(tmp_path):
    doc = {
        "camera": {"look_from": [0, 0, 9], "look_at": [0, 0, 0]},
        "textures": {"w": {"solid": [0.7, 0.7, 0.7]}},
        "materials": {"m": {"lambertian": "w"},
                      "fog": {"isotropic": "w"}},
        "entities": [
            {"box": {"a": [-1, -1, -1], "b": [1, 1, 1], "material": "m"}},
            {"translate": {"offset": [3, 0, 0],
                           "child": {"rotate_y": {"angle_degrees": 30,
                                                  "child": {"box": {
                                                      "a": [0, 0, 0],
                                                      "b": [1, 2, 1],
                                                      "material": "m"}}}}}},
            {"moving_sphere": {"center0": [0, 3, 0], "center1": [1, 3, 0],
                               "radius": 0.5, "material": "fog"}},
            {"collection": {"children": [
                {"sphere": {"center": [-3, 0, 0], "radius": 0.5,
                            "material": "m"}}], "bvh": True}},
        ],
        "use_bvh": {"enable": True, "min_prims": 2},
    }
    scene = load_scene_file(_write(tmp_path, doc))
    fb = Renderer(samples_per_pixel=2, max_ray_bounce_depth=3).render(
        scene, 8, 8
    )
    assert np.isfinite(fb).all()


def test_image_texture_resolves_relative_to_file(tmp_path):
    from PIL import Image

    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 1] = 200  # green
    Image.fromarray(img).save(tmp_path / "tex.png")
    doc = {
        "camera": {"look_from": [0, 0, 5], "look_at": [0, 0, 0]},
        "textures": {"t": {"image": "tex.png"}},
        "materials": {"m": {"diffuse_light": "t"}},
        "entities": [{"quad": {"start": [-50, -50, -1],
                               "edge_u": [100, 0, 0],
                               "edge_v": [0, 100, 0],
                               "material": "m"}}],
    }
    scene = load_scene_file(_write(tmp_path, doc))
    fb = np.asarray(
        Renderer(samples_per_pixel=1, max_ray_bounce_depth=2).render(
            scene, 4, 4
        )
    )
    assert fb[..., 1].mean() > 10 * max(fb[..., 0].mean(), 1e-6)


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda d: d.pop("camera"), "'camera' object is required"),
        (lambda d: d["materials"].update({"bad": {"lambertian": "nope"}}),
         "unknown texture 'nope'"),
        (lambda d: d["entities"].append({"frob": {}}), "unknown kind 'frob'"),
        (lambda d: d["textures"].update({"bad": {"plaid": 1}}),
         "unknown kind 'plaid'"),
        (lambda d: d["camera"].update({"zoom": 2}),
         "unknown camera fields"),
        (lambda d: d["entities"].append(
            {"sphere": {"center": [0, 0, 0], "radius": 1,
                        "material": "nope"}}), "unknown material 'nope'"),
        (lambda d: d["entities"].append(
            {"translate": {"offset": [0, 0, 0],
                           "child": {"sphere": {"center": [0, 5, 0],
                                                 "radius": 1,
                                                 "material": "floor"},
                                     "light": True}}}),
         "only supported on top-level"),
    ],
)
def test_schema_errors(tmp_path, mutate, match):
    doc = json.loads(json.dumps(_MINI))
    mutate(doc)
    with pytest.raises(ValueError, match=match):
        load_scene_file(_write(tmp_path, doc))


def test_cli_scene_file_error_is_clean(tmp_path, capsys):
    from zig_weekend_raytracer_tpu.cli import main

    rc = main([
        "--image_width=4", "--image_height=4",
        f"--scene_file={tmp_path}/missing.json",
        "--image_out_path=/tmp/never.ppm",
    ])
    assert rc == 1
    assert "scene_file" in capsys.readouterr().err
