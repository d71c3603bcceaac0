"""Scene library and compiler tests: entity counts per scene, transform
baking, light lists (reference: src/scene.zig builders)."""

import math

import numpy as np
import pytest

import zig_weekend_raytracer_tpu as zwrt
from zig_weekend_raytracer_tpu.scene import (
    MAT_DIELECTRIC,
    PRIM_QUAD,
    PRIM_SPHERE,
    Camera,
    SceneBuilder,
)


class TestSceneLibrary:
    def test_cornell_box_inventory(self):
        c = zwrt.models.load_scene("cornell_box").compiled
        # 5 walls + 6 box faces + 1 light quad; 1 glass sphere
        assert c.n_quads == 12
        assert c.n_spheres == 1
        assert c.n_lights == 2  # glass sphere + light quad
        kinds = {k for k, _ in c.lights}
        assert kinds == {PRIM_SPHERE, PRIM_QUAD}

    def test_emissive_inventory(self):
        c = zwrt.models.load_scene("emissive").compiled
        assert c.n_spheres == 3
        assert c.n_quads == 1
        assert c.n_lights == 3  # quad + sphere lights + glass sphere

    def test_shrek_quads_inventory(self):
        c = zwrt.models.load_scene("shrek_quads").compiled
        assert c.n_quads == 5
        assert c.n_spheres == 0
        assert not c.has_lights
        assert c.has_image_textures

    def test_balls_inventory(self):
        scene = zwrt.models.load_scene("balls")
        c = scene.compiled
        # ground + up to 22x22 grid + 3 feature spheres; grid is random but
        # most cells survive the exclusion test
        assert 300 < c.n_spheres <= 4 + 22 * 22
        assert c.has_bvh
        assert scene.camera.has_depth_of_field

    def test_rtw_final_inventory(self):
        c = zwrt.models.load_scene("rtw_final").compiled
        assert c.n_quads == 20 * 20 * 6 + 1  # ground boxes + light
        assert c.n_spheres == 5 + 1000
        assert c.n_lights == 1
        assert c.has_bvh
        assert c.has_image_textures

    def test_deterministic_given_seed(self):
        a = zwrt.models.load_scene("balls", seed=5).compiled
        b = zwrt.models.load_scene("balls", seed=5).compiled
        assert a.n_spheres == b.n_spheres
        np.testing.assert_array_equal(
            np.asarray(a.sph_center.x), np.asarray(b.sph_center.x)
        )


class TestTransformBaking:
    def test_translate_sphere(self):
        b = SceneBuilder()
        m = b.lambertian(b.solid_color((1, 1, 1)))
        b.add(b.translate((10, 0, 0), b.sphere((1, 2, 3), 1.0, m)))
        c = b.compile().compiled
        assert float(c.sph_center.x[0]) == pytest.approx(11.0)
        assert float(c.sph_center.y[0]) == pytest.approx(2.0)

    def test_rotate_y_sphere(self):
        b = SceneBuilder()
        m = b.lambertian(b.solid_color((1, 1, 1)))
        b.add(b.rotate_y(90.0, b.sphere((1, 0, 0), 1.0, m)))
        c = b.compile().compiled
        # object->world Y-rotation by 90 deg: (x,z) -> (z', ...):
        # newx = cos*x + sin*z = 0; newz = -sin*x + cos*z = -1
        assert float(c.sph_center.x[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(c.sph_center.z[0]) == pytest.approx(-1.0, abs=1e-6)
        # UV un-rotation cached
        assert float(c.sph_uv_cos[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(c.sph_uv_sin[0]) == pytest.approx(1.0, abs=1e-6)

    def test_translate_of_rotate_composition(self):
        """Cornell's box2 pattern: Translate(offset, RotateY(15, box))
        (src/scene.zig:370): world = offset + R @ p."""
        b = SceneBuilder()
        m = b.lambertian(b.solid_color((1, 1, 1)))
        b.add(
            b.translate((100, 0, 0), b.rotate_y(90.0, b.sphere((1, 0, 0), 1, m)))
        )
        c = b.compile().compiled
        assert float(c.sph_center.x[0]) == pytest.approx(100.0, abs=1e-5)
        assert float(c.sph_center.z[0]) == pytest.approx(-1.0, abs=1e-5)

    def test_box_has_six_faces_with_outward_area(self):
        b = SceneBuilder()
        m = b.lambertian(b.solid_color((1, 1, 1)))
        b.add(b.box((0, 0, 0), (2, 3, 4), m))
        c = b.compile().compiled
        assert c.n_quads == 6
        areas = sorted(np.asarray(c.quad_area)[:6].tolist())
        assert areas == pytest.approx(sorted([6, 6, 8, 8, 12, 12]))

    def test_quad_plane_parameters(self):
        b = SceneBuilder()
        m = b.lambertian(b.solid_color((1, 1, 1)))
        b.add(b.quad((0, 0, 5), (2, 0, 0), (0, 2, 0), m))
        c = b.compile().compiled
        assert float(c.quad_normal.z[0]) == pytest.approx(1.0)
        assert float(c.quad_offset[0]) == pytest.approx(5.0)
        assert float(c.quad_area[0]) == pytest.approx(4.0)


class TestCamera:
    def test_viewport_matches_reference_formulas(self):
        """Cornell camera (src/scene.zig:386-399) viewport geometry
        (src/camera.zig:117-157)."""
        cam = Camera(
            look_from=(278, 278, -800), look_at=(278, 278, 0),
            vfov_degrees=40.0, focus_dist=10.0,
        )
        pixel00, du, dv = cam.viewport(400, 400)
        h = math.tan(math.radians(40) / 2)
        vp_h = 2 * h * 10.0
        # w = (0,0,-1); u = (-1,0,0); v = (0,1,0)
        assert du[0] == pytest.approx(-vp_h / 400, rel=1e-5)
        assert dv[1] == pytest.approx(-vp_h / 400, rel=1e-5)
        # center of viewport is 10 units toward look_at
        center = pixel00 + 199.5 * du + 199.5 * dv
        np.testing.assert_allclose(center, [278, 278, -790], rtol=1e-5)

    def test_defocus_disk(self):
        cam = Camera(
            look_from=(13, 2, 3), look_at=(0, 0, 0),
            vfov_degrees=20.0, focus_dist=10.0, defocus_angle_degrees=0.6,
        )
        assert cam.has_depth_of_field
        ddu, ddv = cam.defocus_disk()
        radius = 10.0 * math.tan(math.radians(0.3))
        assert np.linalg.norm(ddu) == pytest.approx(radius, rel=1e-5)
        assert np.linalg.norm(ddv) == pytest.approx(radius, rel=1e-5)


def test_rotate_of_translate_composition():
    """rotate_y(translate(child)) must bake world = R @ (p + offset) — the
    translate happens in the frame of the enclosing rotation (reference ray
    transform order, src/entity.zig:93-99, :169-205)."""
    b = SceneBuilder()
    m = b.lambertian(b.solid_color((1, 1, 1)))
    b.add(b.rotate_y(90.0, b.translate((1, 0, 0), b.sphere((0, 0, 0), 1, m))))
    c = b.compile().compiled
    # p + offset = (1,0,0); rotate_y(90): x' = cos*x + sin*z = 0, z' = -1
    assert float(c.sph_center.x[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(c.sph_center.z[0]) == pytest.approx(-1.0, abs=1e-6)
