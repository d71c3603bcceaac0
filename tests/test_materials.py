"""Material model tests against closed-form values — coverage the reference
never had (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zig_weekend_raytracer_tpu import materials
from zig_weekend_raytracer_tpu.math import v3
from zig_weekend_raytracer_tpu.math.v3 import V3
from zig_weekend_raytracer_tpu.sampling import hashrng
from zig_weekend_raytracer_tpu.scene import (
    MAT_DIELECTRIC,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_METAL,
)


def vconst(x, y, z, n=1):
    f = jnp.float32
    return V3(jnp.full((n,), x, f), jnp.full((n,), y, f), jnp.full((n,), z, f))


class TestScatteringPdf:
    def test_lambertian_cos_over_pi(self):
        normal = vconst(0, 0, 1)
        d = vconst(0, 0, 2)  # unnormalized; pdf normalizes
        p = materials.scattering_pdf(jnp.int32(MAT_LAMBERTIAN), normal, d)
        assert float(p[0]) == pytest.approx(1 / np.pi, rel=1e-5)

    def test_lambertian_backside_zero(self):
        normal = vconst(0, 0, 1)
        d = vconst(0, 0, -1)
        p = materials.scattering_pdf(jnp.int32(MAT_LAMBERTIAN), normal, d)
        assert float(p[0]) == 0.0

    def test_isotropic_quarter_pi(self):
        p = materials.scattering_pdf(
            jnp.int32(MAT_ISOTROPIC), vconst(0, 0, 1), vconst(1, 2, 3)
        )
        assert float(p[0]) == pytest.approx(1 / (4 * np.pi), rel=1e-6)

    def test_lambertian_pdf_integrates_to_one(self):
        """MC check: E[1] under cosine sampling == integral of cos/pi over
        the hemisphere == 1."""
        n = 1 << 15
        rid = jnp.arange(n, dtype=jnp.uint32)
        u1, u2, _, _ = hashrng.uniform4(jnp.uint32(0), rid, 0)
        d = hashrng.cosine_direction_z(u1, u2)
        normal = vconst(0, 0, 1, n)
        pdf_val = materials.scattering_pdf(
            jnp.full((n,), MAT_LAMBERTIAN, jnp.int32), normal, d
        )
        # importance sampling with matching pdf: estimator pdf/pdf = 1
        cos_pdf = jnp.maximum(d.z, 0.0) / np.pi
        est = np.asarray(pdf_val / cos_pdf)
        np.testing.assert_allclose(est, 1.0, atol=1e-4)


class TestSpecular:
    def test_is_specular(self):
        codes = jnp.asarray(
            [MAT_LAMBERTIAN, MAT_ISOTROPIC, MAT_METAL, MAT_DIELECTRIC]
        )
        spec = np.asarray(materials.is_specular(codes))
        np.testing.assert_array_equal(spec, [False, False, True, True])

    def test_schlick_limits(self):
        # normal incidence: r0 = ((1-n)/(1+n))^2
        r = float(materials.schlick_reflectance(jnp.float32(1.0), jnp.float32(1.5)))
        assert r == pytest.approx(((1 - 1.5) / (1 + 1.5)) ** 2, rel=1e-5)
        # grazing: -> 1
        r = float(materials.schlick_reflectance(jnp.float32(0.0), jnp.float32(1.5)))
        assert r == pytest.approx(1.0, abs=1e-6)

    def test_reflect_grazing_metal(self):
        d = vconst(1, 0, -1)
        nrm = vconst(0, 0, 1)
        r = v3.reflect(d, nrm)
        assert float(r.x[0]) == pytest.approx(1.0)
        assert float(r.z[0]) == pytest.approx(1.0)

    def test_refract_total_internal_reflection_condition(self):
        # from glass (n=1.5) to air at 60 degrees: sin > 1/1.5 -> TIR
        theta = np.deg2rad(60.0)
        sin_theta = np.sin(theta)
        assert 1.5 * sin_theta > 1.0  # the integrator's must_reflect branch
