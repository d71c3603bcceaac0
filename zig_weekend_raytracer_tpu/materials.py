"""Material evaluation over the compiled material table (SoA form).

The reference dispatches ``IMaterial`` through a tagged union with
method-presence defaults (src/material.zig:25-77); here every material's
response is computed masked/branchless in the integrator, using the helpers
in this module:

  * emitted:        diffuse-light emits its texture on front faces only
                    (src/material.zig:88-96)
  * scattering_pdf: lambertian max(0, cos/pi) (src/material.zig:117-124),
                    isotropic 1/(4 pi) (src/material.zig:145-150)
  * is_specular:    metal + dielectric (src/material.zig:71-76)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .math import v3
from .math.v3 import V3
from .scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_METAL,
    CompiledScene,
)
from .textures import texture_value

INV_4PI = 1.0 / (4.0 * np.pi)
INV_PI = 1.0 / np.pi


def emitted(scene: CompiledScene, mat_type, mat_id, front, u, v, point: V3) -> V3:
    """Emission color; black for non-emissive materials and for the
    backfaces of lights (src/material.zig:93)."""
    tex = texture_value(scene, scene.mat_tex[mat_id], u, v, point)
    emits = (mat_type == MAT_DIFFUSE_LIGHT) & front
    return V3.where(emits, tex, V3.zeros(emits.shape))


def scattering_pdf(mat_type, normal: V3, scattered_dir: V3) -> jnp.ndarray:
    """PDF of the material's own scatter distribution for a given outgoing
    direction (reference: scatteringPdf dispatch src/material.zig:59-69)."""
    unit = v3.normalize(scattered_dir)
    cos_theta = v3.dot(normal, unit)
    lam = jnp.maximum(0.0, cos_theta * INV_PI)
    return jnp.where(mat_type == MAT_ISOTROPIC, INV_4PI, lam)


def is_specular(mat_type) -> jnp.ndarray:
    return (mat_type == MAT_METAL) | (mat_type == MAT_DIELECTRIC)


def schlick_reflectance(cos_theta, refraction_index) -> jnp.ndarray:
    """Schlick Fresnel approximation (src/material.zig:221-225).  Uses the
    material's base index regardless of travel direction, like the
    reference."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
