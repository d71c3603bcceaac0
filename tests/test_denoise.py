"""AOV-guided a-trous denoiser (render/denoise.py).

Beyond-reference post-process.  Pins the measured quality win (equal-spp
MSE drop on cornell), the safety properties (identity at 0 iterations,
non-negativity, constant images unchanged), and the albedo edge stop that
keeps flush emitters from bleeding."""

import numpy as np

import zig_weekend_raytracer_tpu as zwrt
from zig_weekend_raytracer_tpu.render import Renderer
from zig_weekend_raytracer_tpu.render.aov import render_aovs
from zig_weekend_raytracer_tpu.render.denoise import denoise


def _cornell(spp, seed):
    scene = zwrt.models.load_scene("cornell_box")
    return np.asarray(
        Renderer(
            samples_per_pixel=spp, max_ray_bounce_depth=5, seed=seed
        ).render(scene, 32, 32)
    )


def test_identity_at_zero_iterations():
    scene = zwrt.models.load_scene("cornell_box")
    noisy = _cornell(2, 0)
    aovs = render_aovs(scene, 32, 32, spp=1)
    np.testing.assert_array_equal(denoise(noisy, aovs, iterations=0), noisy)


def test_mse_improves_on_cornell():
    """The headline: 8-spp cornell gets >= 25% closer to a 512-spp
    reference (measured -43% at the default parameters)."""
    scene = zwrt.models.load_scene("cornell_box")
    ref = _cornell(512, 7)
    noisy = _cornell(8, 0)
    aovs = render_aovs(scene, 32, 32, spp=4)
    dn = denoise(noisy, aovs)
    mse0 = ((noisy - ref) ** 2).mean()
    mse1 = ((dn - ref) ** 2).mean()
    assert np.isfinite(dn).all() and (dn >= 0).all()
    assert mse1 < 0.75 * mse0, (mse0, mse1)


def test_emitter_preserved_by_albedo_stop():
    """The ceiling light's brightest pixel survives filtering (the albedo
    stop isolates the emitter; without it the light bleeds and dims)."""
    scene = zwrt.models.load_scene("cornell_box")
    noisy = _cornell(8, 0)
    aovs = render_aovs(scene, 32, 32, spp=4)
    dn = denoise(noisy, aovs)
    assert dn.max() > 0.85 * noisy.max()


def test_constant_irradiance_is_fixed_point():
    """The filter runs in DEMODULATED (irradiance) space: an image that is
    exactly 0.5 x albedo has constant irradiance, so it passes through
    unchanged (weights renormalize) and remodulation restores it."""
    scene = zwrt.models.load_scene("cornell_box")
    aovs = render_aovs(scene, 16, 16, spp=1)
    color = 0.5 * np.maximum(aovs["albedo"], 1e-4).astype(np.float32)
    out = denoise(color, aovs, iterations=3)
    np.testing.assert_allclose(out, color, rtol=3e-3, atol=1e-4)


def test_cli_denoise_flag(tmp_path):
    from zig_weekend_raytracer_tpu.cli import main

    out = str(tmp_path / "dn.png")
    rc = main([
        "--image_width=16", "--image_height=16", "--samples_per_pixel=2",
        "--ray_bounce_max_depth=3", "--scene=cornell_box",
        "--denoise=2", f"--image_out_path={out}",
    ])
    assert rc == 0
    from PIL import Image

    assert np.asarray(Image.open(out)).shape == (16, 16, 3)


def test_texture_detail_survives_demodulation():
    """On an image-textured scene the filter smooths LIGHTING, not texture:
    the denoised image stays far closer to the texture-bearing render than
    a plain (unguided) blur of the same radius would."""
    scene = zwrt.models.load_scene("earth")
    noisy = np.asarray(
        Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
        .render(scene, 32, 32)
    )
    aovs = render_aovs(scene, 32, 32, spp=2)
    dn = denoise(noisy, aovs)
    assert np.isfinite(dn).all() and (dn >= 0).all()
    # plain box blur destroys texture edges; the guided filter must keep
    # per-pixel albedo structure (correlation with the AOV albedo map)
    alb = aovs["albedo"]
    def corr(img):
        a = img.reshape(-1, 3).mean(1) - img.mean()
        b = alb.reshape(-1, 3).mean(1) - alb.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    blur = np.stack([
        sum(np.roll(np.roll(noisy[..., c], dy, 0), dx, 1)
            for dy in range(-2, 3) for dx in range(-2, 3)) / 25.0
        for c in range(3)
    ], -1)
    assert corr(dn) > corr(blur)
