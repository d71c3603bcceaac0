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


def _flat_aovs(h, w):
    """Synthetic AOVs for a flat fronto-parallel wall: constant albedo,
    constant normal, constant depth."""
    return {
        "albedo": np.full((h, w, 3), 0.6, np.float32),
        "normal": np.tile(np.array([0.0, 0.0, 1.0], np.float32), (h, w, 1)),
        "depth": np.full((h, w), 3.0, np.float32),
    }


def test_noise_estimator_recovers_sigma():
    """estimate_noise_sigma recovers the true iid noise level on a flat
    synthetic image within 20% (the Immerkaer/median constants are exact
    for Gaussian noise), and scales linearly with it.  The estimator
    works in LUMINANCE: for iid per-channel noise of sigma the luminance
    sigma is sigma * sqrt(sum(w_c^2)) ~ 0.75 * sigma."""
    from zig_weekend_raytracer_tpu.dtypes import LUM_B, LUM_G, LUM_R
    from zig_weekend_raytracer_tpu.render.denoise import estimate_noise_sigma

    lum_factor = float(np.sqrt(LUM_R**2 + LUM_G**2 + LUM_B**2))
    rng = np.random.default_rng(0)
    h = w = 64
    aovs = _flat_aovs(h, w)
    base = 0.3 * np.ones((h, w, 3), np.float32)
    for sigma in (0.02, 0.1):
        # noise in DEMODULATED space is sigma/albedo; multiply back
        noisy = base + 0.6 * sigma * rng.standard_normal((h, w, 3)).astype(
            np.float32
        )
        est = estimate_noise_sigma(noisy, aovs)
        expect = sigma * lum_factor
        assert 0.8 * expect < est < 1.2 * expect, (sigma, est, expect)


def test_noise_estimator_ignores_aov_edges():
    """A hard material edge (albedo step) must NOT read as noise: the
    estimator masks pixels near AOV discontinuities, so a clean two-tone
    image estimates ~zero while the unmasked high-pass response there is
    huge."""
    from zig_weekend_raytracer_tpu.render.denoise import estimate_noise_sigma

    h = w = 64
    aovs = _flat_aovs(h, w)
    img = np.full((h, w, 3), 0.2, np.float32)
    img[:, w // 2:] = 0.9
    aovs["albedo"][:, w // 2:] = 0.9  # the step is a material edge
    est = estimate_noise_sigma(img, aovs)
    assert est < 1e-5, est


def test_auto_sigma_backs_off_on_clean_input():
    """The auto luminance stop scales with measured noise: a near-clean
    framebuffer must be filtered far more gently than a noisy one
    (this is the balls@32 production-resolution regression fix)."""
    from zig_weekend_raytracer_tpu.render.denoise import denoise

    rng = np.random.default_rng(1)
    h = w = 64
    aovs = _flat_aovs(h, w)
    # structured lighting detail on a flat wall (smooth gradient + spot)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    detail = 0.3 + 0.2 * np.sin(xx / 6.0) * np.cos(yy / 7.0)
    clean = np.repeat(detail[..., None], 3, -1).astype(np.float32) * 0.6
    tiny = clean + 0.002 * rng.standard_normal(clean.shape).astype(np.float32)
    loud = clean + 0.10 * rng.standard_normal(clean.shape).astype(np.float32)
    dn_tiny = denoise(tiny, aovs)
    dn_loud = denoise(loud, aovs)
    # near-clean input: auto must beat the old fixed default by a wide
    # margin (the fixed stop flattens the shading detail) and keep the
    # detail structure near-perfectly
    dn_fixed = denoise(tiny, aovs, sigma_l=1.0)
    assert (
        ((dn_tiny - clean) ** 2).mean()
        < 0.2 * ((dn_fixed - clean) ** 2).mean()
    )
    keep = np.corrcoef(dn_tiny.mean(-1).ravel(), detail.ravel())[0, 1]
    assert keep > 0.98, keep
    # noisy input: the filter must still actually denoise
    assert ((dn_loud - clean) ** 2).mean() < 0.5 * ((loud - clean) ** 2).mean()
