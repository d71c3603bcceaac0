"""In-kernel texture LUT mode (ZWRT_TEX_LUT / --texture_lut, VERDICT r4 #5):
image colors resolve inside the bounce megakernel via lane-shuffle gathers
instead of deferring to the XLA atlas pass.  At a budget >= the native
texel count the LUT texels are bit-identical to the atlas, so renders must
agree with the chain path up to the chain's documented reassociation."""

import os

import numpy as np
import pytest

from zig_weekend_raytracer_tpu.scene import (
    Camera, SceneBuilder, _box_downsample, _build_tex_lut,
)


def _checker_img(h=4, w=4):
    img = np.zeros((h, w, 3), np.uint8)
    img[::2, ::2] = (200, 40, 40)
    img[1::2, 1::2] = (40, 200, 40)
    return img


def _image_scene(nested_checker_child=False):
    b = SceneBuilder()
    img = _checker_img()
    if nested_checker_child:
        tid = b.checkerboard(0.5, b.image_texture(img),
                             b.solid_color((0.2, 0.2, 0.8)))
        m_img = b.lambertian(tid)
    else:
        m_img = b.lambertian(b.image_texture(img))
    m_gray = b.lambertian(b.solid_color((0.6, 0.6, 0.6)))
    b.add(b.quad((-4, -1, -4), (8, 0, 0), (0, 0, 8), m_gray))
    b.add(b.quad((-2, 0, -2), (4, 0, 0), (0, 4, 0), m_img))
    b.add(b.sphere((2.5, 1, 1), 0.8, m_img))
    b.set_background((0.6, 0.7, 0.9))
    b.set_camera(Camera(look_from=(0, 2, 8), look_at=(0, 1, 0)))
    return b


def _compile_lut(builder, budget):
    os.environ["ZWRT_TEX_LUT"] = str(budget)
    try:
        return builder.compile()
    finally:
        del os.environ["ZWRT_TEX_LUT"]


def test_box_downsample_budget_and_identity():
    img = _checker_img(30, 29)
    assert _box_downsample(img, 10_000) is img  # already fits
    ds = _box_downsample(img, 100)
    assert ds.shape[0] * ds.shape[1] <= 100
    assert ds.dtype == np.uint8


def test_build_tex_lut_exact_and_aligned():
    imgs = [_checker_img(4, 4), _checker_img(6, 5)]
    tab, dims = _build_tex_lut(imgs, 10_000)
    tab = np.asarray(tab)
    assert tab.shape[1] == 128 and tab.dtype == np.int32
    for img, (w, h, base) in zip(imgs, dims):
        assert (w, h) == (img.shape[1], img.shape[0])
        assert base % 128 == 0
        packed = (
            img[..., 0].astype(np.uint32)
            | (img[..., 1].astype(np.uint32) << 8)
            | (img[..., 2].astype(np.uint32) << 16)
        ).reshape(-1)
        flat = tab.reshape(-1).astype(np.uint32)
        np.testing.assert_array_equal(flat[base : base + packed.size], packed)


def test_lut_lookup_matches_atlas_at_native():
    """At a native-size budget the LUT fetch must return the identical
    color the atlas path returns, for every (u, v)."""
    import jax.numpy as jnp

    from zig_weekend_raytracer_tpu.textures import atlas_lookup, lut_lookup

    scene = _compile_lut(_image_scene(), 10_000).compiled
    assert scene.tex_lut_dims
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(256).astype(np.float32))
    v = jnp.asarray(rng.rand(256).astype(np.float32))
    img_id = jnp.zeros((256,), jnp.int32)
    a = atlas_lookup(scene, img_id, u, v)
    l = lut_lookup(scene, img_id, u, v)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(l.x))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(l.y))
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(l.z))


def test_lut_scene_flags_and_fused_support():
    from zig_weekend_raytracer_tpu.ops.pallas_bounce import (
        supports_fused_render,
    )

    plain = _image_scene().compile().compiled
    assert plain.has_image_textures and not plain.tex_lut_dims
    assert not supports_fused_render(plain)

    lut = _compile_lut(_image_scene(), 10_000).compiled
    assert lut.has_image_textures and lut.tex_lut_dims
    assert supports_fused_render(lut)
    assert lut.tex_lut_tab is not None


def test_lut_render_matches_chain_exact_budget(pallas_interpret):
    """Native-size budget: the fused LUT render agrees with the deferred
    atlas-chain render (identical texels; only reassociation differs)."""
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=5, seed=0)
    fb_chain = r.render(_image_scene().compile(), 16, 16)
    fb_lut = r.render(_compile_lut(_image_scene(), 10_000), 16, 16)
    assert np.isfinite(fb_lut).all()
    np.testing.assert_allclose(fb_lut, fb_chain, rtol=3e-5, atol=3e-6)


def test_lut_render_checker_of_image(pallas_interpret):
    """Checker-of-image textures resolve their parity-selected image
    child through the LUT too (_C_IMG2 path)."""
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
    fb_chain = r.render(_image_scene(nested_checker_child=True).compile(),
                        12, 12)
    fb_lut = r.render(
        _compile_lut(_image_scene(nested_checker_child=True), 10_000),
        12, 12,
    )
    np.testing.assert_allclose(fb_lut, fb_chain, rtol=3e-5, atol=3e-6)


def test_lut_render_downsampled_close(pallas_interpret):
    """A sub-native budget renders an approximation: finite, same scale,
    and within a loose image tolerance of the exact render."""
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
    fb_ref = r.render(_image_scene().compile(), 12, 12)
    fb_lut = r.render(_compile_lut(_image_scene(), 8), 12, 12)
    assert np.isfinite(fb_lut).all()
    assert abs(float(fb_lut.mean()) - float(fb_ref.mean())) < 0.1


def test_lut_render_tree_scene(pallas_interpret):
    """Tree + image scene (the atlas-chain regime, rtw-class): the LUT
    path must agree with the chain path there too."""
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    def build():
        rng = np.random.default_rng(7)
        b = SceneBuilder()
        m_img = b.lambertian(b.image_texture(_checker_img()))
        m_gray = b.lambertian(b.solid_color((0.6, 0.6, 0.6)))
        b.add(b.sphere((-3, 0, 0), 3.0, m_img))
        for _ in range(80):
            b.add(b.sphere(rng.uniform(-12, 12, 3),
                           rng.uniform(0.3, 1.0), m_gray))
        b.use_bvh(True, min_prims=2)
        b.set_camera(Camera(look_from=(0, 0, 25), look_at=(0, 0, 0)))
        b.set_background((0.7, 0.8, 1.0))
        return b

    r = Renderer(samples_per_pixel=2, max_ray_bounce_depth=4, seed=0)
    fb_chain = r.render(build().compile(), 12, 12)
    fb_lut = r.render(_compile_lut(build(), 10_000), 12, 12)
    np.testing.assert_allclose(fb_lut, fb_chain, rtol=3e-5, atol=3e-6)


def test_lut_emissive_image_in_kernel(pallas_interpret):
    """Image-textured EMISSIVE materials force the XLA integrator on the
    chain path (atlas emission needs in-kernel texture access); the LUT
    provides it, so the gate lifts and the kernel render must match the
    XLA integrator."""
    from zig_weekend_raytracer_tpu.ops.pallas_bounce import (
        supports_bounce_kernel, supports_fused_render,
    )
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    def build():
        b = SceneBuilder()
        m_lamp = b.diffuse_light(b.image_texture(_checker_img()))
        m_gray = b.lambertian(b.solid_color((0.6, 0.6, 0.6)))
        b.add(b.quad((-4, -1, -4), (8, 0, 0), (0, 0, 8), m_gray))
        b.add(b.quad((-2, 0, -2), (4, 0, 0), (0, 4, 0), m_lamp))
        b.set_background((0.0, 0.0, 0.0))
        b.set_camera(Camera(look_from=(0, 2, 8), look_at=(0, 1, 0)))
        return b

    plain = build().compile().compiled
    assert plain.has_emissive_image and not supports_bounce_kernel(plain)

    lut_scene = _compile_lut(build(), 10_000)
    assert supports_bounce_kernel(lut_scene.compiled)
    assert supports_fused_render(lut_scene.compiled)

    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
    fb_kernel = r.render(lut_scene, 12, 12)

    os.environ["ZWRT_NO_PALLAS"] = "1"
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    _use_pallas_backend.cache_clear()
    try:
        fb_ref = r.render(lut_scene, 12, 12)
    finally:
        del os.environ["ZWRT_NO_PALLAS"]
        _use_pallas_backend.cache_clear()
    assert float(fb_kernel.max()) > 0.05  # the lamp is visible
    np.testing.assert_allclose(fb_kernel, fb_ref, rtol=3e-5, atol=3e-6)


def test_lut_scene_sharded_matches_single(pallas_interpret):
    """LUT scenes ride the fused megakernel inside shard_map unchanged:
    a 2-device sharded render equals the single-device render."""
    import jax

    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs the multi-device CPU mesh (conftest)")
    from zig_weekend_raytracer_tpu.parallel import make_mesh, render_sharded
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    scene = _compile_lut(_image_scene(), 10_000)
    r = Renderer(samples_per_pixel=4, max_ray_bounce_depth=4, seed=0)
    single = r.render(scene, 16, 16)
    mesh = make_mesh(2)
    fb = np.asarray(render_sharded(
        scene, 16, 16, 4, mesh=mesh, shard="samples", max_depth=4, seed=0,
    ))
    np.testing.assert_allclose(fb, single, rtol=3e-5, atol=3e-6)


def test_lut_scene_adaptive_composes(pallas_interpret):
    """Adaptive sampling on a LUT scene (round-5 composition): image
    scenes under --texture_lut run the fused megakernel, so the adaptive
    balanced-plan pass works too — single-device and sharded, exact
    budget conservation, mean in family with the uniform LUT render."""
    from zig_weekend_raytracer_tpu.parallel import (
        make_mesh, render_adaptive_sharded,
    )
    from zig_weekend_raytracer_tpu.render.renderer import Renderer

    scene = _compile_lut(_image_scene(), 10_000)
    r = Renderer(samples_per_pixel=16, max_ray_bounce_depth=4, seed=0)
    uniform = np.asarray(r.render(scene, 12, 12))
    fb, st = r.render_adaptive(scene, 12, 12, pilot_spp=4,
                               return_stats=True)
    fb = np.asarray(fb)
    assert st["n_samples"].sum() == 16 * 12 * 12
    assert np.isfinite(fb).all()
    assert abs(fb.mean() - uniform.mean()) < 0.1 * uniform.mean()

    fbs, sts = render_adaptive_sharded(
        scene, 12, 12, 16, max_depth=4, mesh=make_mesh(2), shard="samples",
        seed=0, pilot_spp=4, return_stats=True,
    )
    np.testing.assert_array_equal(sts["n_samples"], st["n_samples"])
    np.testing.assert_allclose(np.asarray(fbs), fb, rtol=1e-4, atol=1e-5)
