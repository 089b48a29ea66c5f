"""Gradient correctness: autodiff vs central finite differences.

BASELINE acceptance: "pixel + scene-param grads allclose vs finite
differences" (SURVEY.md §4 item 3).  Discrete path structure (which sphere,
hit/miss, reflect/refract) is piecewise constant, so AD matches FD for
*interior* regions; visibility/silhouette terms are out of scope by design
(SURVEY.md §7).  Geometry-parameter tests therefore probe an interior
pixel window; material-parameter tests use the whole-image loss (geometry
unchanged -> no silhouette term).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.core.camera import Camera
from bevy_raytrace_tpu.scenes import (
    baseline_config1_camera,
    baseline_config1_scene,
    baseline_config2_camera,
    baseline_config2_scene,
)
from bevy_raytrace_tpu.wavefront.render import render

CFG = RenderConfig(width=32, height=24, samples_per_pixel=8, max_depth=4)

# Central 6x4 pixel window: interior of the big sphere in config1/2.
WIN = (slice(10, 14), slice(13, 19))


def _window_loss_fn(make_scene_fn, cam, cfg=CFG):
    def loss(theta):
        img = render(make_scene_fn(theta), cam, cfg)
        return jnp.mean(img[WIN[0], WIN[1], :])

    return jax.jit(loss)


def _fd_check(loss, theta0, eps, rtol, atol=1e-4):
    """Central finite difference of a scalar->scalar loss vs autodiff."""
    g_ad = float(jax.grad(loss)(jnp.float32(theta0)))
    lp = float(loss(jnp.float32(theta0 + eps)))
    lm = float(loss(jnp.float32(theta0 - eps)))
    g_fd = (lp - lm) / (2 * eps)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol), (g_ad, g_fd)
    return g_ad, g_fd


def test_albedo_gradient_full_image():
    """Albedo enters multiplicatively -> whole-image loss FD is clean."""
    scene0, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)

    def make(theta):
        mats = dataclasses.replace(
            scene0.materials,
            albedo=scene0.materials.albedo.at[1, 0].set(theta),
        )
        return dataclasses.replace(scene0, materials=mats)

    loss = jax.jit(
        lambda th: jnp.mean(render(make(th), cam, CFG))
    )
    g_ad, g_fd = _fd_check(loss, 0.7, eps=1e-2, rtol=2e-2)
    assert g_ad > 0  # brighter ball -> brighter image


def test_sphere_center_gradient_interior():
    scene0, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)

    def make(theta):
        return dataclasses.replace(
            scene0, centers=scene0.centers.at[1, 2].set(theta)
        )

    loss = _window_loss_fn(make, cam)
    _fd_check(loss, -1.0, eps=2e-3, rtol=5e-2, atol=2e-3)


def test_sphere_radius_gradient_interior():
    scene0, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)

    def make(theta):
        return dataclasses.replace(scene0, radii=scene0.radii.at[1].set(theta))

    loss = _window_loss_fn(make, cam)
    _fd_check(loss, 0.5, eps=2e-3, rtol=5e-2, atol=2e-3)


def test_camera_position_gradient_interior():
    scene0, _ = baseline_config1_scene()

    def make_loss():
        def loss(theta):
            cam = Camera.look_at(
                lookfrom=(theta, 0.0, 0.0),
                lookat=(0.0, 0.0, -1.0),
                vfov_deg=90.0,
                aspect=CFG.aspect,
                focus_dist=1.0,
            )
            img = render(scene0, cam, CFG)
            return jnp.mean(img[WIN[0], WIN[1], :])

        return jax.jit(loss)

    # eps must be small enough that no secondary-bounce branch flips land
    # inside [-eps, eps] (at 2e-3 the FD visibly picks up jump terms; at
    # 5e-4 it converges onto AD — measured in this exact config).
    _fd_check(make_loss(), 0.0, eps=5e-4, rtol=5e-2, atol=2e-4)


def _single_sphere_scene(kind, fuzz=0.0, ior=1.5):
    """One sphere of the given material, sky illumination only — no other
    geometry means no secondary silhouettes, so the smooth gradient term
    dominates and FD can resolve it."""
    from bevy_raytrace_tpu.core.types import make_scene

    return make_scene(
        centers=np.array([[0.0, 0.0, -2.0]], np.float32),
        radii=np.array([1.0], np.float32),
        material_id=np.array([0], np.int32),
        albedo=np.array([[0.9, 0.9, 0.9]], np.float32),
        kind=np.array([kind], np.int32),
        fuzz=np.array([fuzz], np.float32),
        ior=np.array([ior], np.float32),
    )


def test_metal_fuzz_gradient():
    """Fuzz rotates the reflected direction; against the smooth sky
    gradient the radiance derivative is smooth at interior pixels."""
    from bevy_raytrace_tpu.core.types import METALLIC

    cam = baseline_config1_camera(CFG.aspect)

    def make(theta):
        s = _single_sphere_scene(METALLIC)
        return dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, fuzz=jnp.full((1,), theta))
        )

    loss = _window_loss_fn(make, cam, CFG.replace(max_depth=2))
    _fd_check(loss, 0.3, eps=2e-3, rtol=5e-2, atol=2e-4)


def test_dielectric_ior_gradient():
    """IOR moves refraction angles smoothly; single glass sphere against
    the sky, interior window, small eps to stay clear of schlick branch
    flips."""
    from bevy_raytrace_tpu.core.types import DIELECTRIC

    cam = baseline_config1_camera(CFG.aspect)

    def make(theta):
        s = _single_sphere_scene(DIELECTRIC)
        return dataclasses.replace(
            s, materials=dataclasses.replace(s.materials, ior=jnp.full((1,), theta))
        )

    loss = _window_loss_fn(make, cam, CFG.replace(max_depth=3))
    _fd_check(loss, 1.5, eps=1e-3, rtol=1e-1, atol=5e-4)


def test_full_scene_pytree_gradient_finite():
    """grad w.r.t. every scene leaf at once: finite, right shapes, nonzero."""
    scene0, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)

    def loss(scene):
        return jnp.mean(render(scene, cam, CFG))

    g = jax.jit(jax.grad(loss, allow_int=True))(scene0)
    for leaf, ref in [
        (g.centers, scene0.centers),
        (g.radii, scene0.radii),
        (g.materials.albedo, scene0.materials.albedo),
        (g.materials.fuzz, scene0.materials.fuzz),
        (g.materials.ior, scene0.materials.ior),
    ]:
        assert leaf.shape == ref.shape
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(g.materials.albedo)).max() > 1e-4
    assert np.abs(np.asarray(g.centers)).max() > 1e-4
    # int leaves carry no gradient (float0 tangent space)
    assert g.material_id.dtype == jax.dtypes.float0


def test_gradient_deterministic():
    scene0, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    loss = jax.jit(lambda s: jnp.mean(render(s, cam, CFG)))
    g1 = jax.grad(loss, allow_int=True)(scene0)
    g2 = jax.grad(loss, allow_int=True)(scene0)
    np.testing.assert_array_equal(
        np.asarray(g1.centers), np.asarray(g2.centers)
    )
