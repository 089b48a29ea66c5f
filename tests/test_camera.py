"""Camera unit tests: pinhole directions for known pixels, thin-lens focus
geometry, and the reference-parametrization constructor
(SURVEY.md §4 item 1: 'camera ray directions for known pixels vs
generate.wgsl:66-83')."""

import numpy as np
import jax.numpy as jnp

from bevy_raytrace_tpu.core.camera import Camera


def _rays(cam, s, t, lu1=None, lu2=None):
    s = jnp.asarray(s, jnp.float32).reshape(-1)
    t = jnp.asarray(t, jnp.float32).reshape(-1)
    z = jnp.zeros_like(s)
    return cam.generate_rays(s, t, lu1 if lu1 is not None else z,
                             lu2 if lu2 is not None else z)


def test_center_pixel_points_forward():
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_deg=90.0, aspect=2.0)
    r = _rays(cam, [0.5], [0.5])
    np.testing.assert_allclose(np.asarray(r.dir)[0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.origin)[0], [0, 0, 0], atol=1e-6)


def test_corner_pixel_fov():
    # vfov 90 deg, aspect 2: at s=1,t=1 the direction is
    # (half_w, half_h, -1) = (2, 1, -1) normalized.
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_deg=90.0, aspect=2.0,
                         focus_dist=1.0)
    r = _rays(cam, [1.0], [1.0])
    expect = np.array([2.0, 1.0, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(r.dir)[0], expect, atol=1e-6)


def test_vertical_flip_convention():
    # t=1 is the top of the image (+v side), t=0 the bottom.
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_deg=90.0, aspect=1.0)
    top = np.asarray(_rays(cam, [0.5], [1.0]).dir)[0]
    bot = np.asarray(_rays(cam, [0.5], [0.0]).dir)[0]
    assert top[1] > 0 > bot[1]


def test_look_at_basis_orthonormal():
    cam = Camera.look_at((13, 2, 3), (0, 0, 0), vfov_deg=20.0, aspect=1.5)
    u, v, w = (np.asarray(x) for x in (cam.u, cam.v, cam.w))
    for a in (u, v, w):
        np.testing.assert_allclose(np.linalg.norm(a), 1.0, atol=1e-6)
    assert abs(u @ v) < 1e-6 and abs(u @ w) < 1e-6 and abs(v @ w) < 1e-6
    np.testing.assert_allclose(np.cross(u, v), w, atol=1e-6)  # right-handed
    # w points from lookat to lookfrom (backward).
    np.testing.assert_allclose(w, np.array([13, 2, 3]) / np.linalg.norm([13, 2, 3]),
                               atol=1e-6)


def test_thin_lens_rays_converge_at_focus_plane():
    """Any two rays of the same pixel through different lens points must
    meet at the focus-plane point (defocus blur geometry — live here,
    inert in the reference, generate.wgsl:121)."""
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_deg=60.0, aspect=1.0,
                         aperture=0.5, focus_dist=3.0)
    r1 = _rays(cam, [0.3], [0.7], jnp.array([0.9]), jnp.array([0.1]))
    r2 = _rays(cam, [0.3], [0.7], jnp.array([0.2]), jnp.array([0.8]))
    # March each ray to z = -3 (the focus plane) and compare hit points.
    p = []
    for r in (r1, r2):
        o, d = np.asarray(r.origin)[0], np.asarray(r.dir)[0]
        tt = (-3.0 - o[2]) / d[2]
        p.append(o + tt * d)
    np.testing.assert_allclose(p[0], p[1], atol=1e-5)
    # Origins actually differ (the lens is sampled).
    assert np.linalg.norm(np.asarray(r1.origin) - np.asarray(r2.origin)) > 1e-3


def test_pinhole_origin_fixed():
    cam = Camera.look_at((1, 2, 3), (0, 0, 0), vfov_deg=45.0, aspect=1.0,
                         aperture=0.0)
    r = _rays(cam, [0.1, 0.9], [0.2, 0.8], jnp.array([0.7, 0.3]),
              jnp.array([0.4, 0.6]))
    np.testing.assert_allclose(np.asarray(r.origin),
                               np.broadcast_to([1, 2, 3], (2, 3)), atol=1e-6)


def test_from_transform_matches_reference_lens_math():
    """Focus plane by the lens equation (d*f)/(d-f) and aperture radius
    f/(2*fstop) — generate.wgsl:96-101; defaults from
    ray_trace_camera.rs:53-63."""
    cam = Camera.from_transform(np.eye(4, dtype=np.float32),
                                fov=1.5708, aspect=16 / 9,
                                image_plane_distance=10.0,
                                lens_focal_length=0.1, fstop=1 / 32)
    np.testing.assert_allclose(float(cam.focus_dist), (10.0 * 0.1) / (10.0 - 0.1),
                               rtol=1e-6)
    np.testing.assert_allclose(float(cam.lens_radius), 0.1 / (2.0 * (1 / 32)),
                               rtol=1e-6)
    # Identity transform: -Z forward.
    r = _rays(cam, [0.5], [0.5])
    np.testing.assert_allclose(np.asarray(r.dir)[0], [0, 0, -1], atol=1e-6)
    # Width-referenced fov: half_width = tan(fov/2) ~ 1 for 90 deg.
    np.testing.assert_allclose(float(cam.half_width), np.tan(1.5708 / 2), rtol=1e-6)
    np.testing.assert_allclose(float(cam.half_height),
                               np.tan(1.5708 / 2) / (16 / 9), rtol=1e-6)
