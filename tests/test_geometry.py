"""Ray-sphere intersection unit tests against hand-computed cases,
mirroring `intersect.wgsl:94-143` behavior (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from bevy_raytrace_tpu.core.geometry import intersect_scene
from bevy_raytrace_tpu.core.types import Ray, make_scene

T_MIN, T_MAX = 1e-3, 1e20


def _scene(centers, radii, mats=None):
    n = len(radii)
    mats = mats if mats is not None else np.zeros(n, np.int32)
    return make_scene(
        centers, radii, mats,
        albedo=np.ones((max(np.max(mats) + 1, 1), 3), np.float32),
        kind=np.zeros(max(np.max(mats) + 1, 1), np.int32),
        fuzz=np.zeros(max(np.max(mats) + 1, 1), np.float32),
        ior=np.ones(max(np.max(mats) + 1, 1), np.float32),
    )


def _shoot(scene, origins, dirs):
    r = Ray(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))
    return intersect_scene(r, scene, T_MIN, T_MAX)


def test_head_on_hit():
    s = _scene([[0, 0, -2]], [0.5])
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h.point)[0], [0, 0, -1.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal)[0], [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_miss():
    s = _scene([[0, 0, -2]], [0.5])
    h = _shoot(s, [[0, 0, 0]], [[0, 1, 0]])
    assert not bool(h.hit[0])
    assert float(h.t[0]) == float(np.float32(T_MAX))


def test_inside_sphere_back_face():
    """Origin inside the sphere: near root is behind t_min -> far root,
    front_face false, normal flipped inward (intersect.wgsl:108-127)."""
    s = _scene([[0, 0, 0]], [1.0])
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-6)
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(np.asarray(h.normal)[0], [0, 0, 1], atol=1e-6)


def test_negative_radius_flips_normal():
    """RTiOW hollow-glass trick: negative radius -> inward outward-normal,
    so a ray from outside sees front_face False."""
    s = _scene([[0, 0, -2]], [-0.5])
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    assert bool(h.hit[0])
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(np.asarray(h.normal)[0], [0, 0, 1], atol=1e-6)


def test_nearest_of_two():
    s = _scene([[0, 0, -5], [0, 0, -2]], [0.5, 0.5], np.array([0, 0], np.int32))
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)
    assert int(h.material[0]) == 0


def test_material_id_carried():
    s = _scene([[0, 0, -5], [0, 0, -2]], [0.5, 0.5], np.array([1, 2], np.int32))
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    assert int(h.material[0]) == 2


def test_t_min_clipping():
    """A hit closer than t_min is rejected (shadow-acne epsilon,
    EPSILON=0.001 in every reference shader)."""
    s = _scene([[0, 0, -1]], [1.0])
    # Origin on the sphere surface pointing away: near root ~0, far < 0.
    h = _shoot(s, [[0, 0, 0]], [[0, 0, 1]])
    assert not bool(h.hit[0])


def test_tangent_ray_misses():
    """disc == 0 grazing ray: reference requires disc > 0 (intersect.wgsl:103)."""
    s = _scene([[0, 1, -2]], [1.0])
    h = _shoot(s, [[0, 0, 0]], [[0, 0, -1]])
    # Tangent: disc == 0 exactly in exact math; in f32 this is borderline,
    # just require no NaN and a consistent mask/t.
    t = float(h.t[0])
    assert np.isfinite(t)
    assert bool(h.hit[0]) == (t < T_MAX)


def test_oblique_hit_against_quadratic():
    rng = np.random.default_rng(0)
    center = np.array([0.3, -0.2, -3.0])
    radius = 0.7
    s = _scene([center], [radius])
    o = np.array([0.1, 0.2, 0.5])
    d = np.array([-0.05, -0.1, -1.0])
    d = d / np.linalg.norm(d)
    h = _shoot(s, [o], [d])
    oc = o - center
    a = d @ d
    hb = oc @ d
    c = oc @ oc - radius**2
    t_expect = (-hb - np.sqrt(hb * hb - a * c)) / a
    np.testing.assert_allclose(float(h.t[0]), t_expect, rtol=1e-5)
    p = o + t_expect * d
    np.testing.assert_allclose(np.asarray(h.point)[0], p, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h.normal)[0], (p - center) / radius, atol=1e-5
    )
    del rng


def test_batched_rays():
    s = _scene([[0, 0, -2]], [0.5])
    h = _shoot(s, [[0, 0, 0], [10, 0, 0]], [[0, 0, -1], [0, 0, -1]])
    assert bool(h.hit[0]) and not bool(h.hit[1])


def test_gather_rows_transpose_matches_scatter_add():
    """gather_rows' one-hot-matmul VJP (3 exact bf16 limbs) must produce
    the same table cotangents as the native scatter-add transpose up to
    f32 summation order (a plain f32 dot at default TPU matmul precision
    would instead round every cotangent to bf16)."""
    import jax
    import jax.numpy as jnp

    from bevy_raytrace_tpu.core.geometry import gather_rows

    rng = np.random.default_rng(3)
    tbl = jnp.asarray(rng.standard_normal((37, 11)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, size=4096), jnp.int32)
    w = jnp.asarray(rng.standard_normal((4096, 11)), jnp.float32)

    g_fused = jax.grad(lambda t: jnp.sum(gather_rows(t, idx) * w))(tbl)
    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * w))(tbl)
    # Products are exact; only the f32 SUM order differs between the
    # matmul reduction tree and the scatter-add (measured ~8e-6 abs on
    # ~110 unit-scale contributions/row).  A bf16-rounded transpose (the
    # bug this guards against) errs at ~4e-3 relative — 3 orders larger.
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=3e-5, atol=3e-5)


def test_gather_rows_chunked_transpose_matches_unchunked():
    """The one-hot transpose's chunk budget (BRT_ONEHOT_CHUNK_MB /
    set_onehot_chunk_mb, r5 config hook) changes only the f32 summation
    grouping: cotangents must match the unchunked result to tolerance,
    and the hook must validate its argument."""
    import jax
    import pytest as _pytest

    from bevy_raytrace_tpu.core import geometry
    from bevy_raytrace_tpu.core.geometry import gather_rows, set_onehot_chunk_mb

    rng = np.random.default_rng(3)
    tbl = jnp.asarray(rng.normal(size=(13, 11)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 13, size=4096).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(4096, 11)).astype(np.float32))

    def g():
        return jax.grad(lambda t: jnp.sum(gather_rows(t, idx) * w))(tbl)

    saved = geometry._ONEHOT_ELEMS
    try:
        g_big = np.asarray(g())
        geometry._ONEHOT_ELEMS = 13 * 128  # force many chunks
        g_small = np.asarray(g())
    finally:
        geometry._ONEHOT_ELEMS = saved
    # chunking only regroups the f32 accumulation
    np.testing.assert_allclose(g_small, g_big, rtol=1e-5, atol=1e-5)

    set_onehot_chunk_mb(64)
    assert geometry._ONEHOT_ELEMS == 64 * 1024 * 1024 // 2
    geometry._ONEHOT_ELEMS = saved
    with _pytest.raises(ValueError, match="positive"):
        set_onehot_chunk_mb(0)
