"""Scatter-model unit tests vs closed forms (`shade.wgsl:118-197`,
SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from bevy_raytrace_tpu.core.materials import (
    reflect,
    refract,
    scatter,
    schlick,
    sky_color,
)
from bevy_raytrace_tpu.core.types import DIELECTRIC, LAMBERTIAN, METALLIC


def _as(v):
    return jnp.asarray(v, jnp.float32)


def test_sky_endpoints():
    up = sky_color(_as([[0.0, 1.0, 0.0]]))
    down = sky_color(_as([[0.0, -1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(up)[0], [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(down)[0], [1.0, 1.0, 1.0], atol=1e-6)


def test_reflect_closed_form():
    v = _as([[1.0, -1.0, 0.0]])
    n = _as([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(reflect(v, n))[0], [1, 1, 0], atol=1e-6)


def test_refract_snell():
    """Check Snell's law: n1 sin(theta1) = n2 sin(theta2)."""
    theta1 = 0.5
    v = _as([[np.sin(theta1), -np.cos(theta1), 0.0]])
    n = _as([[0.0, 1.0, 0.0]])
    ratio = jnp.float32(1.0 / 1.5)
    cos_t = jnp.minimum(jnp.sum(-v * n, axis=-1), 1.0)
    out = np.asarray(refract(v, n, jnp.full((1,), ratio), cos_t))[0]
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)
    sin_theta2 = out[0]  # x component = sin of refracted angle
    np.testing.assert_allclose(sin_theta2, np.sin(theta1) / 1.5, atol=1e-5)
    assert out[1] < 0  # continues downward


def test_schlick_values():
    # Normal incidence: r0 = ((1-r)/(1+r))^2.
    r = 1.5
    np.testing.assert_allclose(
        float(schlick(jnp.float32(1.0), jnp.float32(1 / r))),
        ((1 - 1 / r) / (1 + 1 / r)) ** 2,
        rtol=1e-5,
    )
    # Grazing incidence -> 1.
    np.testing.assert_allclose(
        float(schlick(jnp.float32(0.0), jnp.float32(1 / r))), 1.0, rtol=1e-6
    )


def _scatter_one(kind, unit_dir, normal, front_face=True, albedo=(0.8, 0.6, 0.4),
                 fuzz=0.0, ior=1.5, u=(0.3, 0.6, 0.2, 0.9)):
    new_dir, atten, ok = scatter(
        _as([unit_dir]),
        _as([normal]),
        jnp.asarray([front_face]),
        _as([albedo]),
        jnp.asarray([kind], jnp.int32),
        _as([fuzz]),
        _as([ior]),
        tuple(jnp.full((1,), x, jnp.float32) for x in u),
    )
    return np.asarray(new_dir)[0], np.asarray(atten)[0], bool(np.asarray(ok)[0])


def test_lambertian_scatter():
    d, a, ok = _scatter_one(LAMBERTIAN, [0, 0, -1], [0, 0, 1])
    assert ok
    np.testing.assert_allclose(a, [0.8, 0.6, 0.4], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    # normal + unit vector always lands in the normal hemisphere or on it.
    assert d @ np.array([0, 0, 1.0]) > -1e-5


def test_metal_mirror_when_fuzz_zero():
    incident = np.array([1.0, -1.0, 0.0])
    incident /= np.linalg.norm(incident)
    d, a, ok = _scatter_one(METALLIC, incident, [0, 1, 0], fuzz=0.0)
    assert ok
    expect = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    np.testing.assert_allclose(d, expect, atol=1e-5)
    np.testing.assert_allclose(a, [0.8, 0.6, 0.4], atol=1e-6)


def test_metal_absorbed_below_horizon():
    """Strong fuzz can push the scattered ray below the surface; RTiOW
    absorbs it (the reference omits this check — corrected per SURVEY §7)."""
    incident = np.array([1.0, -0.02, 0.0])
    incident /= np.linalg.norm(incident)
    # Grazing reflection + large fuzz pointing down (u chosen so the unit
    # vector has strongly negative y: z=1-2*u1 with u1=0.5 -> z=0,
    # phi=1.5pi -> (0,-1,0)).
    d, a, ok = _scatter_one(
        METALLIC, incident, [0, 1, 0], fuzz=1.0, u=(0.5, 0.75, 1.0, 0.5)
    )
    assert not ok


def test_dielectric_refracts_at_normal_incidence():
    d, a, ok = _scatter_one(
        DIELECTRIC, [0, 0, -1], [0, 0, 1], ior=1.5, u=(0.1, 0.1, 0.1, 0.99)
    )
    assert ok
    np.testing.assert_allclose(a, [1, 1, 1], atol=1e-6)  # attenuation 1
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)  # straight through


def test_dielectric_total_internal_reflection():
    """Exit at a grazing angle from inside glass: ratio*sin > 1 -> reflect
    (shade.wgsl:165-170)."""
    theta = np.deg2rad(60.0)  # > critical angle asin(1/1.5) ~ 41.8 deg
    incident = np.array([np.sin(theta), -np.cos(theta), 0.0])
    d, a, ok = _scatter_one(
        DIELECTRIC, incident, [0, 1, 0], front_face=False, ior=1.5,
        u=(0.1, 0.1, 0.1, 0.0),  # u4=0: schlick>u4 would also reflect; TIR
    )
    expect = np.array([np.sin(theta), np.cos(theta), 0.0])
    np.testing.assert_allclose(d, expect, atol=1e-5)


def test_dielectric_schlick_probabilistic_reflection():
    """With u4 below the fresnel probability the ray reflects even when
    refraction is possible."""
    theta = np.deg2rad(80.0)  # near grazing from outside: schlick ~ large
    incident = np.array([np.sin(theta), -np.cos(theta), 0.0])
    d_reflect, _, _ = _scatter_one(
        DIELECTRIC, incident, [0, 1, 0], ior=1.5, u=(0.1, 0.1, 0.1, 0.0)
    )
    d_refract, _, _ = _scatter_one(
        DIELECTRIC, incident, [0, 1, 0], ior=1.5, u=(0.1, 0.1, 0.1, 0.9999)
    )
    np.testing.assert_allclose(
        d_reflect, [np.sin(theta), np.cos(theta), 0.0], atol=1e-5
    )
    assert d_refract[1] < 0  # transmitted


def test_kind_selection_vectorized():
    """One call, three lanes, three different materials."""
    incident = np.array([0.0, -1.0, 0.0])
    new_dir, atten, ok = scatter(
        _as([incident] * 3),
        _as([[0, 1, 0]] * 3),
        jnp.asarray([True] * 3),
        _as([[0.5, 0.5, 0.5]] * 3),
        jnp.asarray([LAMBERTIAN, METALLIC, DIELECTRIC], jnp.int32),
        _as([0.0] * 3),
        _as([1.5] * 3),
        tuple(jnp.full((3,), x, jnp.float32) for x in (0.3, 0.6, 0.2, 0.99)),
    )
    atten = np.asarray(atten)
    np.testing.assert_allclose(atten[0], [0.5] * 3)
    np.testing.assert_allclose(atten[1], [0.5] * 3)
    np.testing.assert_allclose(atten[2], [1.0] * 3)  # dielectric attenuates 1
    d = np.asarray(new_dir)
    np.testing.assert_allclose(d[1], [0, 1, 0], atol=1e-5)  # mirror
    np.testing.assert_allclose(d[2], [0, -1, 0], atol=1e-5)  # straight through
