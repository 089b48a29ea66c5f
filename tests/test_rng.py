"""RNG tests: determinism, range, decorrelation, sampler geometry.

SURVEY.md §4 test pyramid, unit layer; also covers the RNG-reparameterization
contract (draws are pure functions of (pixel, sample, stream, seed), SURVEY.md
§7 "hard parts").
"""

import numpy as np
import jax.numpy as jnp

from bevy_raytrace_tpu.rng.pcg import (
    pcg4d,
    random_in_unit_disk,
    random_in_unit_sphere,
    random_unit_vector,
    uniform4,
)

N = 4096
IDS = np.arange(N, dtype=np.uint32)


def test_uniform4_range_and_determinism():
    us = uniform4(IDS, 0, 0, 123)
    vs = uniform4(IDS, 0, 0, 123)
    for u, v in zip(us, vs):
        u = np.asarray(u)
        assert u.shape == (N,)
        assert (u >= 0.0).all() and (u < 1.0).all()
        np.testing.assert_array_equal(u, np.asarray(v))


def test_uniform4_is_uniform():
    u1, u2, u3, u4 = (np.asarray(u) for u in uniform4(IDS, 0, 0, 7))
    for u in (u1, u2, u3, u4):
        assert abs(u.mean() - 0.5) < 0.02
        assert abs(u.var() - 1.0 / 12.0) < 0.005


def test_streams_decorrelated():
    """Different bounce streams / samples / seeds give different draws —
    unlike the reference, which reuses one per-pixel hash for every bounce
    (`shade.wgsl:216-218`)."""
    base = np.asarray(uniform4(IDS, 0, 0, 0)[0])
    for args in [(IDS, 1, 0, 0), (IDS, 0, 1, 0), (IDS, 0, 0, 1)]:
        other = np.asarray(uniform4(*args)[0])
        assert (base != other).mean() > 0.999
        assert abs(np.corrcoef(base, other)[0, 1]) < 0.05


def test_pcg4d_matches_between_numpy_and_jax_paths():
    """The hash must produce identical bits on the host-numpy path (oracle
    renderer) and the traced-jax path (wavefront engine)."""
    with np.errstate(over="ignore"):
        np_out = pcg4d(IDS, np.uint32(3), np.uint32(5), np.uint32(9))
    jx_out = pcg4d(jnp.asarray(IDS), jnp.uint32(3), jnp.uint32(5), jnp.uint32(9))
    for a, b in zip(np_out, jx_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_random_unit_vector_on_sphere():
    u1, u2, _, _ = uniform4(IDS, 0, 0, 42)
    v = np.asarray(random_unit_vector(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniform on the sphere: mean ~ 0, each coordinate variance ~ 1/3.
    assert np.abs(v.mean(axis=0)).max() < 0.05
    np.testing.assert_allclose(v.var(axis=0), 1.0 / 3.0, atol=0.02)


def test_random_in_unit_sphere_inside():
    u1, u2, u3, _ = uniform4(IDS, 0, 0, 43)
    v = np.asarray(random_in_unit_sphere(u1, u2, u3))
    r = np.linalg.norm(v, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform in the ball: E[r^3] = 1/2 (volume CDF is r^3).
    assert abs((r**3).mean() - 0.5) < 0.02


def test_random_in_unit_disk():
    u1, u2, _, _ = uniform4(IDS, 0, 0, 44)
    x, y = random_in_unit_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # Uniform in the disk: E[r^2] = 1/2.
    assert abs(r2.mean() - 0.5) < 0.02
