"""Pallas fused-trace kernel vs the XLA wavefront path (interpret mode on
CPU; the same comparison runs compiled on real TPU in bench/verification).

SURVEY.md §5 race detection: pure-functional JAX removes data races by
construction; for the Pallas kernel the discipline is interpreter-mode
equivalence against the jnp reference path — these tests.
"""

import numpy as np
import jax
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.kernels import render_pallas
from bevy_raytrace_tpu.scenes import (
    baseline_config1_camera,
    baseline_config1_scene,
    baseline_config2_camera,
    baseline_config2_scene,
    rtiow_final_camera,
    rtiow_final_scene,
)
from bevy_raytrace_tpu.wavefront.render import render


def _compare(scene, cam, cfg, tol=1e-4, bad_frac=0.0005):
    ref = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, cfg))
    got = np.asarray(render_pallas(scene, cam, cfg, interpret=True))
    assert got.shape == ref.shape
    err = np.abs(ref - got).max(axis=-1)
    # f32 transcendental codegen differs; allow tiny drift, no structure.
    assert np.median(err) < 1e-6
    assert (err > tol).mean() <= bad_frac, (
        f"{(err > tol).mean():.5%} pixels deviate > {tol} (max {err.max()})"
    )


def test_pallas_matches_xla_config1():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = baseline_config1_scene()
    _compare(scene, baseline_config1_camera(cfg.aspect), cfg)


def test_pallas_matches_xla_all_materials():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=4)
    scene, _ = baseline_config2_scene()
    _compare(scene, baseline_config2_camera(cfg.aspect), cfg)


def test_pallas_matches_xla_defocus_scene():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = rtiow_final_scene(seed=3, grid=2)
    _compare(scene, rtiow_final_camera(cfg.aspect), cfg)


def test_pallas_nonaligned_resolution():
    """Resolution not a multiple of the 4096-ray tile: padded lanes must
    not corrupt real pixels."""
    cfg = RenderConfig(width=50, height=30, samples_per_pixel=2, max_depth=2)
    scene, _ = baseline_config1_scene()
    _compare(scene, baseline_config1_camera(cfg.aspect), cfg)


def test_pallas_spp_accumulation():
    """Multi-sample grid accumulation averages correctly."""
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=8, max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    got = np.asarray(render_pallas(scene, cam, cfg, interpret=True))
    ref = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_clustered_traversal_bit_identical():
    """Cluster-culled traversal must reproduce the brute-force kernel
    exactly (same per-sphere math; only traversal order/coverage differ,
    and bounds are conservative)."""
    from bevy_raytrace_tpu.kernels import cluster_scene

    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=4)
    scene, _ = rtiow_final_scene(seed=3, grid=3)
    cam = rtiow_final_camera(cfg.aspect)
    brute = np.asarray(render_pallas(scene, cam, cfg, interpret=True))
    for L in (6, 12, 24):
        plan = cluster_scene(scene, cluster_size=L)
        clustered = np.asarray(
            render_pallas(scene, cam, cfg, interpret=True, clusters=plan)
        )
        np.testing.assert_array_equal(brute, clustered)


def test_cluster_plan_shapes_and_bounds_contain_members():
    from bevy_raytrace_tpu.kernels import cluster_scene
    from bevy_raytrace_tpu.kernels.clusters import cluster_bounds

    scene, _ = rtiow_final_scene(seed=0, grid=4)
    plan = cluster_scene(scene, cluster_size=24)
    assert plan.perm.shape == (plan.n_clusters * 24,)
    # every real sphere appears exactly once
    real = plan.perm[plan.member_mask.reshape(-1) > 0]
    assert sorted(real.tolist()) == list(range(scene.count))
    bx, by, bz, bkq = cluster_bounds(scene.centers, scene.radii, plan)
    bc = np.stack([np.asarray(bx), np.asarray(by), np.asarray(bz)], -1)
    br = np.sqrt(np.sum(bc * bc, -1) - np.asarray(bkq))
    c = np.asarray(scene.centers)[plan.perm].reshape(plan.n_clusters, 24, 3)
    r = np.abs(np.asarray(scene.radii)[plan.perm]).reshape(plan.n_clusters, 24)
    extent = np.linalg.norm(c - bc[:, None, :], axis=-1) + r
    mask = plan.member_mask > 0
    assert ((extent <= br[:, None] + 1e-5) | ~mask).all()


def test_cluster_unroll_divisibility_error():
    from bevy_raytrace_tpu.kernels import cluster_scene

    cfg = RenderConfig(width=64, height=32, samples_per_pixel=1, max_depth=2)
    scene, _ = baseline_config1_scene()
    plan = cluster_scene(scene, cluster_size=5)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        render_pallas(scene, baseline_config1_camera(cfg.aspect), cfg,
                      interpret=True, clusters=plan, unroll=6)


def test_pallas_frame_seed():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=1, max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    a = np.asarray(render_pallas(scene, cam, cfg, 0, interpret=True))
    b = np.asarray(render_pallas(scene, cam, cfg, 1, interpret=True))
    assert np.abs(a - b).max() > 1e-3
    ref_b = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, cfg, 1))
    err = np.abs(ref_b - b).max(axis=-1)
    assert np.median(err) < 1e-6
