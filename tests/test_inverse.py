"""Inverse rendering (BASELINE config 4): recover scene parameters from a
target image via pixel-loss gradients; checkpoint/resume exactness."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.inverse import InverseProblem, optimize
from bevy_raytrace_tpu.inverse.optimize import load_checkpoint, save_checkpoint
from bevy_raytrace_tpu.scenes import baseline_config1_camera, baseline_config1_scene
from bevy_raytrace_tpu.wavefront.render import render

CFG = RenderConfig(width=32, height=24, samples_per_pixel=4, max_depth=3)


def _target_and_perturbed():
    scene_true, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    target = jax.jit(render, static_argnums=2)(scene_true, cam, CFG, 12345)
    # Perturb the ball's albedo and position.
    mats = dataclasses.replace(
        scene_true.materials,
        albedo=scene_true.materials.albedo.at[1].set(
            jnp.array([0.2, 0.8, 0.6], jnp.float32)
        ),
    )
    scene_bad = dataclasses.replace(
        scene_true,
        materials=mats,
        centers=scene_true.centers.at[1].add(
            jnp.array([0.06, -0.04, 0.05], jnp.float32)
        ),
    )
    return scene_true, scene_bad, cam, target


def test_optimization_reduces_loss_and_recovers():
    """Geometry recovery needs the soft-silhouette gradient mode: plain AD
    misses the visibility term entirely (measured: the whole-image
    center-y gradient is +7e-4 from interior shading while the true
    gradient is -0.076 — the boundary term is ~100x and opposite in sign),
    so without edge_softness the optimizer diverges on positions."""
    scene_true, scene_bad, cam, target = _target_and_perturbed()
    problem = InverseProblem(
        config=CFG.replace(edge_softness=0.01),
        camera=cam,
        target=target,
        optimizable=("centers", "albedo"),
    )
    result = optimize(scene_bad, problem, steps=80, learning_rate=1e-2)
    assert result.losses[-1] < result.losses[0] * 0.3, result.losses[::10]
    # Albedo of the ball recovered to ~the true value.
    got = np.asarray(result.scene.materials.albedo)[1]
    want = np.asarray(scene_true.materials.albedo)[1]
    assert np.abs(got - want).max() < 0.08, (got, want)
    # Ball center pulled back toward the truth (0.088 -> ~0.016 measured).
    err0 = np.linalg.norm(
        np.asarray(scene_bad.centers)[1] - np.asarray(scene_true.centers)[1]
    )
    err1 = np.linalg.norm(
        np.asarray(result.scene.centers)[1] - np.asarray(scene_true.centers)[1]
    )
    assert err1 < 0.4 * err0, (err0, err1)


def test_occluded_geometry_recovery():
    """Recover a sphere whose silhouette lies over ANOTHER sphere, not
    sky — the regime the r3 one-sided boundary term got wrong (sign
    flip, tests/test_silhouette.py history).  With the two-sided term
    the optimizer must pull the occluder back toward the truth."""
    from bevy_raytrace_tpu.core.camera import Camera
    from bevy_raytrace_tpu.scenes.builders import _build
    from bevy_raytrace_tpu.scenes.registry import MaterialRegistry

    cfg = RenderConfig(width=48, height=32, samples_per_pixel=8,
                       max_depth=3)
    cam = Camera.look_at(lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, -1.0),
                         vfov_deg=40.0, aspect=1.5, aperture=0.0)
    reg = MaterialRegistry()
    g = reg.lambertian("ground", (0.5, 0.5, 0.5))
    mb = reg.lambertian("back", (0.1, 0.2, 0.7))
    ma = reg.lambertian("front", (0.8, 0.3, 0.1))
    scene_true = _build([
        ((0.0, -100.5, -1.0), 100.0, g),
        ((0.0, 0.1, -2.5), 1.1, mb),      # big sphere fills the backdrop
        ((0.15, 0.05, -1.0), 0.25, ma),   # occluder: every edge over B
    ], reg)
    target = jax.jit(render, static_argnums=2)(scene_true, cam, cfg, 7)
    scene_bad = dataclasses.replace(
        scene_true,
        centers=scene_true.centers.at[2].add(
            jnp.array([0.08, -0.05, 0.0], jnp.float32)))
    problem = InverseProblem(
        config=cfg.replace(edge_softness=0.02),
        camera=cam,
        target=target,
        optimizable=("centers",),
    )
    result = optimize(scene_bad, problem, steps=80, learning_rate=1e-2)
    assert result.losses[-1] < result.losses[0] * 0.5, result.losses[::10]
    err0 = np.linalg.norm(
        np.asarray(scene_bad.centers)[2] - np.asarray(scene_true.centers)[2])
    err1 = np.linalg.norm(
        np.asarray(result.scene.centers)[2]
        - np.asarray(scene_true.centers)[2])
    assert err1 < 0.5 * err0, (err0, err1)


def test_edge_softness_value_bit_identical():
    """Straight-through soft silhouettes must not change the image."""
    scene_true, _, cam, _ = _target_and_perturbed()
    a = jax.jit(render, static_argnums=2)(scene_true, cam, CFG, 3)
    b = jax.jit(render, static_argnums=2)(
        scene_true, cam, CFG.replace(edge_softness=0.05), 3
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(4)}
    opt_state = (jnp.ones(3), {"m": jnp.full((2, 2), 2.0)})
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, 17, params, opt_state)
    step, p2, s2 = load_checkpoint(path)
    assert step == 17
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(
        np.asarray(s2[1]["m"]), np.asarray(opt_state[1]["m"])
    )


def test_resume_matches_uninterrupted(tmp_path):
    """Optimize 20 steps straight vs 10 + checkpoint + resume 10."""
    _, scene_bad, cam, target = _target_and_perturbed()
    problem = InverseProblem(
        config=CFG, camera=cam, target=target, optimizable=("albedo",)
    )
    straight = optimize(scene_bad, problem, steps=20, learning_rate=2e-2)

    path = os.path.join(tmp_path, "ck.npz")
    optimize(
        scene_bad, problem, steps=10, learning_rate=2e-2,
        checkpoint_path=path, checkpoint_every=10,
    )
    resumed = optimize(
        scene_bad, problem, steps=20, learning_rate=2e-2,
        checkpoint_path=path, checkpoint_every=100,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.scene.materials.albedo),
        np.asarray(straight.scene.materials.albedo),
        atol=1e-6,
    )
