"""Distributed tests without a cluster (SURVEY.md §4 item 4): a fake
8-device CPU mesh (conftest sets --xla_force_host_platform_device_count=8).

Key invariants:
- sharded render is BIT-IDENTICAL to single-device (absolute pixel ids key
  the RNG, so the sample streams are layout-independent);
- any mesh shape (8x1, 4x2, 2x4, 1x1) produces the same image;
- gradients of replicated scene params under the sharded renderer match
  the single-device gradients (the shard_map transpose psum).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.scenes import (
    baseline_config2_camera,
    baseline_config2_scene,
)
from bevy_raytrace_tpu.shard import make_mesh, render_sharded
from bevy_raytrace_tpu.wavefront.render import render

CFG = RenderConfig(width=32, height=16, samples_per_pixel=4, max_depth=4)


def _scene_cam():
    scene, _ = baseline_config2_scene()
    return scene, baseline_config2_camera(CFG.aspect)


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("hosts", [1, 2, 4, 8])
def test_sharded_matches_single_device_bitexact(hosts):
    scene, cam = _scene_cam()
    single = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, CFG))
    mesh = make_mesh(jax.devices(), hosts=hosts)
    sharded = np.asarray(
        jax.jit(render_sharded, static_argnums=(2, 3))(scene, cam, CFG, mesh)
    )
    np.testing.assert_array_equal(single, sharded)


def test_sharded_output_is_actually_sharded():
    scene, cam = _scene_cam()
    mesh = make_mesh(jax.devices(), hosts=2)
    img = jax.jit(render_sharded, static_argnums=(2, 3))(scene, cam, CFG, mesh)
    assert len(img.sharding.device_set) == 8


def test_single_device_mesh():
    scene, cam = _scene_cam()
    mesh = make_mesh(jax.devices()[:1], hosts=1)
    img = np.asarray(
        jax.jit(render_sharded, static_argnums=(2, 3))(scene, cam, CFG, mesh)
    )
    single = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, CFG))
    np.testing.assert_array_equal(single, img)


def test_sharded_gradients_match_single_device():
    """Replicated scene-parameter cotangents must psum across the mesh and
    equal the single-device gradient (the BASELINE grad all-reduce)."""
    scene, cam = _scene_cam()
    mesh = make_mesh(jax.devices(), hosts=2)

    def loss_single(centers):
        import dataclasses

        s = dataclasses.replace(scene, centers=centers)
        return jnp.mean(render(s, cam, CFG))

    def loss_sharded(centers):
        import dataclasses

        s = dataclasses.replace(scene, centers=centers)
        return jnp.mean(render_sharded(s, cam, CFG, mesh))

    g1 = np.asarray(jax.jit(jax.grad(loss_single))(scene.centers))
    g2 = np.asarray(jax.jit(jax.grad(loss_sharded))(scene.centers))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-7)


def test_indivisible_pixel_count_raises():
    scene, cam = _scene_cam()
    mesh = make_mesh(jax.devices(), hosts=1)
    bad = RenderConfig(width=33, height=7, samples_per_pixel=1, max_depth=2)
    with pytest.raises(ValueError, match="devices"):
        render_sharded(scene, cam, bad, mesh)


def test_mesh_host_divisibility_error():
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(jax.devices()[:6], hosts=4)
