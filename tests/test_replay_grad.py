"""The fused Pallas replay-gradient kernel (kernels/replay_grad.py).

backward="kernel" computes the whole backward step — forward replay of
the recorded paths AND the cotangent accumulation — in one Pallas
program; backward="xla" (the differentiable jnp replay transposed by
jax.vjp) is its oracle.  The two must agree to float-association noise
on every parameter class, for every material, with edge_softness off and
on, and through the cluster-permuted residual order.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.inverse import make_fast_renderer
from bevy_raytrace_tpu.kernels import cluster_scene
from bevy_raytrace_tpu.scenes import (
    baseline_config1_camera,
    baseline_config1_scene,
    baseline_config2_camera,
    baseline_config2_scene,
)

CFG = RenderConfig(width=48, height=32, samples_per_pixel=2, max_depth=3)


def _probe_weights(cfg):
    n = cfg.height * cfg.width * 3
    w = np.sin(np.arange(n, dtype=np.float32) * 0.37) + 0.25
    return jnp.asarray(w.reshape(cfg.height, cfg.width, 3))


def _set_params(scene, params):
    mats = dataclasses.replace(
        scene.materials,
        albedo=params.get("albedo", scene.materials.albedo),
        fuzz=params.get("fuzz", scene.materials.fuzz),
        ior=params.get("ior", scene.materials.ior),
    )
    return dataclasses.replace(
        scene,
        centers=params.get("centers", scene.centers),
        radii=params.get("radii", scene.radii),
        materials=mats,
    )


def _grads(scene, camera, cfg, names, backward, clusters=None):
    fast = make_fast_renderer(cfg, clusters=clusters, interpret=True,
                              backward=backward)
    w = _probe_weights(cfg)

    def loss(params, cam):
        return jnp.sum(fast(_set_params(scene, params), cam, 0) * w)

    params = {n: {"centers": scene.centers, "radii": scene.radii,
                  "albedo": scene.materials.albedo,
                  "fuzz": scene.materials.fuzz,
                  "ior": scene.materials.ior}[n] for n in names}
    return jax.grad(loss, argnums=(0, 1))(params, camera)


def _compare(scene, camera, cfg, names, clusters=None, rtol=2e-3):
    gk, gck = _grads(scene, camera, cfg, names, "kernel", clusters)
    gx, gcx = _grads(scene, camera, cfg, names, "xla", clusters)
    # Near-zero cotangent components (e.g. ior in an all-Lambertian view,
    # focus_dist of an in-focus camera) are float-association noise in
    # BOTH estimators; tolerate them relative to the overall gradient
    # magnitude, not their own.
    glob = max(float(np.abs(np.asarray(gx[n])).max()) for n in names) + 1e-8
    for n in names:
        a, b = np.asarray(gk[n]), np.asarray(gx[n])
        assert np.isfinite(a).all(), f"{n}: non-finite kernel grads"
        scale = np.abs(b).max() + 1e-3 * glob
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=rtol * scale,
            err_msg=f"param {n}: kernel backward diverges from XLA replay")
    ka = jax.tree_util.tree_leaves(gck)
    xa = jax.tree_util.tree_leaves(gcx)
    cam_glob = max(float(np.abs(np.asarray(b)).max()) for b in xa) + 1e-8
    for a, b in zip(ka, xa):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.abs(b).max()) + 1e-3 * cam_glob
        np.testing.assert_allclose(a, b, rtol=rtol, atol=rtol * scale,
                                   err_msg="camera cotangents diverge")


def test_kernel_backward_matches_xla_config1():
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    _compare(scene, cam, CFG, ("centers", "radii", "albedo"))


def test_kernel_backward_matches_xla_all_materials():
    """config2 exercises metal fuzz + dielectric Schlick chains."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    _compare(scene, cam, CFG, ("centers", "albedo", "fuzz", "ior"))


def test_kernel_backward_edge_softness():
    cfg = dataclasses.replace(CFG, edge_softness=0.01)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    _compare(scene, cam, cfg, ("centers", "radii"))


def test_kernel_backward_clustered_residuals():
    """Cluster-permuted forward: residual indices are in the permuted
    order; the kernel's table cotangents must map back through the perm."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    plan = cluster_scene(scene, cluster_size=6)
    _compare(scene, cam, CFG, ("centers", "albedo"), clusters=plan)


def test_kernel_backward_nonaligned_resolution():
    """A pixel count that does not fill whole tiles: padding lanes carry
    zero cotangents and record -1 residuals; grads must be unaffected."""
    cfg = RenderConfig(width=50, height=21, samples_per_pixel=2, max_depth=3)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    _compare(scene, cam, cfg, ("centers", "albedo"))


def test_bad_backward_name_rejected():
    with pytest.raises(ValueError, match="backward"):
        make_fast_renderer(CFG, backward="nope")


def test_grad_spp_chunk_matches_unchunked():
    """spp-chunked residual recording (grad_spp_chunk) must reproduce
    the unchunked kernel gradients up to f32 summation order, with the
    SAME sample set (sample_base offsets the RNG counters)."""
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=4,
                       max_depth=3, edge_softness=0.01)
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(cfg.aspect)
    w = _probe_weights(cfg)

    def grads(**kw):
        fast = make_fast_renderer(cfg, interpret=True, **kw)

        def loss(centers):
            sc = dataclasses.replace(scene, centers=centers)
            return jnp.sum(fast(sc, cam, 0) * w)

        return jax.value_and_grad(loss)(scene.centers)

    v_full, g_full = grads()
    v_chunk, g_chunk = grads(grad_spp_chunk=2)
    np.testing.assert_allclose(np.asarray(v_chunk), np.asarray(v_full),
                               rtol=1e-6)
    scale = np.abs(np.asarray(g_full)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                               rtol=1e-4, atol=1e-4 * scale)


def test_grad_spp_chunk_validation():
    with pytest.raises(ValueError, match="divisible"):
        make_fast_renderer(RenderConfig(width=8, height=8,
                                        samples_per_pixel=4, max_depth=2),
                           grad_spp_chunk=3)
    with pytest.raises(ValueError, match="kernel"):
        make_fast_renderer(RenderConfig(width=8, height=8,
                                        samples_per_pixel=4, max_depth=2),
                           backward="xla", grad_spp_chunk=2)
