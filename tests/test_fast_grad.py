"""The residual-replay differentiable fast path (inverse/fast_grad.py).

Forward = the fused Pallas kernel recording per-bounce winner residuals;
backward = differentiable jnp replay of the recorded paths (no sphere
sweep).  Contracts tested here (interpret mode on CPU, VERDICT r2 item 3):

  1. the fast renderer's forward image IS the Pallas forward image;
  2. the replay itself reconstructs the forward image (the checkpoint is
     complete: winner index + RNG counters determine the path);
  3. its gradients match `jax.grad` through the XLA wavefront — same
     straight-through policy, same sampled paths — for clusters=None and
     a ClusterPlan, and with edge_softness off and on.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.inverse import make_fast_renderer, replay_image
from bevy_raytrace_tpu.kernels import cluster_scene, render_pallas
from bevy_raytrace_tpu.scenes import (
    baseline_config1_camera,
    baseline_config1_scene,
    baseline_config2_camera,
    baseline_config2_scene,
    rtiow_final_camera,
    rtiow_final_scene,
)
from bevy_raytrace_tpu.wavefront.render import render

CFG = RenderConfig(width=48, height=32, samples_per_pixel=2, max_depth=3)


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


def _probe_weights(cfg):
    # A fixed, structured cotangent image: probes every pixel with varying
    # sign/magnitude so gradient errors cannot cancel in a mean.
    n = cfg.height * cfg.width * 3
    w = np.sin(np.arange(n, dtype=np.float32) * 0.37) + 0.25
    return jnp.asarray(w.reshape(cfg.height, cfg.width, 3))


def _grads(render_fn, scene, cfg, names, frame=0):
    w = _probe_weights(cfg)

    def loss(params):
        img = render_fn(_set_params(scene, params), frame)
        return jnp.sum(img * w)

    params = {n: {"centers": scene.centers, "radii": scene.radii,
                  "albedo": scene.materials.albedo,
                  "fuzz": scene.materials.fuzz,
                  "ior": scene.materials.ior}[n] for n in names}
    return jax.grad(loss)(params)


def _compare_grads(scene, camera, cfg, names, clusters=None, rtol=5e-3,
                   atol=3e-4):
    fast = make_fast_renderer(cfg, clusters=clusters, interpret=True)
    g_fast = _grads(lambda s, f: fast(s, camera, f), scene, cfg, names)
    g_xla = _grads(lambda s, f: render(s, camera, cfg, f), scene, cfg, names)
    for n in names:
        a, b = np.asarray(g_fast[n]), np.asarray(g_xla[n])
        assert np.isfinite(a).all(), f"{n}: non-finite fast grads"
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol * scale,
            err_msg=f"param {n}: fast-path grads diverge from XLA path")


def test_fast_forward_is_pallas_forward():
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    fast = make_fast_renderer(CFG, interpret=True)
    got = np.asarray(fast(scene, cam, 0))
    ref = np.asarray(render_pallas(scene, cam, CFG, 0, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_replay_reconstructs_forward_image():
    """The residual checkpoint is complete: replaying winners + RNG
    reproduces the kernel's image (the r2 commit's 1.2e-5 claim, encoded —
    differences are only transcendental codegen drift)."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    img, res = render_pallas(scene, cam, CFG, 0, interpret=True,
                             with_residuals=True)
    rep = replay_image(scene, cam, CFG, res, 0)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(img), atol=5e-5)


def test_fast_grads_match_xla_config1():
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    _compare_grads(scene, cam, CFG, ("centers", "radii", "albedo"))


def test_fast_grads_match_xla_all_materials():
    """config2: Lambertian + metal + dielectric; fuzz/ior grads flow."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    _compare_grads(scene, cam, CFG, ("albedo", "fuzz", "ior"))


def test_fast_grads_clustered_replay():
    """Cluster-permuted forward: residual indices live in the permuted
    order; the replay must map them back through plan.perm (ADVICE r2:
    previously unverified)."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    plan = cluster_scene(scene, cluster_size=6)
    _compare_grads(scene, cam, CFG, ("centers", "albedo"), clusters=plan)


def test_fast_grads_edge_softness():
    """The soft-silhouette boundary term is replayed identically."""
    cfg = dataclasses.replace(CFG, edge_softness=0.01)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    _compare_grads(scene, cam, cfg, ("centers", "radii"))


def test_fast_renderer_under_jit_and_value_and_grad():
    """The shape used by inverse/optimize: jitted value_and_grad of a
    scalar loss through the fast renderer."""
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    fast = make_fast_renderer(CFG, interpret=True)
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)

    @jax.jit
    def step(centers):
        sc = dataclasses.replace(scene, centers=centers)
        img = fast(sc, cam, 0)
        return jnp.mean((img - target) ** 2)

    loss, g = jax.value_and_grad(step)(scene.centers)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0


def test_fast_grads_rtiow_bulk_agreement():
    """The RTiOW final scene (defocus camera, metal+glass at grazing
    angles) exposes the near-tangency pathology: a path with disc -> 0
    has d(t)/d(theta) ~ 1/sqrt(disc), so single grazing samples dominate
    BOTH estimators' gradient norms and are maximally sensitive to
    ulp-level codegen differences (measured r3: |g_xla|_max was 90x its
    own p99 at 8 spp — outlier noise, not signal).  The contract that CAN
    be asserted: the replayed fast path matches the XLA path on the BULK
    of components; the outlier tail differs because the two backends
    resolve tangency flips differently, not because a pathway is
    missing."""
    import numpy as _np

    scene, _ = rtiow_final_scene(seed=0)
    cfg = RenderConfig(width=96, height=48, samples_per_pixel=8,
                       max_depth=6, spp_chunk=4)
    cam = rtiow_final_camera(cfg.aspect)
    fast = make_fast_renderer(cfg, interpret=True)

    def lf(c):
        sc = dataclasses.replace(scene, centers=c)
        return jnp.mean(fast(sc, cam, 1) ** 2)

    def lx(c):
        sc = dataclasses.replace(scene, centers=c)
        return jnp.mean(render(sc, cam, cfg, 1) ** 2)

    gf = _np.asarray(jax.grad(lf)(scene.centers)).ravel()
    gx = _np.asarray(jax.grad(lx)(scene.centers)).ravel()
    assert _np.isfinite(gf).all() and _np.isfinite(gx).all()
    d = _np.abs(gf - gx)
    trimmed = _np.sort(d)[: int(0.98 * d.size)]
    scale = _np.percentile(_np.abs(gx), 99)
    # Measured r3: trimmed max 1.3e-4 vs p99 1.4e-3 (ratio 0.095).
    assert trimmed.max() < 0.3 * scale, (trimmed.max(), scale)


def test_sweep_recorder_forward_and_replay():
    """The dense-sweep recorder (kernels/sweep_record.py, r5): its image
    matches the XLA wavefront and its residual checkpoint is complete
    (replay reconstructs the image), including the runner-up stream."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    from bevy_raytrace_tpu.kernels.sweep_record import render_sweep_record

    img, res = render_sweep_record(scene, cam, CFG, 0, interpret=True)
    assert res.dtype == jnp.int16
    ref = np.asarray(render(scene, cam, CFG, 0))
    d = np.abs(np.asarray(img) - ref).max(axis=-1)
    assert np.median(d) < 1e-5 and (d > 1e-2).mean() < 0.02
    rep = replay_image(scene, cam, CFG, res, 0)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(img), atol=5e-5)

    cfg2 = dataclasses.replace(CFG, edge_softness=0.01)
    img2, res_b, res2 = render_sweep_record(scene, cam, cfg2, 0,
                                            interpret=True,
                                            record_second=True)
    rep2 = replay_image(scene, cam, cfg2, res_b, 0, res2=res2)
    np.testing.assert_allclose(np.asarray(rep2), np.asarray(img2),
                               atol=5e-5)


def test_sweep_recorder_grads_match_xla():
    """make_fast_renderer(forward="sweep"): gradients through the sweep
    recorder + fused replay backward match jax.grad of the XLA wavefront
    (same contract as the v1 recorder)."""
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(CFG.aspect)
    fast = make_fast_renderer(CFG, interpret=True, forward="sweep")
    g_fast = _grads(lambda s, f: fast(s, cam, f), scene, CFG,
                    ("centers", "radii", "albedo"))
    g_xla = _grads(lambda s, f: render(s, cam, CFG, f), scene, CFG,
                   ("centers", "radii", "albedo"))
    for n in ("centers", "radii", "albedo"):
        a, b = np.asarray(g_fast[n]), np.asarray(g_xla[n])
        assert np.isfinite(a).all()
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=3e-4 * scale,
                                   err_msg=f"param {n}")


def test_sweep_recorder_rejects_clusters():
    from bevy_raytrace_tpu.kernels import cluster_scene

    scene, _ = baseline_config2_scene()
    plan = cluster_scene(scene, cluster_size=6)
    with np.testing.assert_raises(ValueError):
        make_fast_renderer(CFG, clusters=plan, forward="sweep")


def test_sweep_recorder_stripe_mode_composes():
    """Stripe mode (pixel_base/num_local): a stripe's image and
    residuals equal the corresponding slice of the full render (RNG
    keys on absolute pixel ids), so the sharded composition holds for
    the sweep recorder too."""
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(CFG.aspect)
    from bevy_raytrace_tpu.kernels.sweep_record import render_sweep_record

    img_full, res_full = render_sweep_record(scene, cam, CFG, 0,
                                             interpret=True)
    n = CFG.num_pixels
    half = n // 2
    flat_full = np.asarray(img_full).reshape(n, 3)
    for base, local in ((0, half), (half, half)):
        img_s, res_s = render_sweep_record(
            scene, cam, CFG, 0, interpret=True,
            pixel_base=jnp.uint32(base), num_local=local)
        np.testing.assert_array_equal(np.asarray(img_s),
                                      flat_full[base:base + local])
        np.testing.assert_array_equal(
            np.asarray(res_s)[:, :, :local],
            np.asarray(res_full)[:, :, base:base + local])
