"""v3 MXU kernel (kernels/mxu_render.py) vs the XLA wavefront path,
interpret mode on CPU (the compiled comparison runs on TPU via
`bench.py --verify`).

Beyond the image equivalence the v1/v2 kernel tests establish
(test_pallas.py), the v3-specific contracts are: the persistent-lane
refill schedule reproduces the grid-over-spp accumulation order exactly,
and a cost-balancing pixel permutation changes only the schedule, never
the image (RNG keys on absolute pixel ids).
"""

import numpy as np
import jax
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.kernels.mxu_render import (
    balance_perm,
    render_mxu,
    render_mxu_balanced,
    render_mxu_with_len,
)
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
    got = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    assert got.shape == ref.shape
    err = np.abs(ref - got).max(axis=-1)
    assert np.median(err) < 1e-6
    assert (err > tol).mean() <= bad_frac, (
        f"{(err > tol).mean():.5%} pixels deviate > {tol} (max {err.max()})"
    )


def test_mxu_matches_xla_config1():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = baseline_config1_scene()
    _compare(scene, baseline_config1_camera(cfg.aspect), cfg)


def test_mxu_matches_xla_all_materials():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=4)
    scene, _ = baseline_config2_scene()
    _compare(scene, baseline_config2_camera(cfg.aspect), cfg)


def test_mxu_matches_xla_defocus_scene():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = rtiow_final_scene(seed=3, grid=2)
    _compare(scene, rtiow_final_camera(cfg.aspect), cfg)


def test_mxu_rejects_scenes_beyond_key_capacity():
    """The packed key carries IDX_BITS of sphere index; a scene past that
    must fail loudly, not silently attribute winners to wrong spheres."""
    import dataclasses

    import jax.numpy as jnp

    cfg = RenderConfig(width=32, height=16, samples_per_pixel=1,
                       max_depth=2)
    scene, _ = baseline_config1_scene()
    n = 1100  # > 2**IDX_BITS slots
    big = dataclasses.replace(
        scene,
        centers=jnp.zeros((n, 3), jnp.float32),
        radii=jnp.ones((n,), jnp.float32),
        material_id=jnp.zeros((n,), jnp.int32),
    )
    cam = baseline_config1_camera(cfg.aspect)
    with pytest.raises(ValueError, match="sphere slots"):
        render_mxu(big, cam, cfg, interpret=True)


def test_mxu_rejects_framebuffer_beyond_f32_exact_ids():
    """Pixel ids ride in f32 planes (exact < 2^24): an 8K-class
    framebuffer must fail loudly, pointing at the sharded path."""
    cfg = RenderConfig(width=8192, height=4096, samples_per_pixel=1,
                       max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    with pytest.raises(ValueError, match="2\\^24"):
        render_mxu(scene, cam, cfg, interpret=True)


def test_mxu_probe_surface_smoke():
    """The dev-tool probe surface (kernels/mxu_probes.py, reached via
    render_mxu_lanes' debug_expr/dump) must keep compiling after kernel
    refactors — BENCHMARKS.md's reproduce commands depend on it."""
    from bevy_raytrace_tpu.kernels.mxu_render import (
        lane_pad,
        render_mxu_lanes,
    )
    import jax.numpy as jnp

    cfg = RenderConfig(width=32, height=16, samples_per_pixel=1,
                       max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    p_pad = lane_pad(cfg.num_pixels, 8, 1)
    pids = jnp.arange(p_pad, dtype=jnp.int32).reshape(p_pad // 128, 128)
    # Value probe: the plane shows the LAST executed round, so pin ONE
    # round — every lane's round is then its camera ray, and the winner
    # t must be positive wherever that ray hits.
    _, ln = render_mxu_lanes(scene, cam, cfg, pids, interpret=True,
                             v_planes=1, debug_expr="btm", max_rounds=1)
    ln = np.asarray(ln).reshape(-1)[:cfg.num_pixels]  # drop pad lanes
    assert np.isfinite(ln).all() and (ln >= 0).all()
    assert (ln > 0).mean() > 0.3  # most camera rays hit something
    # Loop-driver probe (pinned fori rounds) still builds and runs.
    fb, _ = render_mxu_lanes(scene, cam, cfg, pids, interpret=True,
                             v_planes=1, debug_expr="full_fori",
                             max_rounds=4)
    assert np.isfinite(np.asarray(fb)).all()


def test_mxu_culled_bit_identical_to_dense():
    """Chunk-culled traversal (phase-A bounds + per-lane t_ub from the
    static priority set AND the cached previous-round winner) must be
    bit-identical to the dense sweep: every bound is conservative and
    duplicate pad spheres lose min ties."""
    from bevy_raytrace_tpu.kernels.clusters import cluster_scene

    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=4)
    scene, _ = rtiow_final_scene(seed=3, grid=3)
    cam = rtiow_final_camera(cfg.aspect)
    dense = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    plan = cluster_scene(scene, cluster_size=8)
    culled = np.asarray(render_mxu(scene, cam, cfg, interpret=True,
                                   plan=plan))
    np.testing.assert_array_equal(dense, culled)


def test_mxu_nonaligned_resolution():
    """Width*height not a multiple of the 1024-lane tile: padding lanes
    must not corrupt real pixels."""
    cfg = RenderConfig(width=50, height=30, samples_per_pixel=2, max_depth=2)
    scene, _ = baseline_config1_scene()
    _compare(scene, baseline_config1_camera(cfg.aspect), cfg)


def test_mxu_spp_refill_accumulation():
    """The refill schedule must accumulate multi-sample radiance exactly
    like the one-sample-per-grid-step schedule (same per-lane add order)."""
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=8, max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    got = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    ref = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_mxu_balanced_bit_identical():
    """Cost-sorting pixels re-schedules the wavefront but may not change
    one bit of the image."""
    cfg = RenderConfig(width=64, height=48, samples_per_pixel=4, max_depth=6)
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(cfg.aspect)
    plain = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    balanced = np.asarray(
        render_mxu_balanced(scene, cam, cfg, interpret=True))
    np.testing.assert_array_equal(plain, balanced)


def test_mxu_arbitrary_perm_bit_identical():
    """Any permutation — not just the cost sort — must be image-neutral."""
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    plain = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    rng = np.random.RandomState(7)
    perm = rng.permutation(cfg.num_pixels).astype(np.int32)
    shuffled = np.asarray(
        render_mxu(scene, cam, cfg, interpret=True, perm=perm))
    np.testing.assert_array_equal(plain, shuffled)


def test_mxu_len_map_plausible():
    """The 4th output is the per-pixel mean path length: bounded by
    [1, max_depth], and sky pixels (top rows) should average ~1."""
    cfg = RenderConfig(width=64, height=48, samples_per_pixel=4, max_depth=8)
    scene, _ = rtiow_final_scene(seed=3, grid=2)
    cam = rtiow_final_camera(cfg.aspect)
    _, lmap = render_mxu_with_len(scene, cam, cfg, interpret=True)
    lmap = np.asarray(lmap)
    assert lmap.min() >= 1.0 - 1e-6
    assert lmap.max() <= cfg.max_depth + 1e-6
    assert lmap[0].mean() < 1.5  # top rows are sky-dominated
    perm = np.asarray(balance_perm(jnp_asarray(lmap)))
    assert sorted(perm.tolist()) == list(range(cfg.num_pixels))


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_mxu_sphere_chunking_invariant():
    """Chunked sphere processing (matmul block size) must not change the
    image at all."""
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=3)
    scene, _ = rtiow_final_scene(seed=3, grid=3)
    cam = rtiow_final_camera(cfg.aspect)
    a = np.asarray(render_mxu(scene, cam, cfg, interpret=True,
                              sphere_chunk=256))
    b = np.asarray(render_mxu(scene, cam, cfg, interpret=True,
                              sphere_chunk=128))
    np.testing.assert_array_equal(a, b)


def test_mxu_frame_seed():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=1, max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    a = np.asarray(render_mxu(scene, cam, cfg, 0, interpret=True))
    b = np.asarray(render_mxu(scene, cam, cfg, 1, interpret=True))
    assert np.abs(a - b).max() > 1e-3
    ref_b = np.asarray(jax.jit(render, static_argnums=2)(scene, cam, cfg, 1))
    err = np.abs(ref_b - b).max(axis=-1)
    assert np.median(err) < 1e-6


def test_mxu_depth_zero_black():
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=0)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    img = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    assert float(np.abs(img).max()) == 0.0


@pytest.mark.parametrize("hosts", [1, 2])
def test_mxu_sharded_matches_single_device_bitexact(hosts):
    """shard_map(render_mxu_lanes) over the virtual mesh must reproduce
    the single-device kernel bit-for-bit (RNG keys on absolute pixel ids;
    VERDICT r1 item 2)."""
    from bevy_raytrace_tpu.shard import make_mesh, render_mxu_sharded

    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=4)
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(cfg.aspect)
    single = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    mesh = make_mesh(hosts=hosts)
    sharded = np.asarray(
        render_mxu_sharded(scene, cam, cfg, mesh, interpret=True))
    np.testing.assert_array_equal(single, sharded)


def test_mxu_sharded_balanced_bit_identical():
    """Device-local cost balancing must not change the sharded image."""
    from bevy_raytrace_tpu.shard import make_mesh, render_mxu_sharded

    cfg = RenderConfig(width=64, height=32, samples_per_pixel=2, max_depth=6)
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(cfg.aspect)
    mesh = make_mesh(hosts=2)
    plain = np.asarray(
        render_mxu_sharded(scene, cam, cfg, mesh, interpret=True))
    balanced = np.asarray(render_mxu_sharded(
        scene, cam, cfg, mesh, balance=True, interpret=True))
    np.testing.assert_array_equal(plain, balanced)


def test_mxu_sharded_indivisible_raises():
    from bevy_raytrace_tpu.shard import make_mesh, render_mxu_sharded

    cfg = RenderConfig(width=50, height=30, samples_per_pixel=1, max_depth=2)
    scene, _ = baseline_config1_scene()
    cam = baseline_config1_camera(cfg.aspect)
    with pytest.raises(ValueError, match="divide"):
        render_mxu_sharded(scene, cam, cfg, make_mesh(), interpret=True)


def test_mxu_probe_reuse_allclose():
    """Probe-reuse mode renders the SAME paths, summed in two groups:
    allclose at f32 to the plain render (and to non-reuse balanced)."""
    cfg = RenderConfig(width=64, height=32, samples_per_pixel=8, max_depth=4)
    scene, _ = baseline_config2_scene()
    cam = baseline_config2_camera(cfg.aspect)
    plain = np.asarray(render_mxu(scene, cam, cfg, interpret=True))
    reuse = np.asarray(render_mxu_balanced(
        scene, cam, cfg, interpret=True, probe_spp=2, probe_reuse=True))
    np.testing.assert_allclose(reuse, plain, atol=1e-5)
    exact = np.asarray(render_mxu_balanced(
        scene, cam, cfg, interpret=True, probe_spp=2, probe_reuse=False))
    np.testing.assert_array_equal(exact, plain)
