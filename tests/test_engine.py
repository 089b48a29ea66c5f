"""Renderer session tests (the frame-loop layer, wavefront/engine.py)."""

import numpy as np
import pytest

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.scenes import baseline_config1_camera, baseline_config1_scene
from bevy_raytrace_tpu.shard import make_mesh
from bevy_raytrace_tpu.utils.metrics import FrameTimer
from bevy_raytrace_tpu.wavefront import Renderer

CFG = RenderConfig(width=32, height=16, samples_per_pixel=2, max_depth=3)


def _scene_cam():
    scene, _ = baseline_config1_scene()
    return scene, baseline_config1_camera(CFG.aspect)


def test_warmup_and_frames_advance():
    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="xla")
    assert not r.ready
    dt = r.warmup(scene, cam)
    assert r.ready and dt > 0
    a = np.asarray(r.render_frame(scene, cam))
    b = np.asarray(r.render_frame(scene, cam))
    assert a.shape == (16, 32, 3)
    assert np.abs(a - b).max() > 1e-4  # frame counter advanced -> new noise


def test_mxu_sharded_session_matches_mxu():
    """backend='mxu-sharded' (config-5 composition through the session
    API) is bit-identical to the single-device mxu render."""
    scene, cam = _scene_cam()
    a = np.asarray(Renderer(CFG, backend="mxu",
                            interpret=True).render_frame(scene, cam))
    r = Renderer(CFG, backend="mxu-sharded", mesh=make_mesh(hosts=2),
                 interpret=True)
    b = np.asarray(r.render_frame(scene, cam))
    np.testing.assert_array_equal(a, b)


def test_warmup_async_nonblocking():
    """The reference compiles pipelines asynchronously and idles in
    Loading until ready (`src/ray_trace_node.rs:173-193`); warmup_async
    is that analog: the caller's thread stays free, `ready` flips on
    completion, and the subsequent frame reuses the warmed jit cache."""
    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="xla")
    assert not r.ready
    fut = r.warmup_async(scene, cam)
    # A second call while one is pending must share the future, not race
    # two compilations.
    assert r.warmup_async(scene, cam) is fut
    dt = fut.result(timeout=120)  # Loading -> Ready
    assert r.ready and dt > 0
    img = np.asarray(r.render_frame(scene, cam))
    assert img.shape == (16, 32, 3) and np.isfinite(img).all()


def test_backends_agree():
    scene, cam = _scene_cam()
    imgs = {}
    for backend in ("xla", "sharded"):
        r = Renderer(CFG, backend=backend,
                     mesh=make_mesh(hosts=2) if backend == "sharded" else None)
        imgs[backend] = np.asarray(r.render_frame(scene, cam))
    np.testing.assert_array_equal(imgs["xla"], imgs["sharded"])


def test_live_scene_edit_no_recompile():
    import dataclasses

    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="xla")
    timer = FrameTimer(CFG, scene.count)
    r.render_frame(scene, cam, timer)  # compile
    n_compiled = r._step._cache_size()
    moved = dataclasses.replace(scene, centers=scene.centers + 0.01)
    img, m = timer.time_frame(r._step, moved, cam, CFG, r.frame)
    # An edited scene must NOT trigger recompilation (traced pytree arg) —
    # the reference pays a per-frame re-upload instead (sphere.rs:180-197).
    assert r._step._cache_size() == n_compiled
    assert m.rays_per_sec > 0
    assert np.abs(np.asarray(img)).max() > 0


def test_unknown_backend():
    with pytest.raises(ValueError, match="backend"):
        Renderer(CFG, backend="cuda")


def test_renderer_kernel_backends_interpret():
    """The mxu/pallas Renderer wiring (plan cache, balanced path) runs in
    CI via the interpreter — not only on real TPU (VERDICT r2 item 9)."""
    scene, cam = _scene_cam()
    ref = np.asarray(Renderer(CFG, backend="xla").render_frame(scene, cam))
    for backend in ("pallas", "mxu"):
        r = Renderer(CFG, backend=backend, interpret=True)
        img = np.asarray(r.render_frame(scene, cam))
        assert img.shape == ref.shape
        err = np.abs(img - ref).max(axis=-1)
        assert np.median(err) < 1e-6, backend
        assert (err > 1e-3).mean() < 0.005, backend


def test_renderer_pallas_no_replan_on_scene_edit():
    """Moving spheres must not rebuild the plan or recompile (ADVICE r2):
    the jitted-fn cache keys on (count, cluster_size) only."""
    import dataclasses

    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="pallas", interpret=True)
    r.render_frame(scene, cam)
    fns = dict(r._fns)
    moved = dataclasses.replace(scene, centers=scene.centers + 0.25)
    img = np.asarray(r.render_frame(moved, cam))
    assert r._fns == fns  # same cached fn object, no new entry
    assert np.isfinite(img).all()
    r.replan()
    assert not r._fns


def test_renderer_mxu_temporal_perm_reuse():
    """mxu backend: frame 0 caches the cost-map permutation; later frames
    render on it probe-free and stay bit-exact to the plain kernel
    (perm only reassigns lanes).  replan() drops the cache."""
    from bevy_raytrace_tpu.kernels.mxu_render import render_mxu

    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="mxu", interpret=True)
    r.render_frame(scene, cam)  # frame 0: balanced + probe, caches perm
    assert r._perm is not None
    img1 = np.asarray(r.render_frame(scene, cam))  # frame 1: cached perm
    ref1 = np.asarray(render_mxu(scene, cam, CFG, 1, interpret=True))
    np.testing.assert_array_equal(img1, ref1)
    r.replan()
    assert r._perm is None


def test_renderer_mxu_frame0_rest_pass():
    """spp > probe size exercises frame 0's sample_base rest pass (the
    path a traced sample_base would break — caught on TPU in r3):
    frame 0 equals the self-contained balanced render bit-for-bit."""
    import dataclasses

    from bevy_raytrace_tpu.kernels.mxu_render import render_mxu_balanced

    cfg = dataclasses.replace(CFG, samples_per_pixel=32)
    scene, cam = _scene_cam()
    r = Renderer(cfg, backend="mxu", interpret=True)
    img0 = np.asarray(r.render_frame(scene, cam))
    ref0 = np.asarray(render_mxu_balanced(scene, cam, cfg, 0, interpret=True))
    np.testing.assert_array_equal(img0, ref0)


def test_renderer_mxu_auto_replan_interval():
    """replan_interval=N re-probes every N frames (VERDICT r4 item 4):
    the cached permutation is replaced on schedule, probe frames stay
    allclose to the plain kernel (probe-blend accumulation), cached
    frames stay bit-exact."""
    from bevy_raytrace_tpu.kernels.mxu_render import render_mxu

    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="mxu", interpret=True, replan_interval=2)

    def step(i):
        img = np.asarray(r.render_frame(scene, cam))
        ref = np.asarray(render_mxu(scene, cam, CFG, i, interpret=True))
        return img, ref

    img0, ref0 = step(0)  # probe frame -> caches perm (age 1)
    np.testing.assert_allclose(img0, ref0, atol=2e-4)
    perm0 = r._perm
    assert perm0 is not None

    img1, ref1 = step(1)  # cached (age 2): bit-exact
    np.testing.assert_array_equal(img1, ref1)
    assert r._perm is perm0

    img2, ref2 = step(2)  # age hit the interval -> re-probe
    np.testing.assert_allclose(img2, ref2, atol=2e-4)
    assert r._perm is not None and r._perm is not perm0
    perm2 = r._perm

    img3, ref3 = step(3)  # cached again
    np.testing.assert_array_equal(img3, ref3)
    assert r._perm is perm2


def test_renderer_mxu_replan_interval_off_by_default():
    """replan_interval=0 (default): probe once, never again — the prior
    sessions' semantics are unchanged."""
    scene, cam = _scene_cam()
    r = Renderer(CFG, backend="mxu", interpret=True)
    r.render_frame(scene, cam)
    perm0 = r._perm
    for _ in range(3):
        r.render_frame(scene, cam)
    assert r._perm is perm0
