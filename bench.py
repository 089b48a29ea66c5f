#!/usr/bin/env python
"""Benchmark harness: rays/sec/chip, headlined by the reference-equivalent
workload.

HEADLINE (value / vs_baseline): rays/s on the REFERENCE'S OWN frame —
its exact scene variant (14x14 grid, no dielectrics, ~197 spheres), its
1920x1080 resolution, its 3 bounce rounds (`src/lib.rs:25`,
`src/ray_trace_node.rs:213-217`) — so the number and its denominator
describe the SAME work (VERDICT r4 item 7).  vs_baseline: the reference
publishes no numbers (BASELINE.md: "none exist"), so the denominator is
its *implied* rate at its card-typical 60 FPS: 2,073,600 rays/frame x 60
= 124.4M rays/s (`src/ray_trace_rays.rs:50`).  Measured at spp=256:
per-sample throughput is spp-independent, and high spp amortizes the
~119 ms/frame fixed dispatch+D2H cost that the reference never pays at
all (it never reads its framebuffer back, `src/ray_trace_node.rs:218`;
pipelined dispatch cannot hide the cost through this environment's
serialized TPU tunnel — measured in tools/ref_probe.py).

NAMED FIELDS: the BASELINE.json flagship config — RTiOW final scene
(~486 spheres, defocus camera) at 1200x800, 256 spp, depth 8
(`flagship_rays_per_s`, ~2.5x the ray-sphere tests per path of the
reference frame) — plus gradient-step throughput (`grad_*`; the
reference has no gradients at all).

Backends (--backend):
  mxu    — the v3 fused whole-trace kernel (dense VPU sweep + one-hot MXU
           attribute gather + persistent-lane refill + cost balancing,
           `bevy_raytrace_tpu/kernels/mxu_render.py`).  Default on TPU.
  pallas — the v1 fused kernel (per-sphere SMEM loop, cluster-culled).
  xla    — the differentiable jnp wavefront (`wavefront/render.py`).
  auto   — mxu on TPU, xla elsewhere.

Unless --no-verify, a compiled (NOT interpret-mode) parity gate runs
first: a small config is rendered by all three backends and cross-checked
(median error, flipped-pixel fraction, mean bias — see VERIFY_* below),
so a wrong-image-fast-kernel regression fails the bench instead of
shipping a fast lie.  The JSON line carries "verify": "pass".

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}

Usage:
    python bench.py                 # full run (headline + flagship + grads)
    python bench.py --quick         # flagship at 16 spp (same rays/s)
    python bench.py --backend mxu|pallas|xla
Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_IMPLIED_RAYS_PER_SEC = 2_073_600 * 60.0  # see module docstring

# Compiled-parity gate config: small enough that the three extra compiles
# dominate its cost, big enough to cover every material + defocus blur.
VERIFY_W, VERIFY_H, VERIFY_SPP, VERIFY_DEPTH = 240, 160, 8, 8
# Compiled-vs-compiled tolerances.  Unlike the interpret-mode tests
# (test_mxu.py: atol 2e-4, bit-for-bit discrete decisions), compiled
# backends legally differ in fma contraction, which flips borderline
# DISCRETE path choices (hit-vs-miss at tangency, argmin near-ties,
# Schlick Bernoulli at the threshold) on rare pixels; each flip swaps in
# a different-but-valid Monte-Carlo sample with O(1/spp) pixel impact.
# Measured on v5e: median 2e-7, ~1% of pixels > 1e-2, mean bias < 1e-4.
# A genuinely wrong kernel (broken gather / material / RNG) blows all
# three of these by orders of magnitude.
VERIFY_MEDIAN = 1e-5      # typical pixel must match to f32 noise
VERIFY_BAD_FRAC = 0.02    # pixels allowed to differ > 1e-2 (flipped paths)
VERIFY_BAD_TOL = 1e-2
VERIFY_MEAN_BIAS = 5e-4   # |mean(a - b)| over the image: flips are noise,
                          # a systematic error is a bug


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_render_fn(backend, scene, cluster_size):
    """backend name -> uncompiled render(scene, camera, config, frame)."""
    import functools

    if backend == "mxu":
        from bevy_raytrace_tpu.kernels.mxu_render import render_mxu_balanced

        return render_mxu_balanced
    if backend == "pallas":
        from bevy_raytrace_tpu.kernels import cluster_scene, render_pallas

        clusters = None
        if cluster_size:
            clusters = cluster_scene(scene, cluster_size=cluster_size)
            log(
                f"cluster culling: {clusters.n_clusters} clusters x "
                f"{clusters.cluster_size}"
            )
        return functools.partial(render_pallas, clusters=clusters)
    from bevy_raytrace_tpu.wavefront.render import render

    return render


def run_verify(scene, camera_fn, cluster_size):
    """Compiled cross-backend parity on a small config -> "pass" (or exits).

    This is the on-hardware analog of the interpret-mode equivalence
    tests: Mosaic-compiled kernels can diverge from interpret mode
    (fma contraction, excess-precision folding — see mxu_render.py), and
    only a compiled-vs-compiled check catches that class.
    """
    import jax

    from bevy_raytrace_tpu import RenderConfig

    cfg = RenderConfig(
        width=VERIFY_W, height=VERIFY_H, samples_per_pixel=VERIFY_SPP,
        max_depth=VERIFY_DEPTH, spp_chunk=VERIFY_SPP,
    )
    camera = camera_fn(cfg.aspect)
    images = {}
    for backend in ("xla", "pallas", "mxu"):
        fn = jax.jit(make_render_fn(backend, scene, cluster_size),
                     static_argnums=2)
        t0 = time.time()
        images[backend] = np.asarray(
            jax.block_until_ready(fn(scene, camera, cfg, 0)))
        log(f"verify: {backend} rendered {VERIFY_W}x{VERIFY_H} "
            f"in {time.time() - t0:.1f}s (compile incl.)")
    for backend in ("pallas", "mxu"):
        d = images[backend] - images["xla"]
        err = np.abs(d).max(axis=-1)
        med = float(np.median(err))
        bad = float((err > VERIFY_BAD_TOL).mean())
        bias = float(np.abs(d.mean(axis=(0, 1))).max())
        ok = (np.isfinite(err).all() and med <= VERIFY_MEDIAN
              and bad <= VERIFY_BAD_FRAC and bias <= VERIFY_MEAN_BIAS)
        log(f"verify: {backend} vs xla: median={med:.2e} "
            f"frac>{VERIFY_BAD_TOL}={bad:.4f} mean_bias={bias:.2e} "
            f"-> {'ok' if ok else 'FAIL'}")
        if not ok:
            log(f"VERIFY FAILED: {backend} disagrees with xla")
            print(json.dumps({
                "metric": "verify failure", "value": med,
                "unit": "median_abs_err", "vs_baseline": 0.0,
                "verify": "fail",
            }))
            sys.exit(1)
    return "pass"


def run_grad_bench(scene, camera_fn):
    """Differentiable-path throughput: paths/s for one value_and_grad
    step (forward + backward).

    Three measurements (the reference has no gradients at all; BASELINE
    asks for backward throughput recorded):
      grad_fast    — Pallas forward + fused Pallas replay-gradient kernel
                     (kernels/replay_grad.py), at the historical
                     400x300x16spp comparison config;
      grad_xla     — jax.grad of the XLA wavefront at the same config;
      grad_flagship— the kernel path on the FULL flagship frame
                     (1200x800 x 256 spp, unchunked int16 residual
                     recording — r5), so the backward headline describes
                     exactly the forward flagship workload.
    Returns a dict of extra JSON fields; on failure the fields measured
    so far are kept (a flagship OOM must not discard the standard
    numbers) and the primary metric is never lost to a grad issue.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.inverse import make_fast_renderer
    from bevy_raytrace_tpu.wavefront.render import render

    from bevy_raytrace_tpu.kernels import cluster_scene

    # Cluster-culled forward traversal: +6% on the grad step (the v1
    # recording kernel walks fewer spheres; replay/backward unchanged).
    plan = cluster_scene(scene, cluster_size=12)
    cfg = RenderConfig(width=400, height=300, samples_per_pixel=16,
                       max_depth=8, spp_chunk=4)
    camera = camera_fn(cfg.aspect)
    fast = make_fast_renderer(cfg, backward="kernel", clusters=plan)

    def loss_fast(centers):
        sc = dataclasses.replace(scene, centers=centers)
        return jnp.mean(fast(sc, camera, 1) ** 2)

    def loss_xla(centers):
        sc = dataclasses.replace(scene, centers=centers)
        return jnp.mean(render(sc, camera, cfg, 1) ** 2)

    # The FULL flagship frame (1200x800 x 256 spp): int16 residuals (r5)
    # shrink the unchunked checkpoint to ~3.9 GB, so no spp-chunked
    # re-recording is needed — one recording forward, one fused replay
    # backward.
    cfg_big = RenderConfig(width=1200, height=800, samples_per_pixel=256,
                           max_depth=8, spp_chunk=4)
    camera_big = camera_fn(cfg_big.aspect)
    fast_big = make_fast_renderer(cfg_big, backward="kernel",
                                  clusters=plan)

    def loss_flagship(centers):
        sc = dataclasses.replace(scene, centers=centers)
        return jnp.mean(fast_big(sc, camera_big, 1) ** 2)

    out = {}

    def measure(name, fn, c):
        g = jax.jit(jax.value_and_grad(fn))
        _, gr = g(scene.centers)
        if not bool(jnp.isfinite(gr).all()):
            raise ValueError(f"{name}: non-finite gradients")
        times = []
        for _ in range(2):
            t0 = time.time()
            _, gr = g(scene.centers)
            float(np.asarray(gr[0, 0]))  # D2H forces completion
            times.append(time.time() - t0)
        pps = c.rays_per_frame / min(times)
        out[f"grad_{name}_paths_per_s"] = pps
        log(f"grad bench ({name}): {min(times):.3f}s/step, "
            f"{pps:,.0f} paths/s fwd+bwd "
            f"({c.width}x{c.height}x{c.samples_per_pixel}spp)")

    try:
        measure("fast", loss_fast, cfg)
        measure("xla", loss_xla, cfg)
        out["grad_fast_speedup"] = (out["grad_fast_paths_per_s"]
                                    / out["grad_xla_paths_per_s"])
    except Exception as e:  # noqa: BLE001
        log(f"grad bench failed (primary metric unaffected; "
            f"keeping fields measured so far): {e}")
    try:
        measure("flagship", loss_flagship, cfg_big)
    except Exception as e:  # noqa: BLE001
        # A 256-spp unchunked recording OOM must not lose the flagship
        # field: fall back to spp-chunked recording (same gradients up
        # to summation order, one extra forward spread over the chunks).
        log(f"flagship grad unchunked failed ({e}); retrying with "
            f"grad_spp_chunk=64")
        try:
            fast_chunked = make_fast_renderer(
                cfg_big, backward="kernel", clusters=plan,
                grad_spp_chunk=64)

            def loss_chunked(centers):
                sc = dataclasses.replace(scene, centers=centers)
                return jnp.mean(fast_chunked(sc, camera_big, 1) ** 2)

            measure("flagship", loss_chunked, cfg_big)
        except Exception as e2:  # noqa: BLE001
            log(f"flagship grad bench failed entirely (primary metric "
                f"unaffected): {e2}")
    return out


def run_reference_workload(spp=256):
    """The HEADLINE: rays/s on the REFERENCE'S OWN frame — its exact
    scene variant (14x14 grid, no dielectrics, ~197 spheres — scenes.
    reference_scene), 1920x1080, 3 bounce rounds (`src/lib.rs:25`,
    `src/ray_trace_node.rs:213-217`) — the apples-to-apples number
    against the implied 124.4M rays/s bar.

    spp=256 for measurement: per-sample throughput is spp-independent
    (the reference renders spp=1/frame and accumulates, `src/
    ray_trace_globals.rs:56-68`), and high spp amortizes this harness's
    ~119 ms fixed per-frame dispatch+D2H cost — cost the reference never
    pays (it never reads its framebuffer back,
    `src/ray_trace_node.rs:218`).  Measured structure sweep in
    tools/ref_probe.py: spp16 sync 107M = spp16 pipelined 107M (the
    tunnel serializes, pipelining hides nothing) < spp64 151M < spp256.
    Returns {} on failure."""
    import jax

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.scenes import reference_scene, rtiow_final_camera
    from bevy_raytrace_tpu.wavefront.engine import Renderer

    try:
        cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=spp,
                           max_depth=3)
        scene, _ = reference_scene(seed=0)
        cam = rtiow_final_camera(cfg.aspect)
        r = Renderer(cfg, backend="mxu")

        def frame(i):
            r.frame = i
            img = r.render_frame(scene, cam)
            float(np.asarray(img[0, 0, 0]))  # D2H forces completion

        frame(0)  # compile + probe
        frame(1)  # warm the cached-perm variant
        times = []
        for i in range(2):
            t0 = time.time()
            frame(i + 2)
            times.append(time.time() - t0)
        rps = cfg.rays_per_frame / min(times)
        log(f"reference-equivalent workload (1920x1080x{cfg.samples_per_pixel}"
            f"spp depth 3, {scene.count} spheres): {min(times):.3f}s/frame "
            f"-> {rps / 1e6:.1f}M rays/s "
            f"({rps / REFERENCE_IMPLIED_RAYS_PER_SEC:.2f}x the implied bar)")
        return {"reference_workload_rays_per_s": rps,
                "reference_workload_vs_baseline":
                    rps / REFERENCE_IMPLIED_RAYS_PER_SEC}
    except Exception as e:  # noqa: BLE001
        log(f"reference-workload bench failed: {e}")
        return {}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--quick", action="store_true", help="16 spp variant")
    # min() over repeats absorbs the ~5% frame-time jitter observed
    # through the tunnel; 3 steady-state frames cost ~10 s.
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--backend", choices=["auto", "xla", "pallas", "mxu"],
                   default="auto")
    p.add_argument("--ray-chunk", type=int, default=0)
    p.add_argument("--spp-chunk", type=int, default=0)
    p.add_argument("--cluster-size", type=int, default=12,
                   help="cluster-culled traversal (pallas; 0 = brute force)")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the compiled cross-backend parity gate")
    p.add_argument("--no-grad", action="store_true",
                   help="skip the gradient-step throughput measurement")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one timed frame "
                        "to DIR (open with XProf/Perfetto)")
    args = p.parse_args()
    if args.quick:
        args.spp = 16

    import jax

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene

    platform = jax.default_backend()
    log(f"backend platform: {platform}, devices: {jax.devices()}")

    num_pixels = args.width * args.height
    spp_chunk = args.spp_chunk or min(args.spp, 4)
    ray_chunk = args.ray_chunk
    if ray_chunk == 0:
        # Bound the [rays, spheres] workspace to ~256 MB (xla backend).
        target = 120_000 // spp_chunk * spp_chunk
        ray_chunk = num_pixels
        for cand in range(target, 0, -1):
            if num_pixels % cand == 0:
                ray_chunk = cand
                break

    config = RenderConfig(
        width=args.width,
        height=args.height,
        samples_per_pixel=args.spp,
        max_depth=args.depth,
        spp_chunk=spp_chunk,
        ray_chunk=ray_chunk,
    )
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(config.aspect)
    log(
        f"config: {args.width}x{args.height} x {args.spp}spp depth {args.depth}, "
        f"{scene.count} spheres, ray_chunk={ray_chunk}, spp_chunk={spp_chunk}"
    )

    backend = args.backend
    if backend == "auto":
        backend = "xla"
        if platform == "tpu":
            try:
                import bevy_raytrace_tpu.kernels.mxu_render  # noqa: F401

                backend = "mxu"
            except ImportError as e:
                # Degrade to the XLA wavefront rather than losing the
                # metric line entirely (e.g. a jax build without Mosaic).
                log(f"mxu backend unavailable ({e}); falling back to xla")

    # Pay the one-time tunnel warm-up (first D2H fetch) before timing.
    np.asarray(jax.jit(lambda: jax.numpy.zeros(8))())

    verify = "skipped"
    if not args.no_verify and platform == "tpu" and backend != "xla":
        verify = run_verify(scene, rtiow_final_camera, args.cluster_size)

    grad_fields = {}
    if not args.no_grad and platform == "tpu":
        grad_fields = run_grad_bench(scene, rtiow_final_camera)
    if platform == "tpu" and backend == "mxu":
        grad_fields.update(run_reference_workload())

    if backend == "mxu":
        # Steady-state session: the Renderer probes the cost map once on
        # frame 0 and renders later frames straight onto the cached
        # permutation (frames 1+ bit-exact to the unbalanced kernel;
        # frame 0's probe blend is allclose at f32 — wavefront/engine.py).
        # Frame timing below therefore measures what a real frame loop
        # sustains — probe amortized like compilation is.
        from bevy_raytrace_tpu.wavefront import Renderer

        renderer = Renderer(config, backend="mxu")

        def step(scene, camera, config, frame):
            renderer.frame = frame
            return renderer.render_frame(scene, camera)
    else:
        step = jax.jit(make_render_fn(backend, scene, args.cluster_size),
                       static_argnums=2)

    def run_frame(i):
        t0 = time.time()
        img = step(scene, camera, config, i)
        np.asarray(img[0, 0, 0])  # D2H forces completion (tunnel quirk)
        return img, time.time() - t0

    img, compile_and_first = run_frame(0)
    log(f"compile + first frame: {compile_and_first:.1f}s")
    if backend == "mxu":
        # Frame 1 compiles the full-spp cached-perm variant (a different
        # static config than frame 0's probe/rest passes) — warm it
        # untimed so every timed frame is compile-free.
        _, dt = run_frame(1)
        log(f"warm steady-state variant: {dt:.1f}s (untimed)")

    times = []
    for i in range(args.repeats):
        img, dt = run_frame(i + 2)
        times.append(dt)
        log(f"frame {i + 2}: {times[-1]:.3f}s")

    if args.trace:
        from bevy_raytrace_tpu.utils.metrics import trace_profile

        with trace_profile(args.trace):
            img = step(scene, camera, config, args.repeats + 5)
            np.asarray(img[0, 0, 0])  # D2H forces completion
        log(f"frame trace captured to {args.trace}")

    frame_time = min(times)
    paths = config.rays_per_frame
    rays_per_sec = paths / frame_time
    mean_px = float(np.asarray(img).mean())
    log(
        f"flagship paths/frame={paths:,} frame_time={frame_time:.3f}s "
        f"rays/s={rays_per_sec:,.0f} mean_pixel={mean_px:.4f}"
    )
    if not np.isfinite(mean_px) or mean_px <= 0:
        log("WARNING: suspicious image statistics")

    flagship_vs = rays_per_sec / REFERENCE_IMPLIED_RAYS_PER_SEC
    if "reference_workload_rays_per_s" in grad_fields:
        # Headline = the reference-equivalent workload (same work as the
        # denominator — VERDICT r4 item 7); the heavier flagship config
        # stays as named fields.
        value = grad_fields.pop("reference_workload_rays_per_s")
        vs = grad_fields.pop("reference_workload_vs_baseline")
        metric = ("camera rays (paths)/sec/chip on the reference's own "
                  "frame (1920x1080, depth 3, 197-sphere reference scene "
                  "variant, spp-amortized), backend=mxu; flagship_* = "
                  f"RTiOW final {args.width}x{args.height}x{args.spp}spp "
                  f"depth {args.depth}")
        grad_fields["flagship_rays_per_s"] = rays_per_sec
        grad_fields["flagship_vs_baseline"] = flagship_vs
    else:
        value, vs = rays_per_sec, flagship_vs
        metric = (f"camera rays (paths)/sec/chip, RTiOW final scene "
                  f"{args.width}x{args.height}x{args.spp}spp depth "
                  f"{args.depth}, backend={backend}")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": "rays/s",
                "vs_baseline": vs,
                "verify": verify,
                **grad_fields,
            }
        )
    )


if __name__ == "__main__":
    main()
