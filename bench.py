#!/usr/bin/env python
"""Benchmark harness: rays/sec/chip on the BASELINE workload.

Workload (BASELINE.json primary metric): RTiOW final scene (~486 spheres,
defocus camera) at 1200x800, 256 spp, depth 8 — the wavefront traces
W*H*spp = 245.76M paths/frame, 8 bounce rounds each, brute-force over all
spheres (no BVH, same as the reference's linear scan,
`/root/reference/assets/shaders/intersect.wgsl:132-143`).

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

value = camera paths per second per chip (W*H*spp / frame_time).
vs_baseline: the reference publishes no numbers (BASELINE.md: "none
exist"), so the denominator is the reference's *implied* workload at its
card-typical 60 FPS: 2,073,600 rays/frame x 60 = 124.4M rays/s
(`/root/reference/src/ray_trace_rays.rs:50`, `src/lib.rs:25-26`).

Usage:
    python bench.py                 # full BASELINE config (256 spp)
    python bench.py --quick         # same scene/res, 16 spp (same rays/s)
    python bench.py --backend pallas|xla   # kernel path (default: best)
Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_IMPLIED_RAYS_PER_SEC = 2_073_600 * 60.0  # see module docstring


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1200)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--spp", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--quick", action="store_true", help="16 spp variant")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto")
    p.add_argument("--ray-chunk", type=int, default=0)
    p.add_argument("--spp-chunk", type=int, default=0)
    p.add_argument("--cluster-size", type=int, default=12,
                   help="cluster-culled traversal (pallas; 0 = brute force)")
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
        # Bound the [rays, spheres] workspace to ~256 MB.
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
        try:
            if platform == "tpu":
                import bevy_raytrace_tpu.kernels  # noqa: F401

                backend = "pallas"
        except ImportError:
            pass

    if backend == "pallas":
        import functools

        from bevy_raytrace_tpu.kernels import cluster_scene, render_pallas

        clusters = None
        if args.cluster_size:
            clusters = cluster_scene(scene, cluster_size=args.cluster_size)
            log(
                f"cluster culling: {clusters.n_clusters} clusters x "
                f"{clusters.cluster_size}"
            )
        render_fn = functools.partial(render_pallas, clusters=clusters)
    else:
        from bevy_raytrace_tpu.wavefront.render import render as render_fn

    step = jax.jit(render_fn, static_argnums=2)

    # Pay the one-time tunnel warm-up (first D2H fetch) before timing.
    np.asarray(jax.jit(lambda: jax.numpy.zeros(8))())

    t0 = time.time()
    img = jax.block_until_ready(step(scene, camera, config, 0))
    compile_and_first = time.time() - t0
    log(f"compile + first frame: {compile_and_first:.1f}s")

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        img = jax.block_until_ready(step(scene, camera, config, i + 1))
        times.append(time.time() - t0)
        log(f"frame {i + 1}: {times[-1]:.3f}s")

    frame_time = min(times)
    paths = config.rays_per_frame
    rays_per_sec = paths / frame_time
    mean_px = float(np.asarray(img).mean())
    log(
        f"paths/frame={paths:,} frame_time={frame_time:.3f}s "
        f"rays/s={rays_per_sec:,.0f} mean_pixel={mean_px:.4f} "
        f"ray_bounce_sphere_tests/s={rays_per_sec * args.depth * scene.count:,.0f}"
    )
    if not np.isfinite(mean_px) or mean_px <= 0:
        log("WARNING: suspicious image statistics")

    print(
        json.dumps(
            {
                "metric": (
                    f"camera rays (paths)/sec/chip, RTiOW final scene "
                    f"{args.width}x{args.height}x{args.spp}spp depth {args.depth}, "
                    f"backend={backend}"
                ),
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / REFERENCE_IMPLIED_RAYS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
