#!/usr/bin/env python
"""Round-5 probe: reference-workload measurement structure + sweep chunks.

VERDICT r4 item 1: the 0.85x reference-workload number carries ~65 ms of
fixed per-frame dispatch+D2H cost in every timed frame (21% at spp=16),
while the reference never reads its framebuffer back at all
(`/root/reference/src/ray_trace_node.rs:218`).  This probe measures, on
the reference's OWN frame (1920x1080, depth 3, 197 spheres —
scenes.reference_scene):

  A. sync frame loop (the r4 measurement): dispatch, fetch, repeat;
  B. pipelined steady state (depth-2 software pipeline — dispatch frame
     N+1 before fetching frame N, the `cli animate` double-buffer
     pattern);
  C. both of the above at spp=64 (amortizes fixed cost like the 256-spp
     flagship does);
  D. sweep-chunk granularity: the auto-size pads 197 -> 256 sphere rows
     (23% dud); Mosaic's sublane granularity is 8, so chunk 200/208/224
     are legal — measure them against 256.

Usage: python tools/ref_probe.py [--skip-chunks] [--frames N]
Output: human-readable lines to stderr, one JSON summary line to stdout.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch(img):
    # The axon tunnel can phantom-return from block_until_ready; a real
    # scalar D2H fetch is the only reliable completion barrier.
    float(np.asarray(img[0, 0, 0]))


def time_sync(step, frames, first_frame):
    times = []
    for i in range(frames):
        t0 = time.time()
        img = step(first_frame + i)
        fetch(img)
        times.append(time.time() - t0)
    return min(times)


def time_pipelined(step, frames, first_frame):
    """Depth-2 software pipeline: dispatch N+1 before fetching N."""
    prev = step(first_frame)  # fill the pipeline (untimed dispatch)
    t0 = time.time()
    for i in range(frames):
        cur = step(first_frame + 1 + i)
        fetch(prev)
        prev = cur
    fetch(prev)
    # frames+1 fetches happened inside the timed region but only `frames`
    # full frame slots: charge the drain fetch to the last slot.
    return (time.time() - t0) / (frames + 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--skip-chunks", action="store_true")
    p.add_argument("--skip-spp64", action="store_true")
    args = p.parse_args()

    import jax

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.scenes import reference_scene, rtiow_final_camera
    from bevy_raytrace_tpu.wavefront.engine import Renderer

    log(f"devices: {jax.devices()}")
    scene, _ = reference_scene(seed=0)
    out = {}

    for spp in ([16] if args.skip_spp64 else [16, 64]):
        cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=spp,
                           max_depth=3)
        cam = rtiow_final_camera(cfg.aspect)
        r = Renderer(cfg, backend="mxu")

        def step(i, r=r, scene=scene, cam=cam):
            r.frame = i
            return r.render_frame(scene, cam)

        t0 = time.time()
        fetch(step(0))  # compile + probe
        log(f"spp={spp}: compile+probe frame: {time.time() - t0:.1f}s")
        t0 = time.time()
        fetch(step(1))  # warm the cached-perm variant
        log(f"spp={spp}: warm cached-perm variant: {time.time() - t0:.1f}s")

        t_sync = time_sync(step, args.frames, 2)
        rps_sync = cfg.rays_per_frame / t_sync
        log(f"spp={spp}: sync       {t_sync:.3f}s/frame = "
            f"{rps_sync / 1e6:.1f}M rays/s")
        t_pipe = time_pipelined(step, args.frames, 2 + args.frames)
        rps_pipe = cfg.rays_per_frame / t_pipe
        log(f"spp={spp}: pipelined  {t_pipe:.3f}s/frame = "
            f"{rps_pipe / 1e6:.1f}M rays/s")
        out[f"spp{spp}_sync_rays_per_s"] = rps_sync
        out[f"spp{spp}_pipelined_rays_per_s"] = rps_pipe

    if not args.skip_chunks:
        from bevy_raytrace_tpu.kernels.mxu_render import render_mxu_with_len

        cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=16,
                           max_depth=3)
        cam = rtiow_final_camera(cfg.aspect)
        for chunk in (200, 208, 224, 256):
            try:
                fn = jax.jit(functools.partial(
                    render_mxu_with_len, sphere_chunk=chunk,
                    track_len=False), static_argnums=2)
                t0 = time.time()
                img, _ = fn(scene, cam, cfg, 0)
                fetch(img)
                log(f"chunk={chunk}: compile+first {time.time() - t0:.1f}s")
                times = []
                for i in range(3):
                    t0 = time.time()
                    img, _ = fn(scene, cam, cfg, i + 1)
                    fetch(img)
                    times.append(time.time() - t0)
                rps = cfg.rays_per_frame / min(times)
                log(f"chunk={chunk}: {min(times):.3f}s/frame = "
                    f"{rps / 1e6:.1f}M rays/s")
                out[f"chunk{chunk}_rays_per_s"] = rps
            except Exception as e:  # noqa: BLE001
                log(f"chunk={chunk}: FAILED: {e}")
                out[f"chunk{chunk}_rays_per_s"] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
