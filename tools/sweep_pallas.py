#!/usr/bin/env python
"""Parameter sweep for the Pallas kernel (dev tool, run on TPU).

Usage: python tools/sweep_pallas.py "tr=16,cs=12" "tr=8,cs=12" ...
Each spec is comma-separated k=v pairs: tr (tile_rows), cs (cluster_size,
0 = brute force), un (unroll), spp, depth.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.kernels import cluster_scene, render_pallas
from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene


def run(spec):
    kv = dict(s.split("=") for s in spec.split(","))
    tr = int(kv.get("tr", 16))
    cs = int(kv.get("cs", 12))
    un = int(kv.get("un", 6))
    spp = int(kv.get("spp", 16))
    depth = int(kv.get("depth", 8))
    mode = kv.get("mode", "")

    import bevy_raytrace_tpu.kernels.clusters as cl

    real_bounds = cl.cluster_bounds
    if mode == "noB":  # bounds never hit -> empty worklist (times phase A)
        def fake(centers, radii, plan):
            bx, by, bz, kq = real_bounds(centers, radii, plan)
            return bx, by, bz, kq + 1e30
        cl.cluster_bounds = fake
    elif mode == "allB":  # bounds always hit -> worklist = all clusters
        def fake(centers, radii, plan):
            bx, by, bz, kq = real_bounds(centers, radii, plan)
            return bx, by, bz, kq - 1e12
        cl.cluster_bounds = fake
    else:
        cl.cluster_bounds = real_bounds
    config = RenderConfig(width=1200, height=800, samples_per_pixel=spp,
                          max_depth=depth)
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(config.aspect)
    clusters = cluster_scene(scene, cluster_size=cs) if cs else None
    fn = jax.jit(
        functools.partial(render_pallas, clusters=clusters, tile_rows=tr,
                          unroll=un),
        static_argnums=2,
    )
    t0 = time.time()
    img = jax.block_until_ready(fn(scene, camera, config, 0))
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        t0 = time.time()
        img = jax.block_until_ready(fn(scene, camera, config, i + 1))
        times.append(time.time() - t0)
    ft = min(times)
    rps = config.rays_per_frame / ft
    print(
        f"{spec:30s} compile={compile_s:6.1f}s frame={ft:.3f}s "
        f"rays/s={rps / 1e6:8.2f}M mean_px={float(np.asarray(img).mean()):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        try:
            run(spec)
        except Exception as e:
            print(f"{spec:30s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
