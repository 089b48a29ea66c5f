#!/usr/bin/env python
"""Parameter sweep for the v3/v4 MXU kernel (dev tool, run on TPU).

Usage: python tools/sweep_mxu.py "tr=8,cs=32" "tr=8,cs=0" ...
Spec keys: tr (tile_rows), cs (cull chunk size, 0 = dense brute force),
sc (sphere_chunk for the dense path), spp, depth, mode:
  ''      — balanced render with probe reuse (the bench configuration)
  plain   — identity layout, no balancing
  inco    — balanced but cost-only sort (no Morton tiebreak)
  rounds  — report per-tile round counts instead of timing
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.kernels import mxu_render
from bevy_raytrace_tpu.kernels.clusters import cluster_scene
from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene


def run(spec):
    kv = dict(s.split("=") for s in spec.split(",") if "=" in s)
    tr = int(kv.get("tr", 8))
    cs = int(kv.get("cs", 0))
    sc = int(kv.get("sc", 256))
    spp = int(kv.get("spp", 32))
    depth = int(kv.get("depth", 8))
    probe = int(kv.get("p", 16))
    vp = int(kv.get("vp", mxu_render.V_PLANES))
    ru = int(kv.get("ru", mxu_render.ROUND_UNROLL))
    mode = kv.get("mode", "")

    config = RenderConfig(width=1200, height=800, samples_per_pixel=spp,
                          max_depth=depth)
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(config.aspect)
    plan = cluster_scene(scene, cluster_size=cs) if cs else None

    if mode == "plain":
        fn = jax.jit(functools.partial(
            mxu_render.render_mxu, tile_rows=tr, sphere_chunk=sc, plan=plan,
            v_planes=vp, round_unroll=ru),
            static_argnums=2)
    elif mode == "inco":
        orig = mxu_render.balance_perm
        mxu_render.balance_perm = functools.partial(orig, coherent=False)
        fn = jax.jit(functools.partial(
            mxu_render.render_mxu_balanced, tile_rows=tr, sphere_chunk=sc,
            probe_spp=probe, plan=plan, v_planes=vp, round_unroll=ru),
            static_argnums=2)
    else:
        fn = jax.jit(functools.partial(
            mxu_render.render_mxu_balanced, tile_rows=tr, sphere_chunk=sc,
            probe_spp=probe, plan=plan, v_planes=vp, round_unroll=ru),
            static_argnums=2)

    t0 = time.time()
    img = fn(scene, camera, config, 0)
    float(np.asarray(img[0, 0, 0]))  # D2H forces completion (the axon
    # tunnel's block_until_ready can phantom-return)
    compile_s = time.time() - t0
    times = []
    for i in range(2):
        t0 = time.time()
        img = fn(scene, camera, config, i + 1)
        float(np.asarray(img[0, 0, 0]))
        times.append(time.time() - t0)
    ft = min(times)
    rps = config.rays_per_frame / ft
    print(
        f"{spec:34s} compile={compile_s:6.1f}s frame={ft:.3f}s "
        f"rays/s={rps / 1e6:8.2f}M mean_px={float(np.asarray(img).mean()):.4f}",
        flush=True,
    )
    if mode == "inco":
        mxu_render.balance_perm = orig


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        try:
            run(spec)
        except Exception as e:
            print(f"{spec:34s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
