#!/usr/bin/env python
"""Mean live-chunk fraction under phase-A culling (dev tool, run on TPU).

Answers: with cost-sorted Morton-coherent tiles, how many sphere chunks
does a tile actually sweep per round?  This is the savings ceiling of the
culled traversal (the dense sweep is ~85% of the round — tools/
round_probe.py).

usage: python tools/livechunks.py [cluster_size] [spp] [max_rounds]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.kernels import mxu_render
from bevy_raytrace_tpu.kernels.clusters import cluster_scene
from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene


def main():
    cs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    tr = 8

    config = RenderConfig(width=1200, height=800, samples_per_pixel=spp,
                          max_depth=8)
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(config.aspect)
    plan = cluster_scene(scene, cluster_size=cs)
    print(f"plan: {plan.n_clusters} chunks x {cs}", flush=True)

    # cost map -> coherent balanced perm (the production layout)
    _, len_map = jax.jit(functools.partial(
        mxu_render.render_mxu_with_len, v_planes=1), static_argnums=2)(
        scene, camera, config, 0)
    perm = mxu_render.balance_perm(len_map)

    p_pad = mxu_render.lane_pad(config.num_pixels, tr, 1)
    pids = jnp.concatenate([
        jnp.asarray(perm, jnp.int32),
        jnp.arange(config.num_pixels, p_pad, dtype=jnp.int32)])
    grid = pids.reshape(p_pad // 128, 128)

    for name, pg in (("coherent", grid),
                     ("identity", jnp.arange(p_pad, dtype=jnp.int32
                                             ).reshape(p_pad // 128, 128))):
        fn = jax.jit(functools.partial(
            mxu_render.render_mxu_lanes, tile_rows=tr, v_planes=1,
            plan=plan, max_rounds=max_rounds, debug_expr="livechunks"),
            static_argnums=2)
        _, ln = fn(scene, camera, config, pg, 0)
        ln = np.asarray(ln)  # per-lane: sum over rounds of live cnt / spp
        per_tile = ln.reshape(-1, tr * 128)[:, 0] * spp / max_rounds
        print(f"{name:9s} mean live chunks/round: {per_tile.mean():6.2f} "
              f"/ {plan.n_clusters}  (fraction {per_tile.mean() / plan.n_clusters:.2%}; "
              f"p90 {np.percentile(per_tile, 90) / plan.n_clusters:.2%})",
              flush=True)


if __name__ == "__main__":
    main()
