#!/usr/bin/env python
"""Per-round cost decomposition of the v3 kernel (dev tool, run on TPU).

Pins `max_rounds` BELOW natural completion so every tile executes exactly
that many rounds, then times the kernel under each debug_expr probe:

  full        — production round
  loop_only   — scf.while scaffolding + state-plane round trip only
  nosweep     — round minus the dense intersection sweep
  nogather    — round minus the one-hot MXU attribute gather
  noshade     — sweep + gather only (no shade/scatter math)
  full_fori   — same body, scf.for (no per-round scalar work-flag sync)

usage: python tools/round_probe.py [spp] [max_rounds] [tile_rows]
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
from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    max_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    tr = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    config = RenderConfig(width=1200, height=800, samples_per_pixel=spp,
                          max_depth=8)
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(config.aspect)
    p_pad = mxu_render.lane_pad(config.num_pixels, tr, 1)
    pids = jnp.arange(p_pad, dtype=jnp.int32).reshape(p_pad // 128, 128)
    n_tiles = p_pad // (tr * 128)
    rounds_total = n_tiles * max_rounds

    # (r3 one-shot probes swp_nosqrt/swp_float measured sqrt at 0.7us
    # and key packing at ~0 before being removed from the kernel; see
    # BENCHMARKS.md.)
    probes = [("full", None), ("loop_only", "loop_only"),
              ("nosweep", "nosweep"), ("nogather", "nogather"),
              ("noshade", "noshade"), ("full_fori", "full_fori")]
    base = None
    for name, expr in probes:
        fn = jax.jit(functools.partial(
            mxu_render.render_mxu_lanes, tile_rows=tr, v_planes=1,
            max_rounds=max_rounds, debug_expr=expr), static_argnums=2)
        try:
            jax.block_until_ready(fn(scene, camera, config, pids, 0))
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        times = []
        for i in range(3):
            t0 = time.time()
            fb, _ = fn(scene, camera, config, pids, i + 1)
            # force completion: a D2H scalar fetch (block_until_ready can
            # phantom-return through the axon tunnel)
            float(np.asarray(fb[0, 0]))
            times.append(time.time() - t0)
        dt = min(times)
        us = dt / rounds_total * 1e6
        if name == "full":
            base = us
        delta = "" if base is None or name == "full" else (
            f"  (full - this = {base - us:+.2f} us)")
        print(f"{name:10s} {dt:7.3f}s  {us:6.2f} us/round/tile{delta}",
              flush=True)


if __name__ == "__main__":
    main()
