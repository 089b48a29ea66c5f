#!/usr/bin/env python
"""Gradient-step throughput probe (dev tool, run on TPU).

Times one jitted value_and_grad step (forward + backward) of the fast
renderer at a given config, for backward="kernel" (the fused Pallas
replay-gradient kernel) and backward="xla" (the jnp replay oracle), plus
the XLA wavefront for reference.

usage: python tools/grad_bench.py [W] [H] [spp] [depth] [paths...]
  paths: any of kernel,xla,wavefront (default: kernel,xla)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_raytrace_tpu import RenderConfig
from bevy_raytrace_tpu.inverse import make_fast_renderer
from bevy_raytrace_tpu.scenes import rtiow_final_camera, rtiow_final_scene
from bevy_raytrace_tpu.wavefront.render import render


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    paths = (sys.argv[5].split(",") if len(sys.argv) > 5
             else ["kernel", "xla"])

    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, spp_chunk=min(4, spp))
    scene, _ = rtiow_final_scene(seed=0)
    camera = rtiow_final_camera(cfg.aspect)

    def time_step(name, loss_fn):
        g = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.time()
        _, gr = g(scene.centers)
        float(np.asarray(gr[0, 0]))  # D2H forces completion
        compile_s = time.time() - t0
        if not bool(jnp.isfinite(gr).all()):
            print(f"{name:10s} NON-FINITE GRADS", flush=True)
            return
        times = []
        for _ in range(3):
            t0 = time.time()
            _, gr = g(scene.centers)
            float(np.asarray(gr[0, 0]))
            times.append(time.time() - t0)
        ft = min(times)
        print(f"{name:10s} compile={compile_s:6.1f}s step={ft:.3f}s "
              f"paths/s={cfg.rays_per_frame / ft / 1e6:7.2f}M", flush=True)

    for p in paths:
        if p == "wavefront":
            def loss_wf(centers):
                sc = dataclasses.replace(scene, centers=centers)
                return jnp.mean(render(sc, camera, cfg, 1) ** 2)
            time_step("wavefront", loss_wf)
        else:
            fast = make_fast_renderer(cfg, backward=p)

            def loss_fast(centers, fast=fast):
                sc = dataclasses.replace(scene, centers=centers)
                return jnp.mean(fast(sc, camera, 1) ** 2)
            time_step(p, loss_fast)


if __name__ == "__main__":
    main()
