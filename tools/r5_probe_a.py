#!/usr/bin/env python
"""Round-5 probe A (compiled-on-TPU): int16 residual grad path + 8-row
auto sweep chunk.

1. small-config grad agreement: kernel backward vs xla backward, both
   compiled, int16 residuals;
2. flagship forward quick check with the new auto chunk (488 vs 512);
3. flagship grad at the FULL 256 spp, unchunked int16 recording;
4. reference workload at spp=256 (amortized fixed cost) with auto
   chunk 200.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch(x):
    return float(np.asarray(x).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.inverse import make_fast_renderer
    from bevy_raytrace_tpu.kernels import cluster_scene
    from bevy_raytrace_tpu.scenes import (
        reference_scene,
        rtiow_final_camera,
        rtiow_final_scene,
    )
    from bevy_raytrace_tpu.wavefront.engine import Renderer

    log(f"devices: {jax.devices()}")
    out = {}
    scene, _ = rtiow_final_scene(seed=0)
    plan = cluster_scene(scene, cluster_size=12)

    # --- 1. compiled grad agreement (int16 residuals) -------------------
    cfg = RenderConfig(width=240, height=160, samples_per_pixel=8,
                       max_depth=8, spp_chunk=1)
    cam = rtiow_final_camera(cfg.aspect)
    gs = {}
    for bw in ("kernel", "xla"):
        fast = make_fast_renderer(cfg, backward=bw, clusters=plan)

        def loss(centers, fast=fast):
            sc = dataclasses.replace(scene, centers=centers)
            return jnp.mean(fast(sc, cam, 1) ** 2)

        g = jax.jit(jax.grad(loss))(scene.centers)
        gs[bw] = np.asarray(g)
        log(f"grad[{bw}]: finite={np.isfinite(gs[bw]).all()} "
            f"norm={np.linalg.norm(gs[bw]):.6g}")
    d = np.abs(gs["kernel"] - gs["xla"])
    scale = np.abs(gs["xla"]).max()
    log(f"kernel vs xla backward: max_abs_diff={d.max():.3g} "
        f"(scale {scale:.3g}), rel={d.max() / scale:.3g}")
    out["grad_agree_rel"] = float(d.max() / scale)

    # --- 2. flagship forward quick (new auto chunk) ---------------------
    cfg_f = RenderConfig(width=1200, height=800, samples_per_pixel=16,
                         max_depth=8)
    cam_f = rtiow_final_camera(cfg_f.aspect)
    r = Renderer(cfg_f, backend="mxu")

    def frame(i):
        r.frame = i
        img = r.render_frame(scene, cam_f)
        fetch(img[0, 0, 0])
        return img

    t0 = time.time(); frame(0); log(f"flagship compile+probe {time.time()-t0:.1f}s")
    t0 = time.time(); frame(1); log(f"flagship warm {time.time()-t0:.1f}s")
    times = []
    for i in range(3):
        t0 = time.time(); frame(2 + i); times.append(time.time() - t0)
    rps = cfg_f.rays_per_frame / min(times)
    log(f"flagship fwd (auto chunk): {min(times):.3f}s = {rps/1e6:.1f}M rays/s "
        f"(r4 @16spp ~ {cfg_f.rays_per_frame/ (2073600*16/105.7e6) / 1e6:.0f}M-class)")
    out["flagship_spp16_rays_per_s"] = rps

    # --- 3. flagship grad, full 256 spp unchunked -----------------------
    cfg_g = RenderConfig(width=1200, height=800, samples_per_pixel=256,
                         max_depth=8, spp_chunk=4)
    cam_g = rtiow_final_camera(cfg_g.aspect)
    try:
        fast = make_fast_renderer(cfg_g, backward="kernel", clusters=plan)

        def loss(centers):
            sc = dataclasses.replace(scene, centers=centers)
            return jnp.mean(fast(sc, cam_g, 1) ** 2)

        g = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        _, gr = g(scene.centers)
        fetch(gr[0, 0])
        log(f"flagship grad 256spp: compile+first {time.time()-t0:.1f}s, "
            f"finite={bool(jnp.isfinite(gr).all())}")
        times = []
        for _ in range(2):
            t0 = time.time()
            _, gr = g(scene.centers)
            fetch(gr[0, 0])
            times.append(time.time() - t0)
        pps = cfg_g.rays_per_frame / min(times)
        log(f"flagship grad 256spp unchunked: {min(times):.3f}s/step = "
            f"{pps/1e6:.1f}M paths/s (r4 chunked: 10.1M; target >= 15M)")
        out["grad_flagship_256_paths_per_s"] = pps
    except Exception as e:  # noqa: BLE001
        log(f"flagship 256spp grad FAILED: {e}")
        out["grad_flagship_256_paths_per_s"] = None

    # --- 4. reference workload, spp=256, auto chunk 200 -----------------
    cfg_r = RenderConfig(width=1920, height=1080, samples_per_pixel=256,
                         max_depth=3)
    sc_r, _ = reference_scene(seed=0)
    cam_r = rtiow_final_camera(cfg_r.aspect)
    rr = Renderer(cfg_r, backend="mxu")

    def rframe(i):
        rr.frame = i
        fetch(rr.render_frame(sc_r, cam_r)[0, 0, 0])

    t0 = time.time(); rframe(0); log(f"ref compile+probe {time.time()-t0:.1f}s")
    t0 = time.time(); rframe(1); log(f"ref warm {time.time()-t0:.1f}s")
    times = []
    for i in range(2):
        t0 = time.time(); rframe(2 + i); times.append(time.time() - t0)
    rps = cfg_r.rays_per_frame / min(times)
    log(f"reference workload spp256: {min(times):.3f}s/frame = "
        f"{rps/1e6:.1f}M rays/s = {rps/124.416e6:.2f}x the implied bar")
    out["reference_spp256_rays_per_s"] = rps

    print(json.dumps(out))


if __name__ == "__main__":
    main()
