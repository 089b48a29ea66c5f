#!/usr/bin/env python
"""Round-5 probe B (compiled-on-TPU):

1. the sharded fast-gradient path on the real chip (1-device mesh —
   validates the Mosaic compilation of the stripe-mode recording kernel
   + replay-gradient kernel under shard_map on hardware);
2. cost-balancing decay under camera motion and the auto-replan fix
   (VERDICT r4 item 4): orbit the camera 180 degrees over the reference
   workload and compare steady-state frame times with replan_interval=0
   (perm from the frame-0 pose, decaying) vs replan_interval=4 vs a
   fresh probe at the final pose.
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
    from jax.sharding import Mesh

    from bevy_raytrace_tpu import RenderConfig
    from bevy_raytrace_tpu.core.camera import Camera
    from bevy_raytrace_tpu.inverse import make_fast_renderer_sharded
    from bevy_raytrace_tpu.scenes import (
        reference_scene,
        rtiow_final_camera,
        rtiow_final_scene,
    )
    from bevy_raytrace_tpu.wavefront.engine import Renderer

    log(f"devices: {jax.devices()}")
    out = {}

    # --- 1. sharded fast grad, 1-device mesh on the real chip -----------
    scene, _ = rtiow_final_scene(seed=0)
    cfg = RenderConfig(width=256, height=128, samples_per_pixel=4,
                       max_depth=6)
    cam = rtiow_final_camera(cfg.aspect)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("hosts", "chips"))
    fast = make_fast_renderer_sharded(cfg, mesh)

    def loss(centers):
        sc = dataclasses.replace(scene, centers=centers)
        return jnp.mean(fast(sc, cam, 1) ** 2)

    g = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    lval, gr = g(scene.centers)
    fetch(gr[0, 0])
    ok = bool(jnp.isfinite(gr).all()) and np.isfinite(float(lval))
    log(f"sharded fast grad on TPU (1-dev mesh): compile+step "
        f"{time.time() - t0:.1f}s, finite={ok}, "
        f"|g|max={float(jnp.abs(gr).max()):.3e}")
    out["sharded_fast_grad_tpu_ok"] = bool(ok)

    # --- 2. balanced-perm decay under orbit + auto-replan ---------------
    cfg_r = RenderConfig(width=1920, height=1080, samples_per_pixel=64,
                         max_depth=3)
    sc_r, _ = reference_scene(seed=0)

    def orbit_cam(i, n=12):
        ang = np.pi * i / n  # 180 degrees over n frames
        return Camera.look_at(
            lookfrom=(13.0 * np.cos(ang), 2.0, 13.0 * np.sin(ang) + 3.0),
            lookat=(0.0, 0.0, 0.0), vfov_deg=20.0, aspect=cfg_r.aspect,
            aperture=0.1, focus_dist=10.0)

    def run_orbit(interval, frames=12):
        r = Renderer(cfg_r, backend="mxu", replan_interval=interval)
        times = []
        for i in range(frames):
            t0 = time.time()
            r.frame = i
            fetch(r.render_frame(sc_r, orbit_cam(i))[0, 0, 0])
            times.append(time.time() - t0)
        return r, times

    # Warm compiles once (interval=0 session compiles probe + permed).
    r0, t_noreplan = run_orbit(0)
    log("orbit interval=0 times: "
        + " ".join(f"{t:.2f}" for t in t_noreplan))
    _, t_replan = run_orbit(4)
    log("orbit interval=4 times: "
        + " ".join(f"{t:.2f}" for t in t_replan))

    # Fresh-probe reference at the FINAL pose: replan, probe frame at
    # pose 11, then time cached frames at that same pose.
    r0.replan()
    r0.frame = 11
    fetch(r0.render_frame(sc_r, orbit_cam(11))[0, 0, 0])  # probe
    fresh = []
    for k in range(3):
        t0 = time.time()
        r0.frame = 12 + k
        fetch(r0.render_frame(sc_r, orbit_cam(11))[0, 0, 0])
        fresh.append(time.time() - t0)
    t_fresh = min(fresh)
    # Late-orbit steady state (poses 9-11, camera ~135-180 deg from the
    # probe pose), cached frames only (interval=4 probes at 0,4,8).
    late_stale = min(t_noreplan[9:12])
    late_replan = min(t_replan[9:12])
    log(f"late-orbit frame time: stale-perm {late_stale:.3f}s, "
        f"auto-replan {late_replan:.3f}s, fresh-probe {t_fresh:.3f}s")
    out["orbit_stale_s"] = late_stale
    out["orbit_replan_s"] = late_replan
    out["orbit_fresh_s"] = t_fresh
    out["replan_within_fresh"] = late_replan / t_fresh

    print(json.dumps(out))


if __name__ == "__main__":
    main()
