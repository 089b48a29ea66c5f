"""Metrics, timing, and profiling hooks.

The reference's observability is Bevy's FrameTimeDiagnosticsPlugin printing
FPS to stdout (`src/lib.rs:40-41`) plus buffer-size println!s
(`src/ray_trace_rays.rs:64-69`).  Here: structured per-frame metrics
(rays/s, per-frame ms, derived ray-bounce and ray-sphere-test rates) and a
`jax.profiler` trace context for XProf/Perfetto capture (SURVEY.md §5
tracing plan).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import List, Optional

import jax


@dataclasses.dataclass
class RenderMetrics:
    frame_time_s: float
    rays_per_frame: int
    max_depth: int
    n_spheres: int

    @property
    def rays_per_sec(self) -> float:
        return self.rays_per_frame / self.frame_time_s

    @property
    def ray_bounces_per_sec(self) -> float:
        """Dense wavefront: every ray runs every bounce round (masked)."""
        return self.rays_per_sec * self.max_depth

    @property
    def sphere_tests_per_sec(self) -> float:
        return self.ray_bounces_per_sec * self.n_spheres

    def line(self) -> str:
        return (
            f"frame {self.frame_time_s * 1e3:8.2f} ms | "
            f"{self.rays_per_sec:12,.0f} rays/s | "
            f"{self.sphere_tests_per_sec:14,.0f} ray-sphere tests/s"
        )


class FrameTimer:
    """Times jitted render steps with block_until_ready semantics."""

    def __init__(self, config, n_spheres: int):
        self.config = config
        self.n_spheres = n_spheres
        self.history: List[RenderMetrics] = []

    def time_frame(self, fn, *args, **kw):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        dt = time.perf_counter() - t0
        m = RenderMetrics(
            frame_time_s=dt,
            rays_per_frame=self.config.rays_per_frame,
            max_depth=self.config.max_depth,
            n_spheres=self.n_spheres,
        )
        self.history.append(m)
        return out, m

    @property
    def best(self) -> Optional[RenderMetrics]:
        if not self.history:
            return None
        return min(self.history, key=lambda m: m.frame_time_s)


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a jax.profiler trace (open with XProf / Perfetto).

    Usage:
        with trace_profile("/tmp/brt_trace"):
            img = step(scene, camera, 0)
            img.block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
