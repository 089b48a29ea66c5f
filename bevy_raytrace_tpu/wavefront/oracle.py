"""Slow, obviously-correct scalar oracle renderer (pure numpy).

An *independent* implementation of the same light transport, structured the
way RTiOW (and the reference's WGSL) expresses it — a per-path recursive
`ray_color` with a scalar loop over spheres (`intersect.wgsl:132-143`,
`shade.wgsl:199-258`) — rather than the vectorized wavefront formulation.
It consumes the *same* PCG4D counter streams as the wavefront engine, so
`render_oracle` and `wavefront.render` must agree to float tolerance on any
config: that is the golden-image correctness test (SURVEY.md §4 item 2).

Python-loop slow; use tiny configs (tests use <= 64x36 x 4 spp).
"""

from __future__ import annotations

import numpy as np

from bevy_raytrace_tpu.config import RenderConfig
from bevy_raytrace_tpu.core.types import DIELECTRIC, LAMBERTIAN, METALLIC
from bevy_raytrace_tpu.rng.pcg import pcg4d
from bevy_raytrace_tpu.wavefront.render import CAMERA_STREAM, FRAME_MIX


def _uniform4(pixel, sample, stream, seed):
    with np.errstate(over="ignore"):
        a, b, c, d = pcg4d(
            np.uint32(pixel), np.uint32(sample), np.uint32(stream), np.uint32(seed)
        )
    to_f = lambda v: np.float32(v >> np.uint32(8)) * np.float32(1.0 / 16777216.0)
    return to_f(a), to_f(b), to_f(c), to_f(d)


def _unit_vector(u1, u2):
    z = 1.0 - 2.0 * u1
    r = np.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u2
    return np.array([r * np.cos(phi), r * np.sin(phi), z], np.float64)


def _normalize(v):
    return v / np.linalg.norm(v)


def _hit_sphere(origin, direction, center, radius, t_min, t_max):
    """RTiOW half-b quadratic, near-then-far root (intersect.wgsl:94-130)."""
    oc = origin - center
    a = float(direction @ direction)
    half_b = float(oc @ direction)
    c = float(oc @ oc) - radius * radius
    disc = half_b * half_b - a * c
    if disc <= 0.0:
        return None
    sq = np.sqrt(disc)
    for root in ((-half_b - sq) / a, (-half_b + sq) / a):
        if t_min < root < t_max:
            return root
    return None


def _ray_color(scene_np, origin, direction, depth, pixel, sample, seed, cfg):
    centers, radii, mat_id, albedo, kind, fuzz, ior = scene_np
    bounce = cfg.max_depth - depth  # bounce index = RNG stream
    if depth == 0:
        return np.zeros(3)  # depth exhausted -> black (shade.wgsl:236-238)

    # nearest hit: linear scan, no partitioning (intersect.wgsl:132-143)
    best_t, best_i = cfg.t_max, -1
    for i in range(len(radii)):
        t = _hit_sphere(origin, direction, centers[i], radii[i], cfg.t_min, best_t)
        if t is not None:
            best_t, best_i = t, i

    unit_d = _normalize(direction)
    if best_i < 0:
        # sky gradient miss (shade.wgsl:189-197)
        t = 0.5 * (unit_d[1] + 1.0)
        return (1.0 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])

    point = origin + best_t * direction
    outward = (point - centers[best_i]) / radii[best_i]
    front_face = float(unit_d @ outward) < 0.0
    normal = outward if front_face else -outward

    m = mat_id[best_i]
    u1, u2, u3, u4 = _uniform4(pixel, sample, bounce, seed)

    if kind[m] == LAMBERTIAN:
        scatter_dir = normal + _unit_vector(u1, u2)
        if np.sum(np.abs(scatter_dir)) < 1e-8:
            scatter_dir = normal
        atten = albedo[m]
    elif kind[m] == METALLIC:
        reflected = unit_d - 2.0 * float(unit_d @ normal) * normal
        scatter_dir = reflected + fuzz[m] * _unit_vector(u1, u2) * np.cbrt(u3)
        if float(_normalize(scatter_dir) @ normal) <= 0.0:
            return np.zeros(3)  # absorbed below horizon
        atten = albedo[m]
    elif kind[m] == DIELECTRIC:
        ratio = (1.0 / ior[m]) if front_face else ior[m]
        cos_t = min(float(-unit_d @ normal), 1.0)
        sin_t = np.sqrt(max(0.0, 1.0 - cos_t * cos_t))
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        schlick = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
        if ratio * sin_t > 1.0 or schlick > u4:
            scatter_dir = unit_d - 2.0 * float(unit_d @ normal) * normal
        else:
            r_perp = ratio * (unit_d + cos_t * normal)
            r_par = -np.sqrt(abs(1.0 - float(r_perp @ r_perp))) * normal
            scatter_dir = r_perp + r_par
        atten = np.ones(3)
    else:
        raise ValueError(f"bad material kind {kind[m]}")

    scatter_dir = _normalize(scatter_dir)
    return atten * _ray_color(
        scene_np, point, scatter_dir, depth - 1, pixel, sample, seed, cfg
    )


def render_oracle(scene, camera, cfg: RenderConfig, frame: int = 0):
    """Render with per-path recursion; returns [H, W, 3] float64."""
    centers = np.asarray(scene.centers, np.float64)
    radii = np.asarray(scene.radii, np.float64)
    mat_id = np.asarray(scene.material_id)
    m = scene.materials
    scene_np = (
        centers,
        radii,
        mat_id,
        np.asarray(m.albedo, np.float64),
        np.asarray(m.kind),
        np.asarray(m.fuzz, np.float64),
        np.asarray(m.ior, np.float64),
    )
    cam_origin = np.asarray(camera.origin, np.float64)
    cam_u = np.asarray(camera.u, np.float64)
    cam_v = np.asarray(camera.v, np.float64)
    cam_w = np.asarray(camera.w, np.float64)
    half_w = float(camera.half_width)
    half_h = float(camera.half_height)
    lens_r = float(camera.lens_radius)
    focus = float(camera.focus_dist)

    with np.errstate(over="ignore"):
        seed = np.uint32(cfg.seed) + np.uint32(frame) * np.uint32(FRAME_MIX)

    img = np.zeros((cfg.height, cfg.width, 3))
    for y in range(cfg.height):
        for x in range(cfg.width):
            pixel = y * cfg.width + x
            acc = np.zeros(3)
            for sp in range(cfg.samples_per_pixel):
                cu1, cu2, cu3, cu4 = _uniform4(pixel, sp, CAMERA_STREAM, seed)
                s = (x + cu1) / cfg.width
                t = 1.0 - (y + cu2) / cfg.height
                target = (
                    cam_origin
                    - focus * cam_w
                    + (2.0 * s - 1.0) * half_w * focus * cam_u
                    + (2.0 * t - 1.0) * half_h * focus * cam_v
                )
                rd = np.sqrt(cu3)
                phi = 2.0 * np.pi * cu4
                offset = lens_r * (
                    rd * np.cos(phi) * cam_u + rd * np.sin(phi) * cam_v
                )
                origin = cam_origin + offset
                direction = _normalize(target - origin)
                acc += _ray_color(
                    scene_np, origin, direction, cfg.max_depth, pixel, sp, seed, cfg
                )
            img[y, x] = acc / cfg.samples_per_pixel
    return img
