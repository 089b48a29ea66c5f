"""Scene builders for the BASELINE configs + the reference's exact scene.

Replaces `src/sphere.rs:37-148` (procedural RTiOW scene with seeded random
materials) and `src/ray_trace_materials.rs:83-127` (startup material cache).
Scene randomness uses numpy's PCG64 `default_rng(seed)` — deterministic
across hosts/platforms, unlike the reference's `rand::thread_rng()`
(`src/sphere.rs:45`) which reseeds every run.

Builders:
  baseline_config1_*  — BASELINE config 1: one Lambertian sphere + ground.
  baseline_config2_*  — BASELINE config 2: lambertian + metal + dielectric
                        (the RTiOW three-sphere chapter scene, including the
                        hollow-glass negative-radius inner sphere).
  rtiow_final_*       — BASELINE config 3: the RTiOW book-cover scene,
                        ~480 random spheres incl. dielectrics, defocus
                        camera (lookfrom (13,2,3), vfov 20, aperture 0.1).
  reference_scene     — bug-for-bug the *reference's* scene variant
                        (`src/sphere.rs`): 14x14 grid (not 22x22), 80%
                        lambertian else metal, NO dielectrics ever spawned
                        (the glass branch is commented-out C++,
                        `src/sphere.rs:101-120`), big spheres center=
                        lambertian(0.7,0.3,0.3), left/right=metal —
                        material palette from `ray_trace_materials.rs:83-127`.
"""

from __future__ import annotations

import numpy as np

from bevy_raytrace_tpu.core.camera import Camera
from bevy_raytrace_tpu.core.types import Scene, make_scene
from bevy_raytrace_tpu.scenes.registry import MaterialRegistry


def _build(spheres, registry: MaterialRegistry) -> Scene:
    """spheres: list of (center, radius, material_index)."""
    centers = np.array([s[0] for s in spheres], np.float32)
    radii = np.array([s[1] for s in spheres], np.float32)
    mats = np.array([s[2] for s in spheres], np.int32)
    m = registry.to_materials()
    return make_scene(centers, radii, mats, m.albedo, m.kind, m.fuzz, m.ior)


# --- BASELINE config 1: single Lambertian sphere + ground ------------------


def baseline_config1_scene():
    reg = MaterialRegistry()
    ground = reg.lambertian("ground", (0.5, 0.5, 0.5))
    ball = reg.lambertian("ball", (0.7, 0.3, 0.3))
    spheres = [
        ((0.0, -100.5, -1.0), 100.0, ground),
        ((0.0, 0.0, -1.0), 0.5, ball),
    ]
    return _build(spheres, reg), reg


def baseline_config1_camera(aspect):
    return Camera.look_at(
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        vfov_deg=90.0,
        aspect=aspect,
        aperture=0.0,
        focus_dist=1.0,
    )


# --- BASELINE config 2: lambertian + metal + dielectric --------------------


def baseline_config2_scene():
    reg = MaterialRegistry()
    ground = reg.lambertian("ground", (0.8, 0.8, 0.0))
    center = reg.lambertian("center", (0.1, 0.2, 0.5))
    left = reg.dielectric("left", ior=1.5)
    right = reg.metallic("right", (0.8, 0.6, 0.2), fuzz=0.0)
    spheres = [
        ((0.0, -100.5, -1.0), 100.0, ground),
        ((0.0, 0.0, -1.0), 0.5, center),
        ((-1.0, 0.0, -1.0), 0.5, left),
        # Hollow glass: negative radius flips the normal inward.
        ((-1.0, 0.0, -1.0), -0.45, left),
        ((1.0, 0.0, -1.0), 0.5, right),
    ]
    return _build(spheres, reg), reg


def baseline_config2_camera(aspect):
    return Camera.look_at(
        lookfrom=(-2.0, 2.0, 1.0),
        lookat=(0.0, 0.0, -1.0),
        vfov_deg=20.0,
        aspect=aspect,
        aperture=0.0,
    )


# --- BASELINE config 3: RTiOW final (book-cover) scene ---------------------


def rtiow_final_scene(seed: int = 0, grid: int = 11):
    """~480 spheres: ground + jittered grid + three heroes.

    Grid material mix per RTiOW: 80% diffuse (albedo = rand*rand),
    15% metal (albedo in [0.5,1], fuzz in [0,0.5)), 5% glass (ior 1.5).
    """
    rng = np.random.default_rng(seed)
    reg = MaterialRegistry()
    spheres = []

    ground = reg.lambertian("ground", (0.5, 0.5, 0.5))
    spheres.append(((0.0, -1000.0, 0.0), 1000.0, ground))

    for a in range(-grid, grid):
        for b in range(-grid, grid):
            center = (
                a + 0.9 * rng.random(),
                0.2,
                b + 0.9 * rng.random(),
            )
            if np.linalg.norm(np.array(center) - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            choose = rng.random()
            name = f"material_{a}_{b}"
            if choose < 0.8:
                albedo = rng.random(3) * rng.random(3)
                mat = reg.lambertian(name, tuple(albedo))
            elif choose < 0.95:
                albedo = 0.5 + 0.5 * rng.random(3)
                mat = reg.metallic(name, tuple(albedo), fuzz=0.5 * rng.random())
            else:
                mat = reg.dielectric(name, ior=1.5)
            spheres.append((center, 0.2, mat))

    glass = reg.dielectric("hero_glass", ior=1.5)
    diffuse = reg.lambertian("hero_diffuse", (0.4, 0.2, 0.1))
    metal = reg.metallic("hero_metal", (0.7, 0.6, 0.5), fuzz=0.0)
    spheres.append(((0.0, 1.0, 0.0), 1.0, glass))
    spheres.append(((-4.0, 1.0, 0.0), 1.0, diffuse))
    spheres.append(((4.0, 1.0, 0.0), 1.0, metal))

    return _build(spheres, reg), reg


def rtiow_final_camera(aspect):
    """RTiOW final viewpoint — also the reference's startup camera pose
    (13,2,3) looking at the origin (`src/camera.rs:31-37`)."""
    return Camera.look_at(
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        vfov_deg=20.0,
        aspect=aspect,
        aperture=0.1,
        focus_dist=10.0,
    )


# --- The reference's exact scene variant -----------------------------------


def reference_scene(seed: int = 0):
    """The scene `src/sphere.rs:37-148` actually builds (14x14 grid, no
    dielectrics), with the startup material palette of
    `src/ray_trace_materials.rs:83-127` and the same registry insertion
    order (ground, center, left, right, then grid materials)."""
    rng = np.random.default_rng(seed)
    reg = MaterialRegistry()
    ground = reg.lambertian("ground", (0.5, 0.5, 0.5))
    center = reg.lambertian("center", (0.7, 0.3, 0.3))
    left = reg.metallic("left", (0.8, 0.8, 0.8), fuzz=0.1)
    right = reg.metallic("right", (0.7, 0.6, 0.5), fuzz=0.0)

    spheres = [((0.0, -1000.0, -1.0), 1000.0, ground)]  # sphere.rs:38-44
    for a in range(-7, 7):  # sphere_dim = 7, sphere.rs:47-58
        for b in range(-7, 7):
            c = (a + 0.9 * rng.random(), 0.2, b + 0.9 * rng.random())
            if np.linalg.norm(np.array(c) - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            name = f"material_{a}_{b}"
            if rng.random() < 0.8:  # sphere.rs:61-74
                mat = reg.lambertian(name, tuple(rng.random(3)))
            else:  # sphere.rs:75-91
                mat = reg.metallic(name, tuple(rng.random(3)), fuzz=0.5 * rng.random())
            spheres.append((c, 0.2, mat))

    spheres.append(((0.0, 1.0, 0.0), 1.0, center))  # sphere.rs:125-131
    spheres.append(((-4.0, 1.0, 0.0), 1.0, left))  # sphere.rs:133-139
    spheres.append(((4.0, 1.0, 0.0), 1.0, right))  # sphere.rs:141-147
    return _build(spheres, reg), reg
