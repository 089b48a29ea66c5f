"""Ray-sphere intersection (the reference's `intersect` stage).

Replaces `assets/shaders/intersect.wgsl:94-143`: the RTiOW half-b quadratic
per sphere, near-then-far root selection against [t_min, t_max], outward
normal `(p - c)/r`, front-face flip, material id carry, and a brute-force
scan over all spheres ("The world isn't partitioned in any way",
`intersect.wgsl:132-143` — no BVH, same here: RTiOW scenes are ~500 spheres
and a dense [rays, spheres] sweep is exactly what the TPU wants).

TPU-first formulation: instead of a per-thread loop over spheres, the whole
[R, N] test matrix is expressed so its two inner products are [R,3]x[3,N]
matmuls (MXU) and everything else is fused elementwise (VPU):

    half_b[r,n] = (o_r - c_n) . d_r = (o_r . d_r)      - (d @ C^T)[r,n]
    c_q   [r,n] = |o_r|^2 - 2 (o @ C^T)[r,n] + (|c_n|^2 - rad_n^2)

The nearest hit is a masked min + argmin over the sphere axis — the
reduction fuses with its producers, so the [R,N] workspace is bounded by
the two matmul outputs; callers bound R via RenderConfig.ray_chunk.

Differentiability: `t` is smooth in (origin, dir, centers, radii) on the
interior of each hit region; the argmin/root-choice/hit masks are piecewise
constant (gradients follow the sampled discrete structure, matching finite
differences away from silhouettes — SURVEY.md §7 "hard parts").  All
`sqrt`/`div` sites use the double-where guard so masked-out lanes cannot
poison gradients with NaNs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from bevy_raytrace_tpu.core.types import Hit, Ray, Scene


def intersect_scene(ray: Ray, scene: Scene, t_min: float, t_max: float) -> Hit:
    """Nearest-hit query for a ray batch against every sphere.

    ray.origin/dir: [R,3]; returns Hit with [R]-batched fields.
    Delegates to `intersect_scene_fused` (single winner-row gather);
    hot loops that also need the material parameters should call the
    fused form directly with a prebuilt `sphere_table` so the table is
    hoisted out of the bounce scan.
    """
    table = sphere_table(scene.centers, scene.radii, scene.materials,
                         scene.material_id)
    hit, _, _, _, _ = intersect_scene_fused(ray, scene, t_min, t_max, table)
    return hit


@jax.custom_vjp
def gather_rows(tbl, idx):
    """tbl[idx] with an MXU-shaped transpose.

    The default transpose of a row gather is a scatter-add of R updates
    into the small per-sphere table — slow on TPU.  This VJP accumulates
    the cotangents with an exact f32 one-hot matmul ([S, R] @ [R, C] on
    the MXU) instead; products with a 0/1 one-hot are exactly the
    incoming cotangents (3 exact bf16 limb passes — see
    _gather_rows_bwd), so this matches the scatter-add up to summation
    order.  Measured on v5e: the residual-replay gradient step went
    3.15M -> 4.1M paths/s from this transpose alone.

    Note: as a custom_vjp primitive this supports reverse-mode AD only;
    forward-mode (jax.jvp / jax.hessian through the renderer) is not
    part of the supported surface (BASELINE needs grad, not jvp).
    """
    return tbl[idx]


def _gather_rows_fwd(tbl, idx):
    return tbl[idx], (idx, tbl.shape[0])


def _trunc_top8(v):
    """Keep the top 8 mantissa bits of f32 (exactly bf16-representable).

    Integer masking, NOT a bf16 round-trip: under TPU XLA's
    --xla_allow_excess_precision=true the round-trip `v - f32(bf16(v))`
    may legally fold to zero (same hazard the mxu kernel's limb split
    documents)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    return jax.lax.bitcast_convert_type(bits & np.int32(~0xFFFF),
                                        jnp.float32)


def split_bf16_limbs(v):
    """f32 -> three exactly-bf16-representable f32 limbs, hi+mid+lo == v
    bit-for-bit.

    THE shared limb splitter for every exact-bf16-MXU trick in the tree
    (the gather transpose below, the v3 kernel's attribute tables, the
    replay-gradient kernel's cotangent contraction): products of an
    exact 0/1 one-hot with bf16 limbs are exact and f32 = hi+mid+lo
    reassembles exactly.  Must stay integer-masked (see _trunc_top8's
    excess-precision note); safe to call inside Pallas kernels."""
    hi = _trunc_top8(v)
    r1 = v - hi
    mid = _trunc_top8(r1)
    lo = r1 - mid
    return hi, mid, lo


# The one-hot transpose materializes an [R_chunk, S] bf16 operand; cap it
# (default ~64 MB per chunk) so full-resolution gradients (R ~ 1M rays)
# never hold a ~1 GB one-hot per bounce residual (same memory-bounding
# spirit as fast_grad._REMAT_BYTES).  Chunks accumulate in f32 —
# identical to the unchunked matmul up to summation order.
# Configurable (ADVICE/VERDICT r4 hygiene): env BRT_ONEHOT_CHUNK_MB at
# import, or set_onehot_chunk_mb() before tracing (larger = fewer, bigger
# matmuls; smaller = tighter transient-memory bound).
import os as _os

_ONEHOT_ELEMS = (int(_os.environ.get("BRT_ONEHOT_CHUNK_MB", "64"))
                 * 1024 * 1024 // 2)  # bf16 elements


def set_onehot_chunk_mb(mb: int) -> None:
    """Set the gather-transpose one-hot chunk budget (MB of bf16).

    Takes effect at the next trace of a gradient through `gather_rows`;
    already-compiled functions keep the cap they were traced with."""
    global _ONEHOT_ELEMS
    if mb <= 0:
        raise ValueError(f"chunk budget must be positive, got {mb} MB")
    _ONEHOT_ELEMS = mb * 1024 * 1024 // 2


def _gather_rows_bwd(saved, g):
    idx, s_rows = saved
    # bf16 one-hot (exact 0/1) x 3 exact bf16 limbs of g: each product is
    # exact, f32 accumulation is exact, hi+mid+lo reassembles g exactly —
    # full f32 cotangents in 3 bf16 MXU passes.  A plain f32 dot at
    # default precision would silently run as bf16 on TPU (rounding every
    # cotangent to ~8 mantissa bits), and Precision.HIGHEST costs 6
    # passes over the large one-hot operand.
    rows = jnp.arange(s_rows, dtype=idx.dtype)[None, :]
    r_total = idx.shape[0]
    r_chunk = max(_ONEHOT_ELEMS // max(s_rows, 1), 1)

    def partial(idx_c, g_c):
        onehot = (idx_c[:, None] == rows).astype(jnp.bfloat16)  # [Rc, S]
        hi, mid, lo = split_bf16_limbs(g_c)
        acc = None
        for limb in (hi, mid, lo):
            part = jnp.dot(onehot.T, limb.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    if r_total <= r_chunk:
        return (partial(idx, g), None)
    d_tbl = None
    for lo_r in range(0, r_total, r_chunk):
        sl = slice(lo_r, min(lo_r + r_chunk, r_total))
        part = partial(idx[sl], g[sl])
        d_tbl = part if d_tbl is None else d_tbl + part
    return (d_tbl, None)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def sphere_table(centers, radii, materials, material_id):
    """Pack per-sphere hit+shade attributes into ONE [S, 11] table:
    [cx, cy, cz, r, albedo_rgb, kind, fuzz, ior, material_id].

    One `gather_rows` per bounce replaces seven separate winner gathers
    (centers/radius/material id + 4 material params) — XLA's TPU
    row-gather cost is per gather op; fusing them measured the replay
    forward 5.1x faster (inverse/fast_grad.py) and speeds this module's
    wavefront path identically.  Gradients flow back through the build
    (its transpose scatters into the small [S, ...] source arrays)."""
    return jnp.concatenate([
        centers,
        radii[:, None],
        materials.albedo[material_id],
        materials.kind[material_id].astype(jnp.float32)[:, None],
        materials.fuzz[material_id][:, None],
        materials.ior[material_id][:, None],
        # f32 round-trip is exact for ids < 2^24 (a scene with 16M
        # materials is far beyond this renderer's scale).
        material_id.astype(jnp.float32)[:, None],
    ], axis=1)


def intersect_scene_fused(ray: Ray, scene: Scene, t_min: float, t_max: float,
                          table, with_second: bool = False):
    """`intersect_scene` + material gather in ONE winner-row gather.

    `table` is `sphere_table(...)` built once per render (hoisted out of
    the bounce scan).  Returns (Hit, albedo [R,3], kind [R], fuzz [R],
    ior [R]); forward values are bit-identical to
    `intersect_scene` + `scene.gather_material`.

    `with_second=True` appends (hit2 [R] bool, albedo2 [R,3], idx2 [R]):
    the nearest hit EXCLUDING the winner sphere — the surface revealed
    when the winner's silhouette retreats, which the two-sided soft-
    silhouette boundary term uses as the background radiance estimate
    (VERDICT r3 item 3; one extra argmin over the already-computed [R,N]
    t matrix plus one gather).

    Tie semantics vs the v1 kernel (ADVICE r4): this path excludes the
    winner by COLUMN INDEX, so a distinct sphere at exactly the winner's
    t still qualifies as runner-up; the fused kernel
    (`kernels/pallas_render.py`) excludes exact t-TIES instead (so a
    cluster-pad duplicate of the winner can never become its own twin's
    "background").  The two runner-ups differ only on exact-tie
    geometry — measure-zero, gradient-only (the boundary term is itself
    an O(edge_softness) estimate there).
    """
    o = ray.origin  # [R,3]
    d = ray.dir  # [R,3]
    c = scene.centers  # [N,3]
    rad = scene.radii  # [N]

    # MXU-friendly inner products.  precision=HIGHEST forces true-f32
    # multiplication: TPU matmuls default to bf16 inputs, whose ~8 lost
    # mantissa bits put 1e-2-scale errors on hit distances (measured as
    # 28% of pixels off vs the exact-f32 Pallas kernel).  K=3, so the
    # extra MXU passes are free.
    highest = jax.lax.Precision.HIGHEST
    d_dot_c = jnp.matmul(d, c.T, precision=highest)  # [R,N]
    o_dot_c = jnp.matmul(o, c.T, precision=highest)  # [R,N]
    o_dot_d = jnp.sum(o * d, axis=-1, keepdims=True)  # [R,1]
    o2 = jnp.sum(o * o, axis=-1, keepdims=True)  # [R,1]
    a = jnp.sum(d * d, axis=-1, keepdims=True)  # [R,1] (1 for unit dirs)
    c2_minus_r2 = jnp.sum(c * c, axis=-1) - rad * rad  # [N]

    half_b = o_dot_d - d_dot_c  # [R,N]
    c_q = o2 - 2.0 * o_dot_c + c2_minus_r2[None, :]  # [R,N]

    disc = half_b * half_b - a * c_q  # [R,N]
    hit_any = disc > 0.0
    # Guarded sqrt: sqrt'(0) = inf would leak NaN into gradients of misses.
    sqrt_d = jnp.sqrt(jnp.where(hit_any, disc, 1.0))

    inv_a = 1.0 / a
    root_near = (-half_b - sqrt_d) * inv_a
    root_far = (-half_b + sqrt_d) * inv_a
    near_ok = hit_any & (root_near > t_min) & (root_near < t_max)
    far_ok = hit_any & (root_far > t_min) & (root_far < t_max)
    # Near root wins when valid, else far root (intersect.wgsl:108-121).
    t_all = jnp.where(near_ok, root_near, jnp.where(far_ok, root_far, t_max))

    t = jnp.min(t_all, axis=-1)  # [R]
    idx = jnp.argmin(t_all, axis=-1)  # [R] piecewise-constant
    hit = t < t_max

    g = gather_rows(table, idx)  # [R, 11] — the one winner gather
    center_hit = g[:, 0:3]
    radius_hit = g[:, 3]
    albedo = g[:, 4:7]
    kind = g[:, 7].astype(jnp.int32)
    fuzz = g[:, 8]
    ior = g[:, 9]
    material = g[:, 10].astype(jnp.int32)

    # Sanitize miss lanes: with t == t_max ~ 1e20 the hit point would be
    # astronomically large and every downstream op (normals, scatter) would
    # overflow to inf/NaN — harmless in a masked forward pass but fatal to
    # gradients (0 * NaN in the where-VJP).  Dead lanes instead report the
    # ray origin and a fixed unit normal; the wavefront masks them out
    # (the TPU analog of the reference's in-band dead-ray sentinel,
    # `intersect.wgsl:154`).
    t_safe = jnp.where(hit, t, 0.0)
    point = o + t_safe[:, None] * d
    # Outward normal (p - c)/r — negative radius flips it (hollow glass).
    inv_r = 1.0 / jnp.where(radius_hit == 0.0, 1.0, radius_hit)
    outward = (point - center_hit) * inv_r[:, None]
    outward = jnp.where(
        hit[:, None], outward, np.array([0.0, 0.0, 1.0], np.float32)
    )
    front_face = jnp.sum(d * outward, axis=-1) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)

    # Silhouette margin of the hit sphere: r^2 - b_perp^2 where b_perp is
    # the perpendicular distance of the (infinite) ray line to the center.
    # Positive inside the silhouette, zero on it; its gradient w.r.t.
    # centers/radii is the lever for soft visibility gradients.
    # Normalized by r^2 so it is scale-free: edge_m2 = 1 - (b_perp/r)^2.
    oc_hit = o - center_hit
    oc2_hit = jnp.sum(oc_hit * oc_hit, axis=-1)
    ocd_hit = jnp.sum(oc_hit * d, axis=-1)
    b_perp2 = oc2_hit - (ocd_hit * ocd_hit) * inv_a[:, 0]
    r2 = jnp.maximum(radius_hit * radius_hit, 1e-12)
    edge_m2 = jnp.where(hit, 1.0 - b_perp2 / r2, 1.0)

    out = Hit(
        t=t,
        point=point,
        normal=normal,
        front_face=front_face,
        material=material,
        hit=hit,
        edge_m2=edge_m2,
    ), albedo, kind, fuzz, ior
    if not with_second:
        return out
    # Runner-up: nearest hit with the winner SPHERE excluded (its far
    # surface is not "background" — shrinking the winner reveals other
    # geometry, not more of itself).
    cols = jnp.arange(t_all.shape[1], dtype=idx.dtype)[None, :]
    t2_all = jnp.where(cols == idx[:, None], t_max, t_all)
    t2 = jnp.min(t2_all, axis=-1)
    idx2 = jnp.argmin(t2_all, axis=-1)
    hit2 = t2 < t_max
    g2 = gather_rows(table, idx2)
    albedo2 = g2[:, 4:7]
    return out + ((hit2, albedo2, jnp.where(hit2, idx2, -1)),)
