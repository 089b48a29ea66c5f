"""Dense-sweep residual-recording forward (the r5 gradient recorder).

The r5 split measurement (BENCHMARKS.md) showed the gradient step is
bound by the RECORDING forward: the v1 per-sphere scalar-loop kernel
records at 24.7M paths/s while the fused replay backward runs at 81.7M.
This kernel records residuals with the v3 kernel's fast intersection
machinery — the dense (sphere, ray) VPU sweep with packed (t | idx)
min-reduction and the exact 3-limb one-hot bf16 MXU attribute gather
(`mxu_render.py`) — under the v1 kernel's PLAIN schedule: grid
(tile, sample), a static bounce loop, so every residual store is an
aligned (tile_rows, 128) slice (the v3 persistent-lane refill would
need per-lane scatters Mosaic cannot express; BENCHMARKS.md "remaining
gradient headroom").

Against the v1 recorder it trades cluster culling for sweep throughput;
against v3 it pays the straggler cost of running every lane to the
tile's max depth (mean path 2.6 of depth 8).  Winner indices refer to
the UNPERMUTED scene order (no cluster plan), so the replay consumes
them with `sphere_perm=None`.

Shade/camera math is line-for-line the plane formulation of
`replay_grad.py` (which is itself pinned against `fast_grad.py`'s
oracle), so recorded decisions replay exactly.

Reference analog: the brute-force linear scan the reference's intersect
stage runs per queue slot (`/root/reference/assets/shaders/
intersect.wgsl:132-143`), as one batched sweep per bounce.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_raytrace_tpu.config import RenderConfig
from bevy_raytrace_tpu.wavefront.render import CAMERA_STREAM, FRAME_MIX
from bevy_raytrace_tpu.kernels.pallas_render import (
    _pcg4d,
    _to_unit,
    _rsqrt_guard,
    _cbrt,
    _TWO_PI,
)
from bevy_raytrace_tpu.kernels.mxu_render import (
    IDX_BITS,
    _IDX_MASK,
    _KEY_MASK,
    _NO_HIT,
    _scene_matrices,
)

TILE_ROWS = 8  # the replay-grad kernel's residual row granularity


def _make_kernel(config: RenderConfig, s_pad: int, chunk: int,
                 tile_rows: int, sample_base: int, record_second: bool,
                 res_dtype):
    width = np.float32(config.width)
    height = np.float32(config.height)
    t_min = np.float32(config.t_min)
    depth = config.max_depth
    shape = (tile_rows, 128)
    r_lanes = tile_rows * 128
    n_chunks = s_pad // chunk

    def kernel(geom_ref, limb_ref, cam_ref, seed_ref, fb_r, fb_g, fb_b,
               res_ref, *rest):
        res2_ref = rest[0] if record_second else None
        tile = pl.program_id(0)
        s = pl.program_id(1)
        sample = s.astype(jnp.uint32) + np.uint32(sample_base)
        seed = seed_ref[0]

        row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        pid = (seed_ref[1] + tile.astype(jnp.uint32) * np.uint32(r_lanes)
               + row * np.uint32(128) + lane)
        pid_f = pid.astype(jnp.int32).astype(jnp.float32)
        py = jnp.floor(pid_f / width)
        px = pid_f - py * width

        def flat(a):
            return a.reshape(1, r_lanes)

        # Hoisted one-hot sphere-index grid (v3's construction).
        sidx = jax.lax.broadcasted_iota(jnp.int32, (s_pad, r_lanes), 0)

        # ---- camera (replay_grad.generate, inlined) --------------------
        ca, cb, cc, cd = _pcg4d(pid, sample, np.uint32(CAMERA_STREAM), seed)
        cu1, cu2 = _to_unit(ca), _to_unit(cb)
        cu3, cu4 = _to_unit(cc), _to_unit(cd)
        (cox, coy, coz) = (cam_ref[0], cam_ref[1], cam_ref[2])
        (ux, uy, uz) = (cam_ref[3], cam_ref[4], cam_ref[5])
        (vx, vy, vz) = (cam_ref[6], cam_ref[7], cam_ref[8])
        (wx, wy, wz) = (cam_ref[9], cam_ref[10], cam_ref[11])
        half_w, half_h = cam_ref[12], cam_ref[13]
        lens_r, focus = cam_ref[14], cam_ref[15]
        s_im = (px + cu1) / width
        t_im = 1.0 - (py + cu2) / height
        ru = jnp.sqrt(cu3)
        phi = _TWO_PI * cu4
        du = ru * jnp.cos(phi) * lens_r
        dv = ru * jnp.sin(phi) * lens_r
        ox = cox + du * ux + dv * vx
        oy = coy + du * uy + dv * vy
        oz = coz + du * uz + dv * vz
        su = (2.0 * s_im - 1.0) * half_w * focus
        tv = (2.0 * t_im - 1.0) * half_h * focus
        tx = cox - focus * wx + su * ux + tv * vx - ox
        ty = coy - focus * wy + su * uy + tv * vy - oy
        tz = coz - focus * wz + su * uz + tv * vz - oz
        ginv = _rsqrt_guard(tx * tx + ty * ty + tz * tz)
        dx, dy, dz = tx * ginv, ty * ginv, tz * ginv

        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        tp_r = tp_g = tp_b = one
        rad_r = rad_g = rad_b = zero
        alive = jnp.ones(shape, bool)

        for b in range(depth):
            # ---- intersect: dense (sphere, ray) sweep (v3 form) --------
            oxf, oyf, ozf = flat(ox), flat(oy), flat(oz)
            dxf, dyf, dzf = flat(dx), flat(dy), flat(dz)
            best = best2 = None
            for c in range(n_chunks):
                sl = pl.ds(c * chunk, chunk)
                ocx = oxf - geom_ref[sl, 0:1]
                ocy = oyf - geom_ref[sl, 1:2]
                ocz = ozf - geom_ref[sl, 2:3]
                r2c = geom_ref[sl, 3:4]
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, r_lanes), 0) + np.int32(c * chunk)
                hb = ocx * dxf + ocy * dyf + ocz * dzf
                cq = (ocx * ocx + ocy * ocy + ocz * ocz) - r2c
                disc = hb * hb - cq
                sq = disc * jax.lax.rsqrt(disc)  # NaN on miss (v3 note)
                rn = -hb - sq
                rf = sq - hb
                tn = jnp.where(rn > t_min, rn, rf)
                valid = tn > t_min  # NaN compares false
                bits = jax.lax.bitcast_convert_type(tn, jnp.int32)
                packed = jnp.where(valid, (bits & _KEY_MASK) | idx,
                                   _NO_HIT)
                m1 = jnp.min(packed, axis=0, keepdims=True)
                if record_second:
                    # Runner-up: exclude the chunk winner BY KEY (same
                    # by-index semantics as intersect_scene_fused; see
                    # its tie-semantics note).
                    m2 = jnp.min(jnp.where(packed == m1, _NO_HIT, packed),
                                 axis=0, keepdims=True)
                if best is None:
                    best = m1
                    if record_second:
                        best2 = m2
                else:
                    if record_second:
                        lo = jnp.minimum(best, m1)
                        hi = jnp.minimum(jnp.maximum(best, m1),
                                         jnp.minimum(best2, m2))
                        best, best2 = lo, hi
                    else:
                        best = jnp.minimum(best, m1)

            # (reshape the i32 BEFORE comparing — Mosaic rejects i1
            # shape casts, the mxu_render hazard note.)
            hit = (best.reshape(shape) != _NO_HIT) & alive
            widx = best & _IDX_MASK  # (1, R)

            # ---- record residuals (aligned tile_rows store) ------------
            rec = jnp.where(hit, widx.reshape(shape),
                            -1).astype(jnp.int32).astype(res_dtype)
            r0 = b * tile_rows
            res_ref[0, r0:r0 + tile_rows, :] = rec
            if record_second:
                hit2 = best2.reshape(shape) != _NO_HIT
                rec2 = jnp.where(hit & hit2,
                                 (best2 & _IDX_MASK).reshape(shape),
                                 -1).astype(jnp.int32).astype(res_dtype)
                res2_ref[0, r0:r0 + tile_rows, :] = rec2

            # ---- attribute gather: exact 3-limb one-hot MXU (v3) -------
            onehot = jnp.where(sidx == widx, 1.0,
                               0.0).astype(jnp.bfloat16)  # (S, R)
            g3 = jnp.dot(limb_ref[:], onehot,
                         preferred_element_type=jnp.float32)  # (48, R)
            g = g3[0:16] + g3[16:32] + g3[32:48]
            bcx = g[0].reshape(shape)
            bcy = g[1].reshape(shape)
            bcz = g[2].reshape(shape)
            binv = g[3].reshape(shape)
            bar = g[4].reshape(shape)
            bag = g[5].reshape(shape)
            bab = g[6].reshape(shape)
            bkd = g[7].reshape(shape)
            bfz = g[8].reshape(shape)
            bio = g[9].reshape(shape)
            br2 = g[10].reshape(shape)

            # ---- exact winner-t recompute (v3 form) --------------------
            rocx = ox - bcx
            rocy = oy - bcy
            rocz = oz - bcz
            hb_r = rocx * dx + rocy * dy + rocz * dz
            cq_r = (rocx * rocx + rocy * rocy + rocz * rocz) - br2
            sq_r = jnp.sqrt(jnp.maximum(hb_r * hb_r - cq_r, 0.0))
            rn_r = -hb_r - sq_r
            rf_r = sq_r - hb_r
            bt = jnp.where(rn_r > t_min, rn_r, rf_r)
            t_safe = jnp.where(hit, bt, 0.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz
            nx = jnp.where(hit, (hx - bcx) * binv, 0.0)
            ny = jnp.where(hit, (hy - bcy) * binv, 0.0)
            nz = jnp.where(hit, (hz - bcz) * binv, 1.0)
            front = (dx * nx + dy * ny + dz * nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

            # ---- shade (replay_grad.bounce's plane math) ---------------
            ba, bb, bc2, bd = _pcg4d(pid, sample, np.uint32(b), seed)
            u1, u2, u3, u4 = (_to_unit(ba), _to_unit(bb), _to_unit(bc2),
                              _to_unit(bd))
            zs = 1.0 - 2.0 * u1
            rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
            ph = _TWO_PI * u2
            rux = rs * jnp.cos(ph)
            ruy = rs * jnp.sin(ph)
            ruz = zs

            lx, ly, lz = nx + rux, ny + ruy, nz + ruz
            lam_deg = (jnp.abs(lx) + jnp.abs(ly) + jnp.abs(lz)) < 1e-8
            lx = jnp.where(lam_deg, nx, lx)
            ly = jnp.where(lam_deg, ny, ly)
            lz = jnp.where(lam_deg, nz, lz)
            linv = _rsqrt_guard(lx * lx + ly * ly + lz * lz)
            lx, ly, lz = lx * linv, ly * linv, lz * linv

            ddn = dx * nx + dy * ny + dz * nz
            rx = dx - 2.0 * ddn * nx
            ry = dy - 2.0 * ddn * ny
            rz = dz - 2.0 * ddn * nz
            fz = bfz * _cbrt(u3)
            mx, my, mz = rx + fz * rux, ry + fz * ruy, rz + fz * ruz
            minv = _rsqrt_guard(mx * mx + my * my + mz * mz)
            mx, my, mz = mx * minv, my * minv, mz * minv
            met_ok = (mx * nx + my * ny + mz * nz) > 0.0

            ratio = jnp.where(front, 1.0 / bio, bio)
            cos_t = jnp.minimum(-(dx * nx + dy * ny + dz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0f = (1.0 - ratio) / (1.0 + ratio)
            r0f = r0f * r0f
            m1s = 1.0 - cos_t
            m2s = m1s * m1s
            schlick = r0f + (1.0 - r0f) * (m2s * m2s * m1s)
            use_refl = cannot | (schlick > u4)
            ppx = ratio * (dx + cos_t * nx)
            ppy = ratio * (dy + cos_t * ny)
            ppz = ratio * (dz + cos_t * nz)
            kk = jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz))
            sqk = jnp.sqrt(kk)
            gx = ppx - sqk * nx
            gy = ppy - sqk * ny
            gz = ppz - sqk * nz
            ex = jnp.where(use_refl, rx, gx)
            ey = jnp.where(use_refl, ry, gy)
            ez = jnp.where(use_refl, rz, gz)
            einv = _rsqrt_guard(ex * ex + ey * ey + ez * ez)
            ex, ey, ez = ex * einv, ey * einv, ez * einv

            is_lam = bkd < 0.5
            is_met = (bkd > 0.5) & (bkd < 1.5)
            is_die = bkd > 1.5
            sx = jnp.where(is_lam, lx, jnp.where(is_met, mx, ex))
            sy = jnp.where(is_lam, ly, jnp.where(is_met, my, ey))
            sz = jnp.where(is_lam, lz, jnp.where(is_met, mz, ez))
            at_r = jnp.where(is_die, 1.0, bar)
            at_g = jnp.where(is_die, 1.0, bag)
            at_b = jnp.where(is_die, 1.0, bab)
            scat_ok = (~is_met) | met_ok

            tsky = 0.5 * (dy + 1.0)
            sk_r = 1.0 - 0.5 * tsky
            sk_g = 1.0 - 0.3 * tsky
            add = alive & ~hit
            rad_r = rad_r + jnp.where(add, tp_r * sk_r, 0.0)
            rad_g = rad_g + jnp.where(add, tp_g * sk_g, 0.0)
            rad_b = rad_b + jnp.where(add, tp_b, 0.0)

            scat = alive & hit
            tp_r = jnp.where(scat, tp_r * at_r, tp_r)
            tp_g = jnp.where(scat, tp_g * at_g, tp_g)
            tp_b = jnp.where(scat, tp_b * at_b, tp_b)
            alive = scat & scat_ok
            ox = jnp.where(alive, hx, ox)
            oy = jnp.where(alive, hy, oy)
            oz = jnp.where(alive, hz, oz)
            dx = jnp.where(alive, sx, dx)
            dy = jnp.where(alive, sy, dy)
            dz = jnp.where(alive, sz, dz)

        @pl.when(s == 0)
        def _():
            fb_r[:] = rad_r
            fb_g[:] = rad_g
            fb_b[:] = rad_b

        @pl.when(s != 0)
        def _():
            fb_r[:] = fb_r[:] + rad_r
            fb_g[:] = fb_g[:] + rad_g
            fb_b[:] = fb_b[:] + rad_b

    return kernel


def render_sweep_record(
    scene,
    camera,
    config: RenderConfig,
    frame=0,
    interpret: bool = False,
    tile_rows: int = TILE_ROWS,
    sphere_chunk: int = 0,
    sample_base: int = 0,
    record_second: bool = False,
    pixel_base=None,
    num_local: int | None = None,
):
    """Recording forward on the dense sweep -> (img, res[, res2]).

    Drop-in for `render_pallas(..., with_residuals=True)` minus cluster
    plans: residual indices are in the UNPERMUTED scene order (pass
    `sphere_perm=None` / `clusters=None` to the replay).  Stripe mode
    (`pixel_base`/`num_local`) composes like the v1 kernel's.
    """
    num_pixels = config.num_pixels
    stripe = num_local is not None
    npix = num_local if stripe else num_pixels
    if num_pixels >= (1 << 24):
        raise ValueError(
            f"num_pixels={num_pixels} must stay below 2^24 (f32-exact "
            f"pixel ids); shard larger framebuffers")
    if not sphere_chunk:
        cand8 = max(-(-scene.count // 8), 1) * 8
        cand128 = max(-(-scene.count // 128), 1) * 128
        sphere_chunk = cand8 if cand8 <= 0.85 * cand128 else cand128
    s_pad = max(-(-scene.count // sphere_chunk), 1) * sphere_chunk
    if s_pad > (1 << IDX_BITS):
        raise ValueError(
            f"the packed key supports at most {1 << IDX_BITS} sphere "
            f"slots (IDX_BITS={IDX_BITS}); got {s_pad} — use the v1 "
            f"recorder (render_pallas) for larger scenes")
    res_dtype = jnp.int16  # s_pad <= 1024 by the guard above

    tile_px = tile_rows * 128
    n_tiles = -(-npix // tile_px)
    p_pad = n_tiles * tile_px
    depth = config.max_depth

    geom, limbs, _, _ = _scene_matrices(scene, s_pad, None)
    cam = camera.pack()
    with np.errstate(over="ignore"):
        seed = np.uint32(config.seed) + np.uint32(FRAME_MIX) * (
            np.uint32(frame) if isinstance(frame, int)
            else frame.astype(jnp.uint32))
    base = 0 if pixel_base is None else pixel_base
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.uint32).reshape(()),
        jnp.asarray(base).astype(jnp.uint32).reshape(()),
    ])

    kernel = _make_kernel(config, s_pad, sphere_chunk, tile_rows,
                          sample_base, record_second, res_dtype)
    fb_spec = pl.BlockSpec((tile_rows, 128), lambda t, s: (t, 0),
                           memory_space=pltpu.VMEM)
    fb_shape = jax.ShapeDtypeStruct((p_pad // 128, 128), jnp.float32)
    res_spec = pl.BlockSpec((1, depth * tile_rows, 128),
                            lambda t, s: (s, t, 0),
                            memory_space=pltpu.VMEM)
    res_shape = jax.ShapeDtypeStruct(
        (config.samples_per_pixel, depth * (p_pad // 128), 128), res_dtype)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    out_specs = [fb_spec, fb_spec, fb_spec, res_spec]
    out_shapes = [fb_shape, fb_shape, fb_shape, res_shape]
    if record_second:
        out_specs.append(res_spec)
        out_shapes.append(res_shape)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, config.samples_per_pixel),
        in_specs=[vmem(), vmem(), smem(), smem()],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(geom, limbs, cam, seed_arr)

    fb = jnp.stack([o.reshape(-1) for o in outs[:3]], axis=-1)
    fb = fb[:npix] / np.float32(config.samples_per_pixel)
    img = fb if stripe else fb.reshape(config.height, config.width, 3)

    def regroup(raw):
        r = raw.reshape(
            config.samples_per_pixel, n_tiles, depth, tile_rows * 128)
        return jnp.swapaxes(r, 1, 2).reshape(
            config.samples_per_pixel, depth, p_pad)

    if not record_second:
        return img, regroup(outs[3])
    return img, regroup(outs[3]), regroup(outs[4])
