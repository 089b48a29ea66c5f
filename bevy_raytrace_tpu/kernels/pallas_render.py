"""Fused whole-frame path-trace kernel (Pallas TPU).

Where the reference records six separate compute dispatches per frame with
all per-ray state round-tripping a storage buffer between them
(`src/ray_trace_node.rs:204-220`), this kernel fuses the ENTIRE trace —
camera ray generation, every (intersect -> shade) bounce round, and the
sample accumulation — into one Pallas program per pixel tile.  Per-ray
state lives in vector registers / VMEM for the whole path; the only HBM
traffic is the final framebuffer accumulation.  The XLA path
(wavefront/render.py) streams a [rays, spheres] workspace through HBM per
bounce; eliminating that is worth ~an order of magnitude on a v5e
(measured in BENCH logs).

Layout: rays live on the native (sublane, lane) grid — a tile is
(tile_rows, 128) pixels, every per-ray quantity (origin/dir components,
throughput, radiance, masks) is one f32 vreg array of that shape, so all
shading math is perfectly lane-parallel VPU work.  The sphere loop is the
reference's brute-force linear scan (`intersect.wgsl:132-143`) as an
unrolled `fori_loop` over scalars held in SMEM, broadcasting each sphere
against the whole ray tile; nearest-hit state (t, center, inv radius,
material attributes) is tracked with vector selects, so no gather is ever
needed.

Performance structure (v5e measurements in git log / BENCH files):
- `tile_rows` controls how much vector work amortizes each scalar-loop
  iteration (SMEM loads + bookkeeping run on the scalar core).
- the sphere loop is unrolled `unroll`-wide (spheres padded with r2 = -1
  duds) to keep the VPU fed between scalar-loop bookkeeping;
- after each bounce a whole-tile `lax.cond` skips the remaining rounds
  once every lane is dead (sky tiles die at bounce 0-1; the reference
  instead early-outs per thread, `intersect.wgsl:154`).

Grid: (tiles, spp).  spp is the innermost dimension and maps to the same
output block, so sample accumulation happens in VMEM across grid steps
(init on s == 0).

RNG: identical PCG4D counters as the jnp wavefront path (absolute pixel
id, sample id, bounce stream) — images agree with `wavefront.render` to
f32 transcendental tolerance, and are sharding/tiling independent.

Forward-only: gradients use the XLA path (with remat); SURVEY.md §7
"Pallas + autodiff" records this as the accepted trade.

Mosaic portability notes (each found the hard way):
- no uint32 -> f32 casts: route through int32 (values < 2^24);
- pixel x/y via f32 floor math, not integer div/mod;
- never `where` on i1 values: use logic ops ((~a) | b) — i1 selects fail
  to compile ("unsupported target bitwidth for truncation").
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

# Defaults chosen by sweep on TPU v5e (BASELINE scene, 1200x800, depth 8):
#   brute force: (32, unroll=1) 12.5M rays/s; (32, 4) 19.4M; (32, 6) 20.9M;
#   (64, 4) 19.2M; unroll >= 8 fails Mosaic compile (register pressure).
# With cluster culling the optimum shifts to SMALLER tiles (a narrower
# tile sees fewer clusters, so phase B walks a shorter worklist):
#   cs=12: tr=16 25.7M, tr=32 24.4M, tr=64 23.3M; cs=24 tr=32 23.5M;
#   cs=16/un=4 tr=16 23.9M; cs=6 (81 predicated phase-A regions) hangs
#   Mosaic compile; tr=8 likewise.
# skip_dead_tiles (scratch-state + @pl.when whole-tile early-out) is
# value-bit-identical but gains <1% — Mosaic appears to predicate rather
# than branch the region — so it defaults OFF.
TILE_ROWS = 32
CLUSTERED_TILE_ROWS = 16
UNROLL = 6
SKIP_DEAD_TILES = False

_TWO_PI = np.float32(2.0 * np.pi)
_INV24 = np.float32(1.0 / 16777216.0)


@np.errstate(over="ignore")  # uint32 wrap intended for host-scalar streams
def _pcg4d(x, y, z, w):
    mul = np.uint32(1664525)
    add = np.uint32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    w = w * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit(bits):
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32.
    return (bits >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * _INV24


def _rsqrt_guard(n2):
    return jax.lax.rsqrt(jnp.maximum(n2, 1e-20))


def _cbrt(v):
    # positive-domain cube root; exp/log keeps Mosaic-portable.
    return jnp.where(
        v < 1e-30, 0.0, jnp.exp(jnp.log(jnp.maximum(v, 1e-30)) * (1.0 / 3.0))
    )


def _make_kernel(
    config: RenderConfig,
    n_padded: int,
    tile_rows: int,
    unroll: int,
    skip_dead: bool,
    n_clusters: int = 0,
    cluster_size: int = 0,
    with_residuals: bool = False,
    record_second: bool = False,
    sample_base: int = 0,
    res_dtype=jnp.int16,
):
    if with_residuals and skip_dead:
        raise ValueError("with_residuals requires the plain schedule")
    if record_second and not with_residuals:
        raise ValueError("record_second requires with_residuals")
    width = np.float32(config.width)
    height = np.float32(config.height)
    t_min = np.float32(config.t_min)
    t_max = np.float32(config.t_max)
    max_depth = config.max_depth
    n_iters = n_padded // unroll
    clustered = n_clusters > 0
    if clustered:
        blocks_per_cluster = cluster_size // unroll
        bpc_pow2 = (blocks_per_cluster & (blocks_per_cluster - 1)) == 0
        bpc_shift = int(np.log2(blocks_per_cluster)) if bpc_pow2 else None
        # Cluster-hit bits are folded into int32 lane accumulators (30 bits
        # per word keeps shifts clear of the sign bit), so phase A needs
        # exactly one vector->scalar sync per word per bounce instead of one
        # per cluster (the round-1 kernel's 41 serialized reduce+branch
        # round-trips per bounce were the dominant frame cost).
        bits_per_word = 30
        n_words = -(-n_clusters // bits_per_word)

    def kernel(geom_ref, mat_ref, cam_ref, seed_ref, *rest):
        res_ref = res2_ref = None
        if clustered:
            cb_ref, fb_r, fb_g, fb_b, *scratch = rest
            if with_residuals:
                res_ref, *scratch = scratch
            if record_second:
                res2_ref, *scratch = scratch
            *scratch, list_ref, count_ref = scratch
        else:
            fb_r, fb_g, fb_b, *scratch = rest
            if with_residuals:
                res_ref, *scratch = scratch
            if record_second:
                res2_ref, *scratch = scratch
        tile = pl.program_id(0)
        s = pl.program_id(1)
        # Absolute sample id: RNG counters use sample_base + grid sample,
        # so a chunked render of samples [base, base+spp) draws exactly
        # the paths those samples draw in a single full-spp render.
        sample = s.astype(jnp.uint32) + np.uint32(sample_base)
        seed = seed_ref[0]

        shape = (tile_rows, 128)
        row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        # seed_ref[1] is the TRACED absolute pixel base (0 unsharded): a
        # shard_map stripe offsets every pid by rank*local so RNG counters
        # and px/py stay absolute — stripes compose bit-exactly (r5, the
        # sharded fast-gradient path).
        pid = (
            seed_ref[1]
            + tile.astype(jnp.uint32) * np.uint32(tile_rows * 128)
            + row * np.uint32(128)
            + lane
        )

        # ---- camera ray generation (generate.wgsl analog) --------------
        ca, cb, cc, cd = _pcg4d(pid, sample, np.uint32(CAMERA_STREAM), seed)
        cu1, cu2, cu3, cu4 = _to_unit(ca), _to_unit(cb), _to_unit(cc), _to_unit(cd)

        # Pixel coords via f32 math (pid < 2^24 so the round trip is exact).
        pid_f = pid.astype(jnp.int32).astype(jnp.float32)
        py = jnp.floor(pid_f / width)
        px = pid_f - py * width
        s_im = (px + cu1) / width
        t_im = 1.0 - (py + cu2) / height

        cox, coy, coz = cam_ref[0], cam_ref[1], cam_ref[2]
        ux, uy, uz = cam_ref[3], cam_ref[4], cam_ref[5]
        vx, vy, vz = cam_ref[6], cam_ref[7], cam_ref[8]
        wx, wy, wz = cam_ref[9], cam_ref[10], cam_ref[11]
        half_w, half_h = cam_ref[12], cam_ref[13]
        lens_r, focus = cam_ref[14], cam_ref[15]

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
        inv = _rsqrt_guard(tx * tx + ty * ty + tz * tz)
        dx, dy, dz = tx * inv, ty * inv, tz * inv

        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)

        def bounce_body(bounce, carry, bounce_static=None):
            (ox, oy, oz, dx, dy, dz,
             tp_r, tp_g, tp_b, rad_r, rad_g, rad_b, alive) = carry

            # ---- intersect: brute-force nearest hit --------------------
            # Per-ray invariants of the quadratic (dir is unit: a == 1).
            o_dot_d = ox * dx + oy * dy + oz * dz
            o2 = ox * ox + oy * oy + oz * oz

            def one_sphere(n, carry):
                if record_second:
                    (bt, bcx, bcy, bcz, binv,
                     bar, bag, bab, bkd, bfz, bio, bidx,
                     bt2, bidx2) = carry
                else:
                    (bt, bcx, bcy, bcz, binv,
                     bar, bag, bab, bkd, bfz, bio, bidx) = carry
                    bt2 = bidx2 = None
                cx = geom_ref[0, n]
                cy = geom_ref[1, n]
                cz = geom_ref[2, n]
                kq = geom_ref[3, n]  # |c|^2 - r^2
                ivr = geom_ref[4, n]
                c_dot_d = cx * dx + cy * dy + cz * dz
                o_dot_c = ox * cx + oy * cy + oz * cz
                half_b = o_dot_d - c_dot_d
                cq = o2 - 2.0 * o_dot_c + kq
                disc = half_b * half_b - cq
                # sqrt(disc<0) = NaN; NaN fails every compare below, so the
                # miss case needs no explicit disc>0 test.
                sq = jnp.sqrt(disc)
                rn = -half_b - sq
                rf = -half_b + sq
                # near root when valid, else far (equivalent to the
                # reference's two-interval check, intersect.wgsl:108-121).
                tn = jnp.where(rn > t_min, rn, rf)
                better = (tn > t_min) & (tn < bt)
                if record_second:
                    # Runner-up (nearest hit excluding the winner), for
                    # the two-sided silhouette background.  `tn != bt`
                    # excludes EXACT ties so a cluster pad slot (a
                    # duplicate of a real sphere) can never become its
                    # own twin's "background".
                    nf2 = jnp.asarray(n, jnp.int32).astype(jnp.float32)
                    sec = ((tn > t_min) & ~better & (tn < bt2)
                           & (tn != bt))
                    bt2 = jnp.where(better, bt, jnp.where(sec, tn, bt2))
                    bidx2 = jnp.where(better, bidx,
                                      jnp.where(sec, nf2, bidx2))
                bt = jnp.where(better, tn, bt)
                bcx = jnp.where(better, cx, bcx)
                bcy = jnp.where(better, cy, bcy)
                bcz = jnp.where(better, cz, bcz)
                binv = jnp.where(better, ivr, binv)
                bar = jnp.where(better, mat_ref[0, n], bar)
                bag = jnp.where(better, mat_ref[1, n], bag)
                bab = jnp.where(better, mat_ref[2, n], bab)
                bkd = jnp.where(better, mat_ref[3, n], bkd)
                bfz = jnp.where(better, mat_ref[4, n], bfz)
                bio = jnp.where(better, mat_ref[5, n], bio)
                if with_residuals:
                    # Winner index as f32 (exact below 2^24); -1 = miss.
                    nf = jnp.asarray(n, jnp.int32).astype(jnp.float32)
                    bidx = jnp.where(better, nf, bidx)
                out = (bt, bcx, bcy, bcz, binv, bar, bag, bab, bkd, bfz,
                       bio, bidx)
                if record_second:
                    out = out + (bt2, bidx2)
                return out

            def sphere_block(i, carry):
                base = i * unroll
                for j in range(unroll):
                    carry = one_sphere(base + j, carry)
                return carry

            init = (
                jnp.full(shape, t_max, jnp.float32),
                zero, zero, zero, one,
                zero, zero, zero, zero, zero, one,
                zero - 1.0,
            )
            if record_second:
                init = init + (jnp.full(shape, t_max, jnp.float32),
                               zero - 1.0)
            bt2 = bidx2 = None
            if not clustered:
                (bt, bcx, bcy, bcz, binv, bar, bag, bab, bkd, bfz, bio,
                 bidx, *second) = (
                    jax.lax.fori_loop(0, n_iters, sphere_block, init)
                )
            else:
                # Phase A: per-ray ray-vs-cluster-bound tests, hit bits
                # folded into int32 bitmask vregs (alive lanes only, so
                # late-bounce tiles traverse only what their survivors can
                # see).  sqrt(disc<0) = NaN and NaN compares false, so no
                # explicit disc>0 test is needed.
                accs = [jnp.zeros(shape, jnp.int32) for _ in range(n_words)]
                for c in range(n_clusters):
                    ccx = cb_ref[0, c]
                    ccy = cb_ref[1, c]
                    ccz = cb_ref[2, c]
                    ckq = cb_ref[3, c]
                    c_dot_d = ccx * dx + ccy * dy + ccz * dz
                    o_dot_c = ox * ccx + oy * ccy + oz * ccz
                    hb = o_dot_d - c_dot_d
                    cq = o2 - 2.0 * o_dot_c + ckq
                    rfar = jnp.sqrt(hb * hb - cq) - hb
                    lane = (rfar > t_min) & alive
                    w = c // bits_per_word
                    bit = np.int32(1 << (c % bits_per_word))
                    accs[w] = accs[w] | jnp.where(lane, bit, 0)

                # One OR-tree + scalar extraction per word: after the tree
                # every element holds the tile-wide OR, so any reduction
                # reads it out.
                def or_all(a):
                    sh = 64
                    while sh >= 1:
                        a = a | pltpu.roll(a, sh, axis=1)
                        sh //= 2
                    sh = tile_rows // 2
                    while sh >= 1:
                        a = a | pltpu.roll(a, sh, axis=0)
                        sh //= 2
                    return jnp.max(a)

                masks = [or_all(a) for a in accs]

                # Worklist build is now scalar-only (no vector dependency
                # inside the predicated regions).
                count_ref[0] = 0
                for w, m in enumerate(masks):
                    for j in range(bits_per_word):
                        c = w * bits_per_word + j
                        if c >= n_clusters:
                            break

                        @pl.when(((m >> j) & 1) == 1)
                        def _(c=c):
                            list_ref[count_ref[0]] = c
                            count_ref[0] = count_ref[0] + 1

                # Phase B: walk only the flagged clusters (dynamic trip
                # count; unroll-block granularity within each cluster).
                def cluster_block(k, carry):
                    if bpc_pow2:
                        ci = k >> bpc_shift
                        off = (k & (blocks_per_cluster - 1)) * unroll
                    else:
                        ci = k // blocks_per_cluster
                        off = (k % blocks_per_cluster) * unroll
                    base = list_ref[ci] * cluster_size + off
                    for j in range(unroll):
                        carry = one_sphere(base + j, carry)
                    return carry

                (bt, bcx, bcy, bcz, binv, bar, bag, bab, bkd, bfz, bio,
                 bidx, *second) = (
                    jax.lax.fori_loop(
                        0,
                        count_ref[0] * blocks_per_cluster,
                        cluster_block,
                        init,
                    )
                )

            hit = bt < t_max
            if with_residuals:
                # Per-bounce winner sphere index (-1 = miss/dead): the
                # residual that lets the backward replay skip the sphere
                # sweep entirely (see inverse/fast_grad.py).  Dead lanes
                # record -1 so the replay treats them as misses.  Stored
                # int16 when the slot count fits (r5): winner indices are
                # capped well below 2^15, and halving the checkpoint is
                # what lets the FULL 256-spp flagship record unchunked
                # (~3.9 GB) instead of re-rendering spp chunks.
                rec = (jnp.where(hit & alive, bidx, -1.0)
                       .astype(jnp.int32).astype(res_dtype))
                r0 = bounce_static * tile_rows
                res_ref[0, r0:r0 + tile_rows, :] = rec
            if record_second:
                bt2, bidx2 = second
                hit2 = bt2 < t_max
                rec2 = (jnp.where(hit & hit2 & alive, bidx2, -1.0)
                        .astype(jnp.int32).astype(res_dtype))
                res2_ref[0, r0:r0 + tile_rows, :] = rec2
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

            # ---- shade (shade.wgsl analog) -----------------------------
            ba, bb, bc2, bd = _pcg4d(pid, sample, bounce.astype(jnp.uint32), seed)
            u1, u2, u3, u4 = _to_unit(ba), _to_unit(bb), _to_unit(bc2), _to_unit(bd)

            # unit sphere sample
            zs = 1.0 - 2.0 * u1
            rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
            ph = _TWO_PI * u2
            rux = rs * jnp.cos(ph)
            ruy = rs * jnp.sin(ph)
            ruz = zs

            # lambertian
            lx, ly, lz = nx + rux, ny + ruy, nz + ruz
            lam_deg = (jnp.abs(lx) + jnp.abs(ly) + jnp.abs(lz)) < 1e-8
            lx = jnp.where(lam_deg, nx, lx)
            ly = jnp.where(lam_deg, ny, ly)
            lz = jnp.where(lam_deg, nz, lz)
            linv = _rsqrt_guard(lx * lx + ly * ly + lz * lz)
            lx, ly, lz = lx * linv, ly * linv, lz * linv

            # metal
            ddn = dx * nx + dy * ny + dz * nz
            rx = dx - 2.0 * ddn * nx
            ry = dy - 2.0 * ddn * ny
            rz = dz - 2.0 * ddn * nz
            fz = bfz * _cbrt(u3)
            mx, my, mz = rx + fz * rux, ry + fz * ruy, rz + fz * ruz
            minv = _rsqrt_guard(mx * mx + my * my + mz * mz)
            mx, my, mz = mx * minv, my * minv, mz * minv
            met_ok = (mx * nx + my * ny + mz * nz) > 0.0

            # dielectric
            ratio = jnp.where(front, 1.0 / bio, bio)
            cos_t = jnp.minimum(-(dx * nx + dy * ny + dz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            m1 = 1.0 - cos_t
            m2 = m1 * m1
            schlick = r0 + (1.0 - r0) * (m2 * m2 * m1)
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

            # select by material kind (0 lam, 1 metal, 2 dielectric)
            is_lam = bkd < 0.5
            is_met = (bkd > 0.5) & (bkd < 1.5)
            is_die = bkd > 1.5
            sx = jnp.where(is_lam, lx, jnp.where(is_met, mx, ex))
            sy = jnp.where(is_lam, ly, jnp.where(is_met, my, ey))
            sz = jnp.where(is_lam, lz, jnp.where(is_met, mz, ez))
            at_r = jnp.where(is_die, 1.0, bar)
            at_g = jnp.where(is_die, 1.0, bag)
            at_b = jnp.where(is_die, 1.0, bab)
            # bool select via logic ops (Mosaic rejects i1 selects).
            scat_ok = (~is_met) | met_ok

            # sky on miss
            tsky = 0.5 * (dy + 1.0)
            sk_r = 1.0 - 0.5 * tsky
            sk_g = 1.0 - 0.3 * tsky
            add = alive & ~hit
            rad_r = rad_r + jnp.where(add, tp_r * sk_r, 0.0)
            rad_g = rad_g + jnp.where(add, tp_g * sk_g, 0.0)
            rad_b = rad_b + jnp.where(add, tp_b, 0.0)  # sky blue term == 1

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
            return (ox, oy, oz, dx, dy, dz,
                    tp_r, tp_g, tp_b, rad_r, rad_g, rad_b, alive)

        if not skip_dead:
            carry = (ox, oy, oz, dx, dy, dz,
                     one, one, one, zero, zero, zero,
                     jnp.ones(shape, bool))
            for bounce in range(max_depth):
                carry = bounce_body(jnp.uint32(bounce), carry,
                                    bounce_static=bounce)
            rad_r, rad_g, rad_b = carry[9], carry[10], carry[11]
        else:
            # Whole-tile early-out: per-ray state lives in VMEM scratch and
            # each bounce >= 1 is a predicated @pl.when region gated on "any
            # lane still alive" (an SMEM flag updated per bounce).  Sky
            # tiles die at bounce 0-1 and skip the remaining rounds — the
            # TPU form of the reference's per-thread dead-ray early-out
            # (intersect.wgsl:154).  (lax.cond with vector carries does not
            # compile in this Mosaic version; predicated regions do.)
            *state_refs, alive_ref, flag_ref = scratch

            carry = bounce_body(
                jnp.uint32(0),
                (ox, oy, oz, dx, dy, dz,
                 one, one, one, zero, zero, zero,
                 jnp.ones(shape, bool)),
            )
            for r, v in zip(state_refs, carry[:12]):
                r[:] = v
            alive_f = jnp.where(carry[12], 1.0, 0.0)
            alive_ref[:] = alive_f
            flag_ref[0] = jnp.max(alive_f).astype(jnp.int32)

            for bounce in range(1, max_depth):
                @pl.when(flag_ref[0] == 1)
                def _(bounce=bounce):
                    carry_in = tuple(r[:] for r in state_refs) + (
                        alive_ref[:] > 0.5,
                    )
                    out = bounce_body(jnp.uint32(bounce), carry_in)
                    for r, v in zip(state_refs, out[:12]):
                        r[:] = v
                    af = jnp.where(out[12], 1.0, 0.0)
                    alive_ref[:] = af
                    flag_ref[0] = jnp.max(af).astype(jnp.int32)

            rad_r = state_refs[9][:]
            rad_g = state_refs[10][:]
            rad_b = state_refs[11][:]

        # ---- accumulate into the framebuffer block ---------------------
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


def render_pallas(
    scene,
    camera,
    config: RenderConfig,
    frame=0,
    interpret: bool = False,
    tile_rows: int | None = None,
    unroll: int = UNROLL,
    skip_dead_tiles: bool = SKIP_DEAD_TILES,
    clusters=None,
    with_residuals: bool = False,
    record_second: bool = False,
    sample_base: int = 0,
    pixel_base=None,
    num_local: int | None = None,
):
    """Drop-in replacement for wavefront.render on the forward path.

    `sample_base` offsets the absolute sample ids (RNG counters): a
    render of samples [base, base+spp) draws exactly the paths those
    samples draw in one full-spp render (spp-chunked gradient recording).

    `with_residuals=True` additionally returns the per-bounce winner
    sphere index `res` [spp, max_depth, H*W] (-1 = miss), the
    checkpoint that lets `inverse.fast_grad` replay paths for the
    backward pass without re-running the sphere sweep.  Indices refer to
    the kernel's (possibly cluster-permuted) sphere order; pass the same
    `clusters` plan to the replay.  Stored int16 when the padded slot
    count fits 15 bits (always, in practice — the mxu kernel caps slots
    at 1024), int32 otherwise: half-size residuals are what let the full
    256-spp flagship frame record its checkpoint unchunked (VERDICT r4
    item 3).

    `record_second=True` (requires with_residuals) appends a third
    output `res2` of the same shape: the runner-up sphere index (-1 when
    there is no second hit), consumed by the TWO-SIDED soft-silhouette
    boundary term in the replay (wavefront/render.py's L_bg analog).

    Returns linear float32 [H, W, 3]; agrees with the XLA path to f32
    tolerance (identical RNG counters, same math, different transcendental
    codegen).

    `clusters`: a `kernels.clusters.ClusterPlan` enables culled traversal
    (tile-vs-cluster-bound broad phase + dynamic worklist) instead of the
    reference-style brute-force scan; results are identical up to
    nearest-hit tie order.

    Stripe mode (r5, the sharded fast-gradient path): `num_local`
    (static) renders only the contiguous `num_local`-pixel stripe
    starting at absolute pixel `pixel_base` (traced — e.g. a shard_map
    rank * stripe).  RNG counters and pixel coords use absolute ids, so
    stripes compose bit-exactly with the full render.  Returns the FLAT
    [num_local, 3] stripe (no H x W reshape) and stripe-local residuals.
    """
    n = scene.count
    num_pixels = config.num_pixels
    stripe = num_local is not None
    if num_pixels >= (1 << 24):
        # Pixel coords derive from f32 pid math in-kernel (exact below
        # 2^24); an 8K-class framebuffer would corrupt silently — shard
        # the image instead (RNG keys on absolute ids, stripes compose
        # bit-exactly).
        raise ValueError(
            f"num_pixels={num_pixels} must stay below 2^24 for the fused "
            f"kernel's f32-exact pixel ids; shard larger framebuffers")
    if tile_rows is None:
        tile_rows = TILE_ROWS if clusters is None else CLUSTERED_TILE_ROWS
    tile_px = tile_rows * 128
    npix = num_local if stripe else num_pixels
    n_tiles = -(-npix // tile_px)
    p_pad = n_tiles * tile_px

    # Scene -> SMEM layouts.  inv_r keeps the sign of the radius (negative
    # radius = inward normal, the hollow-glass trick); kq = |c|^2 - r^2 is
    # the per-sphere constant of the expanded quadratic.
    radii = scene.radii
    centers = scene.centers
    m = scene.materials
    kind_f = m.kind[scene.material_id].astype(jnp.float32)
    fuzz = m.fuzz[scene.material_id]
    ior = m.ior[scene.material_id]
    albedo = m.albedo[scene.material_id]  # flatten per sphere

    cbounds = None
    if clusters is not None:
        if clusters.cluster_size % unroll != 0:
            raise ValueError(
                f"cluster_size={clusters.cluster_size} must be a multiple "
                f"of unroll={unroll}"
            )
        from bevy_raytrace_tpu.kernels.clusters import cluster_bounds

        bx, by, bz, bkq = cluster_bounds(centers, radii, clusters)
        cbounds = jnp.stack([bx, by, bz, bkq]).astype(jnp.float32)  # [4, C]
        perm = clusters.perm  # [C*L]; pad slots repeat a real sphere —
        # a duplicate produces the same t and strict-< tie-breaking keeps
        # the first, so results are unchanged.
        centers = centers[perm]
        radii = radii[perm]
        kind_f = kind_f[perm]
        fuzz = fuzz[perm]
        ior = ior[perm]
        albedo = albedo[perm]
        n_pad = clusters.n_clusters * clusters.cluster_size
    else:
        n_pad = -(-n // unroll) * unroll

    kq = jnp.sum(centers * centers, axis=-1) - radii * radii
    geom = jnp.stack(
        [centers[:, 0], centers[:, 1], centers[:, 2], kq, 1.0 / radii]
    )  # [5, N']
    mats = jnp.stack(
        [albedo[:, 0], albedo[:, 1], albedo[:, 2], kind_f, fuzz, ior]
    )  # [6, N']
    if n_pad != geom.shape[1]:
        pad = np.zeros((5, n_pad - geom.shape[1]), np.float32)
        pad[3, :] = 1e30  # kq huge -> disc < 0 -> never hits
        pad[4, :] = 1.0
        geom = jnp.concatenate([geom, jnp.asarray(pad)], axis=1)
        mpad = np.zeros((6, n_pad - mats.shape[1]), np.float32)
        mpad[5, :] = 1.0
        mats = jnp.concatenate([mats, jnp.asarray(mpad)], axis=1)

    cam = camera.pack()  # [16], core/camera.py's canonical layout

    with np.errstate(over="ignore"):
        seed = np.uint32(config.seed) + np.uint32(FRAME_MIX) * (
            np.uint32(frame) if isinstance(frame, int) else frame.astype(jnp.uint32)
        )
    base = 0 if pixel_base is None else pixel_base
    seed_arr = jnp.stack([
        jnp.asarray(seed, jnp.uint32).reshape(()),
        jnp.asarray(base).astype(jnp.uint32).reshape(()),
    ])

    res_dtype = jnp.int16 if n_pad <= 32767 else jnp.int32
    kernel = _make_kernel(
        config,
        n_pad,
        tile_rows,
        unroll,
        skip_dead_tiles,
        n_clusters=0 if clusters is None else clusters.n_clusters,
        cluster_size=0 if clusters is None else clusters.cluster_size,
        with_residuals=with_residuals,
        record_second=record_second,
        sample_base=sample_base,
        res_dtype=res_dtype,
    )
    out_shape = jax.ShapeDtypeStruct((p_pad // 128, 128), jnp.float32)
    fb_spec = pl.BlockSpec(
        (tile_rows, 128), lambda t, s: (t, 0), memory_space=pltpu.VMEM
    )
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    in_specs = [smem(), smem(), smem(), smem()]
    inputs = [geom, mats, cam, seed_arr]
    if clusters is not None:
        in_specs.append(smem())
        inputs.append(cbounds)

    out_specs = [fb_spec, fb_spec, fb_spec]
    out_shapes = [out_shape, out_shape, out_shape]
    depth = config.max_depth
    if with_residuals:
        res_spec = pl.BlockSpec(
            (1, depth * tile_rows, 128), lambda t, s: (s, t, 0),
            memory_space=pltpu.VMEM)
        res_shape = jax.ShapeDtypeStruct(
            (config.samples_per_pixel, depth * (p_pad // 128), 128),
            res_dtype)
        out_specs.append(res_spec)
        out_shapes.append(res_shape)
        if record_second:
            out_specs.append(res_spec)
            out_shapes.append(res_shape)

    scratch_shapes = []
    if skip_dead_tiles:
        scratch_shapes += [
            pltpu.VMEM((tile_rows, 128), jnp.float32) for _ in range(13)
        ] + [pltpu.SMEM((1,), jnp.int32)]
    if clusters is not None:
        scratch_shapes += [
            pltpu.SMEM((clusters.n_clusters,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, config.samples_per_pixel),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)
    fb_r, fb_g, fb_b = outs[:3]

    fb = jnp.stack(
        [fb_r.reshape(-1), fb_g.reshape(-1), fb_b.reshape(-1)], axis=-1
    )
    fb = fb[:npix] / np.float32(config.samples_per_pixel)
    img = fb if stripe else fb.reshape(config.height, config.width, 3)
    if not with_residuals:
        return img

    def regroup(raw):
        # res blocks are (s, tile) of (depth, tile_rows, 128): regroup
        # the row axis (n_tiles, depth, tile_rows) -> [spp, depth, p_pad].
        r = raw.reshape(
            config.samples_per_pixel, n_tiles, depth, tile_rows * 128)
        return jnp.swapaxes(r, 1, 2).reshape(
            config.samples_per_pixel, depth, p_pad)

    if not record_second:
        return img, regroup(outs[3])
    return img, regroup(outs[3]), regroup(outs[4])
