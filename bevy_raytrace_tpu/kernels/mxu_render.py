"""Fused whole-frame path tracer, v3: MXU intersection + persistent lanes.

The round-1/round-2 kernels (`pallas_render.py`) broadcast one sphere at a
time from SMEM against the ray tile — ~25 VPU ops per (ray, sphere) test
with the scalar core in the loop, and a fixed `max_depth` bounce schedule
that pays full price for dead lanes (the bench scene's mean path length is
2.6 of depth 8).  This kernel removes both costs; same capability surface
as the reference's intersect/shade/generate/collect WGSL stages
(`src/ray_trace_node.rs:204-220`, `assets/shaders/intersect.wgsl:132-143`).

Dense (sphere, ray) intersection sweep.  Per-sphere constants live as
(S,1) columns, per-ray features as (1,R) rows; the centered quadratic
  oc = o - c,  hb = oc.d,  cq = |oc|^2 - r^2,  roots = -hb -+ sqrt(...)
is ~20 broadcast VPU ops per (sphere, ray) element with no scalar loop
and nothing for the scalar core to serialize (the v1 kernel's per-sphere
SMEM bookkeeping capped it at ~52% VPU utilization).  sqrt(disc<0) = NaN
fails every compare, so misses need no explicit test.  The nearest hit
is a packed (t-bits | sphere-idx) int32 min-reduction; near/far root
selection keeps `intersect.wgsl:108-121` semantics.  An MXU matmul was
tried for the coefficients and REJECTED: K=8 f32 contractions pad to
K=128 and need 6 bf16 passes for f32 accuracy — measured 2x slower than
the v1 scalar loop end-to-end.

Hit attributes (center, 1/r, material) come from one matmul: an equality
one-hot (packed == min) against the attribute table, with the f32
attributes pre-split into three bf16 limbs so a SINGLE bf16 MXU pass
gathers them bit-exactly (products of an exact 0/1 one-hot with bf16
limbs are exact; hi+mid+lo reassembles f32).  The winner's t is then
recomputed exactly per ray (12 ops on the small tile) so neither the 10
mantissa bits the packed key borrows nor the limb split ever reach the
image.

Persistent lanes (work-stealing refill).  The reference launches exactly
ray_count threads and lets dead rays early-out per thread
(`intersect.wgsl:154`); a SIMD tile can't early-out per lane, so at
depth 8 a fixed schedule wastes ~3x on dead lanes.  Here each lane owns
one pixel and a private sample counter: when its path dies, the SAME
round generates the lane's next camera-ray sample (the per-lane analog of
the reference's atomicAdd work distribution, `generate.wgsl:112`).  A
`lax.while_loop` runs rounds until every lane has exhausted
samples_per_pixel; per-lane radiance accumulates in registers in (sample,
bounce) order — bit-identical to the grid-over-spp schedule.

Cost balancing.  Lane count per tile is fixed, so a tile's round count is
set by its SLOWEST pixel (measured: mean E[path len] 2.6 but per-tile max
6.3).  `render_mxu` can therefore take a pixel permutation: sort pixels
by measured path length (the kernel's 4th output) from a cheap 1-spp
probe, render the permuted wavefront, un-permute the framebuffer.  RNG
counters key on absolute pixel id, so any permutation is bit-exact
(SURVEY.md §7: same stream regardless of layout).

Forward-only, like the reference's render path; gradients use the
residual-replay pair (v1 kernel forward recording winners +
kernels/replay_grad.py fused backward), with the XLA wavefront
(wavefront/render.py) as the differentiable oracle.
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

TILE_ROWS = 8
# One fused chunk (no per-chunk concatenate+min seam): r3 sweep measured
# sc=512 at 74.1M vs 70.1M for sc=64/128 on the bench scene (s_pad 512).
SPHERE_CHUNK = 512
# round_unroll > 1 measured SLOWER on v5e (r3 re-check at vp=16/sc=512:
# ru=2 -> 54M, ru=4 -> 49M vs 74M at ru=1 — register/scheduling pathology
# chaining bodies).
ROUND_UNROLL = 1
# Deep tiles: 32 pixels per lane pools straggler variance ~32-fold; r3
# sweep: vp=4 -> 65.1M, vp=16 -> 74.1M, vp=32 -> 74.6M rays/s.  Clamped
# per render so small images do not pad past their pixel count.
V_PLANES = 32
# Packed nearest-hit key: f32 t bits with the low IDX_BITS replaced by the
# sphere index.  Ties resolve to the lowest index — the reference's
# strict-< first-wins scan order (`intersect.wgsl:137-141`).
IDX_BITS = 10
_IDX_MASK = np.int32((1 << IDX_BITS) - 1)
_KEY_MASK = np.int32(~_IDX_MASK)
_NO_HIT = np.int32(np.iinfo(np.int32).max)


def _make_kernel(config: RenderConfig, s_pad: int, tile_rows: int,
                 chunk: int, sample_base: int = 0, max_rounds: int = 0,
                 n_cull: int = 0, n_prio: int = 0, round_unroll: int = 1,
                 v_planes: int = 1, track_len: bool = True, dump=None,
                 debug_expr=None):
    if (dump is not None or debug_expr) and v_planes != 1:
        raise ValueError("debug probes require v_planes == 1")
    width = np.float32(config.width)
    height = np.float32(config.height)
    t_min = np.float32(config.t_min)
    # Lane counters (sample, bounce) are carried as f32: Mosaic relayout
    # of i32 while-loop carries fails ("replicated in destination but not
    # in source"); f32 is exact for counts < 2^24.
    max_depth = np.float32(config.max_depth)
    spp = np.float32(config.samples_per_pixel)
    # Absolute sample-id offset: RNG counters use sample_base + local
    # sample index, so a render of samples [base, base+spp) draws exactly
    # the same paths those samples draw in a single full-spp render.
    base_f = np.float32(sample_base)
    # Deep tiles: each lane serves `v_planes` pixels, one after another —
    # its sample counter spans [0, v_planes * spp) and the active pixel is
    # plane floor(sample/spp).  Pooling v_planes*spp samples per lane
    # shrinks the per-lane round-count variance ~v_planes-fold, so a
    # tile's stragglers (its slowest lane sets its round count) cost far
    # less.  Per-pixel accumulation order is unchanged -> bit-identical
    # to v_planes == 1 (tested).
    spp_total = np.float32(config.samples_per_pixel * v_planes)
    n_chunks = s_pad // chunk
    shape = (tile_rows, 128)
    r_lanes = tile_rows * 128
    culled = n_cull > 0
    # Cull-chunk hit bits fold into int32 lane words (30 usable bits), so
    # phase A costs ONE vector->scalar sync per word per round — the same
    # trick as pallas_render's clustered phase A.
    _BPW = 30
    n_words = -(-n_cull // _BPW) if culled else 0

    def kernel(geom_ref, attr_ref, cam_ref, seed_ref, *rest):
        if culled:
            bnd_ref, prio_ref, pid_ref, fb_r, fb_g, fb_b, fb_len, \
                alive_ref, *state_refs = rest
            *state_refs, list_ref, count_ref = state_refs
        else:
            pid_ref, fb_r, fb_g, fb_b, fb_len, alive_ref, *state_refs = rest
        seed = seed_ref[0]
        pid_fs = [
            pid_ref[v * tile_rows:(v + 1) * tile_rows, :].astype(jnp.float32)
            for v in range(v_planes)
        ]
        pid_f = pid_fs[0]

        def plane_pid(sval):
            """Pixel id (f32, exact < 2^24) of sample index `sval`."""
            pf = pid_fs[0]
            for v in range(1, v_planes):
                pf = jnp.where(sval >= v * spp, pid_fs[v], pf)
            return pf

        def plane_sloc(sval):
            """Per-pixel (local) sample index of sample index `sval`."""
            sl = sval
            for v in range(1, v_planes):
                sl = jnp.where(sval >= v * spp, sval - v * spp, sl)
            return sl

        cox, coy, coz = cam_ref[0], cam_ref[1], cam_ref[2]
        ux, uy, uz = cam_ref[3], cam_ref[4], cam_ref[5]
        vx, vy, vz = cam_ref[6], cam_ref[7], cam_ref[8]
        wx, wy, wz = cam_ref[9], cam_ref[10], cam_ref[11]
        half_w, half_h = cam_ref[12], cam_ref[13]
        lens_r, focus = cam_ref[14], cam_ref[15]

        # Derive the loop-carry seeds from loaded data rather than splat
        # constants: Mosaic gives constant vectors a replicated layout and
        # then cannot unify it with the varying layouts the loop body
        # produces ("Invalid relayout ... replicated in destination").
        zero = pid_f * 0.0
        one = zero + 1.0
        false_v = pid_f < -1.0  # pids are non-negative -> all False
        izero = jnp.where(false_v, 1, 0)  # int32 zeros, varying layout

        def or_all(a):
            # OR-tree across lanes+sublanes; afterwards every element holds
            # the tile-wide OR, so one scalar reduce reads it out (the one
            # vector->scalar sync per word).
            sh = 64
            while sh >= 1:
                a = a | pltpu.roll(a, sh, axis=1)
                sh //= 2
            sh = tile_rows // 2
            while sh >= 1:
                a = a | pltpu.roll(a, sh, axis=0)
                sh //= 2
            return jnp.max(a)

        def flat(a):
            return a.reshape(1, r_lanes)

        # Loop-invariant hoist: the one-hot's sphere-index grid.  (Also
        # tried and reverted: pre-broadcasting the sphere columns to
        # (chunk, R) — measured 8% SLOWER than letting Mosaic broadcast
        # the (S,1) columns at use.)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (s_pad, r_lanes), 0)

        def body(carry):
            (alive, sample, bounce, ox, oy, oz, dx, dy, dz,
             tp_r, tp_g, tp_b, *acc) = carry
            rad_rs = list(acc[0:v_planes])
            rad_gs = list(acc[v_planes:2 * v_planes])
            rad_bs = list(acc[2 * v_planes:3 * v_planes])
            lens = list(acc[3 * v_planes:4 * v_planes])
            # Culled traversal: 4 extra planes cache the lane's LAST
            # winner sphere (center, r^2) — one extra test next round
            # seeds a per-lane nearest-t upper bound for phase A
            # (VERDICT r3 lever b).  pw[3] = -1 marks "no cached winner"
            # (the r^2 = -1 dud convention: NaN sqrt, never a bound).
            pw = list(acc[4 * v_planes:4 * v_planes + 4]) if culled else []
            rad_r, rad_g, rad_b = rad_rs[0], rad_gs[0], rad_bs[0]
            len_acc = lens[0]

            def repack(alive, sample, bounce, ox, oy, oz, dx, dy, dz,
                       tp_r, tp_g, tp_b):
                return (alive, sample, bounce, ox, oy, oz, dx, dy, dz,
                        tp_r, tp_g, tp_b, *rad_rs, *rad_gs, *rad_bs,
                        *lens, *pw)

            if debug_expr and debug_expr.startswith('loop_only'):
                # Timing probe: pure loop scaffolding + state I/O.
                return repack(alive, sample + 1.0, bounce, ox, oy, oz,
                              dx, dy, dz, tp_r, tp_g, tp_b)

            # ---- refill dead lanes with their pixel's next sample ------
            need = (~alive) & (sample < spp_total)
            pid_new = plane_pid(sample)
            py = jnp.floor(pid_new / width)
            px = pid_new - py * width
            pid_new_u = pid_new.astype(jnp.int32).astype(jnp.uint32)
            su = (plane_sloc(sample) + base_f).astype(jnp.int32).astype(
                jnp.uint32)
            ca, cb, cc, cd = _pcg4d(pid_new_u, su,
                                    np.uint32(CAMERA_STREAM), seed)
            cu1, cu2 = _to_unit(ca), _to_unit(cb)
            cu3, cu4 = _to_unit(cc), _to_unit(cd)
            s_im = (px + cu1) / width
            t_im = 1.0 - (py + cu2) / height
            ru = jnp.sqrt(cu3)
            phi = _TWO_PI * cu4
            du = ru * jnp.cos(phi) * lens_r
            dv = ru * jnp.sin(phi) * lens_r
            gox = cox + du * ux + dv * vx
            goy = coy + du * uy + dv * vy
            goz = coz + du * uz + dv * vz
            su_ = (2.0 * s_im - 1.0) * half_w * focus
            tv = (2.0 * t_im - 1.0) * half_h * focus
            tx = cox - focus * wx + su_ * ux + tv * vx - gox
            ty = coy - focus * wy + su_ * uy + tv * vy - goy
            tz = coz - focus * wz + su_ * uz + tv * vz - goz
            ginv = _rsqrt_guard(tx * tx + ty * ty + tz * tz)

            ox = jnp.where(need, gox, ox)
            oy = jnp.where(need, goy, oy)
            oz = jnp.where(need, goz, oz)
            dx = jnp.where(need, tx * ginv, dx)
            dy = jnp.where(need, ty * ginv, dy)
            dz = jnp.where(need, tz * ginv, dz)
            tp_r = jnp.where(need, 1.0, tp_r)
            tp_g = jnp.where(need, 1.0, tp_g)
            tp_b = jnp.where(need, 1.0, tp_b)
            bounce = jnp.where(need, 0.0, bounce)
            sample = jnp.where(need, sample + 1.0, sample)
            alive = alive | need
            # RNG stream ids for the CURRENT sample (sample counts starts).
            act = sample - 1.0
            pid = plane_pid(act).astype(jnp.int32).astype(jnp.uint32)
            cur_s = (plane_sloc(act) + base_f).astype(jnp.int32).astype(
                jnp.uint32)
            # Active-plane masks for the per-plane accumulators.
            if v_planes == 1:
                pms = [None]
            else:
                pms = [(act >= v * spp) & (act < (v + 1) * spp)
                       for v in range(v_planes)]

            def plane_add(accs, cond, vals):
                for v in range(v_planes):
                    cv = cond if pms[v] is None else (cond & pms[v])
                    accs[v] = accs[v] + jnp.where(cv, vals, 0.0)

            if track_len and debug_expr != 'livechunks':
                # Path-length cost map (drives balance_perm).  The
                # balanced MAIN pass skips this: v_planes where+adds per
                # round for an output nobody reads (r3: ~2% of the round
                # at vp=32).
                plane_add(lens, alive, 1.0)
                len_acc = lens[0]

            # ---- intersect: dense (sphere, ray) VPU sweep -------------
            # The sphere quadratic coefficients are rank-1 combinations of
            # per-sphere columns (S,1) and per-ray rows (1,R); computing
            # them as broadcast VPU fma chains beats the MXU here: a K=8
            # f32 contraction pads to K=128 and needs 6 bf16 passes for
            # f32 accuracy — a measured ~48x waste that made the matmul
            # version 2x SLOWER than the v1 scalar-loop kernel.
            #
            # The quadratic uses the centered form oc = o - c:
            #   hb = oc.d,  cq = |oc|^2 - r^2,  roots = -hb -+ sqrt(hb^2-cq)
            # NOT the expanded |o|^2 - 2 o.c + (|c|^2 - r^2): a bounce ray
            # starts exactly ON its sphere (true cq == 0), where the
            # expanded form's cancellation noise is ~|o|^2*ulp and its
            # SIGN depends on fma contraction — Mosaic contracts
            # differently than XLA, which flipped self-hit classification
            # on 9% of sphere pixels (measured).  The centered form's
            # noise is ~r^2*ulp: conditioning, not rounding-luck.
            dxr, dyr, dzr = flat(dx), flat(dy), flat(dz)
            oxr, oyr, ozr = flat(ox), flat(oy), flat(oz)

            def chunk_packed(ocx, ocy, ocz, r2c, idx):
                """Dense (chunk, R) sweep -> packed nearest-hit keys."""
                hb = ocx * dxr + ocy * dyr + ocz * dzr
                cq = (ocx * ocx + ocy * ocy + ocz * ocz) - r2c
                disc = hb * hb - cq
                # sqrt as disc * rsqrt(disc): measured 4-5% faster on v5e
                # (r4 pinned-round probe: sweep 4.21 -> 3.99 us/round;
                # plain op-count cuts — dropping the far root + select —
                # measured NULL, so the sweep is sqrt-latency-sensitive,
                # not issue-count-bound).  Differences vs sqrt are <= 2
                # ulp on the 13-bit packed key (the winner's t is
                # recomputed exactly afterwards); disc == 0 maps to
                # 0 * inf = NaN -> miss, a measure-zero true-tangency.
                # (ADVICE r4 asked about gating it: the one-select guard
                # `where(disc == 0, 0, ...)` was measured r5 at -3.8%
                # flagship / -1.5% reference -- NOT free; the documented
                # NaN->miss behavior ships.)  NaN on miss (disc < 0) as
                # before.
                sq = disc * jax.lax.rsqrt(disc)
                rn = -hb - sq
                rf = sq - hb
                tn = jnp.where(rn > t_min, rn, rf)
                valid = tn > t_min  # NaN compares false
                bits = jax.lax.bitcast_convert_type(tn, jnp.int32)
                return jnp.where(valid, (bits & _KEY_MASK) | idx, _NO_HIT)

            if debug_expr == 'nosweep':
                # Timing probe: skip the dense sweep entirely (image is
                # garbage; round count pinned by max_rounds).
                best = flat(izero) + _NO_HIT
            elif not culled:
                best = None
                for c in range(n_chunks):
                    sl = slice(c * chunk, (c + 1) * chunk)
                    # (sliced views of the hoisted iota crash Mosaic's
                    # vector_extract_strided_slice inside scf.while; a fresh
                    # in-body iota is fine.)
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, (chunk, r_lanes), 0) + np.int32(c * chunk)
                    packed = chunk_packed(
                        oxr - geom_ref[sl, 0:1], oyr - geom_ref[sl, 1:2],
                        ozr - geom_ref[sl, 2:3], geom_ref[sl, 3:4], idx)
                    # Per-chunk min + pairwise minimum, NOT a concatenate
                    # of all chunks followed by one min: the concat
                    # materialized an (S, R) seam between otherwise
                    # independent chunk chains (r3's measured multi-chunk
                    # penalty).
                    m = jnp.min(packed, axis=0, keepdims=True)  # (1, R)
                    best = m if best is None else jnp.minimum(best, m)
            else:
                # ---- priority spheres: a per-lane nearest-t upper bound -
                # The K largest spheres (RTiOW: the r=1000 ground + the
                # three r=1 heroes) dominate occlusion; their REAL hit t
                # is a true upper bound on the final nearest t, which lets
                # phase A drop every chunk whose bound starts beyond it —
                # the t-ordered early termination of a BVH walk, without
                # any ordered traversal.  Grazing rays (the RTiOW camera
                # skims the whole sphere field, so ray LINES cross most
                # chunk bounds) go from ~all chunks live to the few ahead
                # of their ground hit.
                t_ub = zero + np.float32(1e30)
                for k in range(n_prio):
                    pocx = ox - prio_ref[0, k]
                    pocy = oy - prio_ref[1, k]
                    pocz = oz - prio_ref[2, k]
                    phb = pocx * dx + pocy * dy + pocz * dz
                    pcq = (pocx * pocx + pocy * pocy + pocz * pocz
                           ) - prio_ref[3, k]
                    psq = jnp.sqrt(phb * phb - pcq)  # NaN on miss
                    prn = -phb - psq
                    prf = psq - phb
                    ptn = jnp.where(prn > t_min, prn, prf)
                    closer = (ptn > t_min) & (ptn < t_ub)  # NaN -> False
                    t_ub = jnp.where(closer, ptn, t_ub)

                # Per-lane previous-winner bound: test the lane's cached
                # last winner sphere (ONE extra test).  For a refilled
                # lane this is usually the same sphere its pixel's
                # previous sample hit — a tight camera-ray bound the
                # static priority set cannot provide.
                qocx = ox - pw[0]
                qocy = oy - pw[1]
                qocz = oz - pw[2]
                qhb = qocx * dx + qocy * dy + qocz * dz
                qcq = (qocx * qocx + qocy * qocy + qocz * qocz) - pw[3]
                qsq = jnp.sqrt(qhb * qhb - qcq)  # NaN on miss / no cache
                qrn = -qhb - qsq
                qrf = qsq - qhb
                qtn = jnp.where(qrn > t_min, qrn, qrf)
                qcloser = (qtn > t_min) & (qtn < t_ub)  # NaN -> False
                t_ub = jnp.where(qcloser, qtn, t_ub)

                # ---- phase A: ray-vs-chunk-bound tests (alive lanes) ----
                # A chunk is live only if its bound's intersection interval
                # [max(near, t_min), far] is nonempty AND starts before the
                # lane's t_ub.  Conservative, so the min below is
                # bit-identical to the full sweep.
                accs = [izero for _ in range(n_words)]
                for c in range(n_cull):
                    bx_ = bnd_ref[0, c]
                    by_ = bnd_ref[1, c]
                    bz_ = bnd_ref[2, c]
                    br2 = bnd_ref[3, c]
                    bocx = ox - bx_
                    bocy = oy - by_
                    bocz = oz - bz_
                    bhb = bocx * dx + bocy * dy + bocz * dz
                    bcq = (bocx * bocx + bocy * bocy + bocz * bocz) - br2
                    bsq = jnp.sqrt(bhb * bhb - bcq)  # NaN on miss
                    brn = -bhb - bsq
                    brf = bsq - bhb
                    # <= (not <): when the nearest hit IS a priority
                    # sphere whose chunk bound is tight, rounding can put
                    # the bound's near root exactly at t_ub; strict <
                    # would cull the winning chunk (ADVICE r2).
                    lanehit = (brf > t_min) & (brn <= t_ub) & alive
                    accs[c // _BPW] = accs[c // _BPW] | jnp.where(
                        lanehit, np.int32(1 << (c % _BPW)), 0)
                masks = [or_all(a) for a in accs]

                # Worklist of live chunk ids.  Branch-free scalar build:
                # always write chunk id c into the current slot, advance
                # the cursor only when its bit is set — a cleared bit's
                # write is overwritten by the next live chunk (slots past
                # the final count are never read).  No predicated regions
                # (pl.when scalar regions inside scf.while hang Mosaic's
                # compile, same class as pallas_render's cs=6 note).
                cnt = jnp.int32(0)
                for w, m in enumerate(masks):
                    for j in range(_BPW):
                        c = w * _BPW + j
                        if c >= n_cull:
                            break
                        list_ref[cnt] = np.int32(c)
                        cnt = cnt + ((m >> j) & 1)
                count_ref[0] = cnt

                # ---- phase B: sweep only the live chunks ----------------
                def cull_block(k, bst):
                    ci = list_ref[k]
                    base = pl.multiple_of(ci * np.int32(chunk), chunk)
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, (chunk, r_lanes), 0) + base
                    packed = chunk_packed(
                        oxr - geom_ref[pl.ds(base, chunk), 0:1],
                        oyr - geom_ref[pl.ds(base, chunk), 1:2],
                        ozr - geom_ref[pl.ds(base, chunk), 2:3],
                        geom_ref[pl.ds(base, chunk), 3:4], idx)
                    return jnp.minimum(
                        bst, jnp.min(packed, axis=0, keepdims=True))

                best = jax.lax.fori_loop(
                    0, count_ref[0], cull_block, flat(izero) + _NO_HIT)
                if debug_expr == 'livechunks':
                    # Accumulate live-chunk count per round; divided by
                    # spp on output like the path-length plane, so
                    # lenmap.sum()/rounds = mean live chunks per round.
                    len_acc = len_acc + cnt.astype(jnp.float32)
                    lens[0] = len_acc

            # ---- attribute gather: one-hot matmul, exact bf16 limbs ---
            # One bf16 MXU pass per limb triple (products of an exact 0/1
            # one-hot with bf16 limbs are exact; three limbs reassemble
            # the f32 attribute bit-for-bit).  A single-pass f32-precise
            # alternative does not exist on the MXU and HIGHEST costs 6
            # passes on a 128-padded M — measured at ~1/3 of the frame.
            # One-hot vs the winner INDEX (hoisted iota compare) — the
            # index is unique by construction, so exactly one row matches.
            if debug_expr == 'nogather':
                # Timing probe: constant attributes, no one-hot matmul.
                bcx = bcy = bcz = zero
                binv = bio = br2 = one
                bar = bag = bab = zero + 0.5
                bkd = bfz = zero
            else:
                widx = best & _IDX_MASK  # (1, R)
                onehot = jnp.where(sidx == widx, 1.0, 0.0
                                   ).astype(jnp.bfloat16)  # (S, R)
                g3 = jnp.dot(attr_ref[:], onehot,
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
            # (reshape the i32 before comparing: Mosaic rejects i1 shape
            # casts, same class of hazard as pallas_render's i1 notes.)
            hit = best.reshape(shape) != _NO_HIT

            # Exact nearest-t recompute for the winning sphere (the packed
            # key zeroed IDX_BITS mantissa bits; 12 ops on the small tile
            # restore full f32 t).  Same centered form as the sweep.  Dud
            # rows gathered on miss are benign: every product below is
            # finite and the result is masked.
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

            if debug_expr == 'noshade':
                # Timing probe: loop + sweep + gather, no shade math.
                # (where-guards keep the gather outputs live vs DCE.)
                tpk = jnp.where((bar + bag + bab + bkd + bfz + bio
                                 ) < -1e30, 0.0, tp_r)
                bounce = bounce + 1.0
                al2 = alive & hit & (bounce < max_depth)
                return repack(al2, sample, bounce, hx, hy, hz, dx, dy, dz,
                              tpk, tp_g, tp_b)

            # ---- shade (identical math to pallas_render) --------------
            ba, bb_, bc2, bd = _pcg4d(
                pid, cur_s, bounce.astype(jnp.int32).astype(jnp.uint32), seed)
            u1, u2, u3, u4 = (_to_unit(ba), _to_unit(bb_), _to_unit(bc2),
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
            plane_add(rad_rs, add, tp_r * sk_r)
            plane_add(rad_gs, add, tp_g * sk_g)
            plane_add(rad_bs, add, tp_b)

            scat = alive & hit
            if culled:
                # Cache this round's winner geometry for the next round's
                # per-lane t_ub seed (phase A early termination).
                pw[0] = jnp.where(scat, bcx, pw[0])
                pw[1] = jnp.where(scat, bcy, pw[1])
                pw[2] = jnp.where(scat, bcz, pw[2])
                pw[3] = jnp.where(scat, br2, pw[3])
            tp_r = jnp.where(scat, tp_r * at_r, tp_r)
            tp_g = jnp.where(scat, tp_g * at_g, tp_g)
            tp_b = jnp.where(scat, tp_b * at_b, tp_b)
            bounce = bounce + 1.0
            # Depth exhaustion kills with black, `shade.wgsl:236-238`.
            alive = scat & scat_ok & (bounce < max_depth)

            ox = jnp.where(alive, hx, ox)
            oy = jnp.where(alive, hy, oy)
            oz = jnp.where(alive, hz, oz)
            dx = jnp.where(alive, sx, dx)
            dy = jnp.where(alive, sy, dy)
            dz = jnp.where(alive, sz, dz)
            if debug_expr:
                # Value probes live in mxu_probes (dev tools only).
                from bevy_raytrace_tpu.kernels import mxu_probes

                probe = mxu_probes.plane_expr(debug_expr, locals())
                if probe is not None:
                    len_acc = probe
            lens[0] = len_acc
            return repack(alive, sample, bounce, ox, oy, oz, dx, dy, dz,
                          tp_r, tp_g, tp_b)

        # Mosaic legalizes vector carries for scf.for but NOT scf.while
        # ('failed to legalize scf.yield'), so the per-lane state rides in
        # VMEM scratch refs and the while carries one scalar work flag
        # (alive encoded as f32 0/1 — i1 stores are also rejected).
        init = (false_v, zero, zero,
                zero, zero, zero, zero, zero, one,
                one, one, one) + (zero,) * (4 * v_planes)
        if culled:
            # Previous-winner cache: no winner yet (r^2 = -1 dud).
            init = init + (zero, zero, zero, zero - 1.0)
        for r, v in zip(state_refs, init[1:]):
            r[:] = v
        alive_ref[:] = zero

        def ref_cond(carry):
            work, it = carry
            if max_rounds:
                return (work > 0) & (it * round_unroll < max_rounds)
            return work > 0

        def ref_body(carry):
            _, it = carry
            # `round_unroll` rounds per while iteration: the scf.while
            # scaffolding (scalar work-flag sync + branch + state-plane
            # round trip) measures ~3.6us/iteration on v5e — 42% of a
            # full round — so amortize it over several rounds.  Running
            # past a lane's completion is a masked no-op (refill guards
            # on sample < spp; radiance/len only accumulate when alive),
            # so the image is bit-identical for any unroll.
            state = (alive_ref[:] > 0.5,) + tuple(r[:] for r in state_refs)
            for _ in range(round_unroll):
                state = body(state)
            alive_ref[:] = jnp.where(state[0], 1.0, 0.0)
            for r, v in zip(state_refs, state[1:]):
                r[:] = v
            work = state[0] | (state[1] < spp_total)
            return (jnp.max(jnp.where(work, 1, 0)), it + 1)

        wout = None
        if debug_expr:
            # Alternate loop drivers for scaffolding-cost probes
            # (mxu_probes; dev tools only).
            from bevy_raytrace_tpu.kernels import mxu_probes

            wout = mxu_probes.probe_loop(debug_expr, body, state_refs,
                                         alive_ref, max_rounds)
        if wout is None:
            wout = jax.lax.while_loop(ref_cond, ref_body,
                                      (jnp.int32(1), jnp.int32(0)))
        if debug_expr == 'rounds' or dump is not None:
            from bevy_raytrace_tpu.kernels import mxu_probes

            mxu_probes.write_output(debug_expr, dump,
                                    (fb_r, fb_g, fb_b, fb_len),
                                    state_refs, alive_ref, wout,
                                    round_unroll, zero)
        else:
            for v in range(v_planes):
                sl = slice(v * tile_rows, (v + 1) * tile_rows)
                fb_r[sl, :] = state_refs[11 + v][:]
                fb_g[sl, :] = state_refs[11 + v_planes + v][:]
                fb_b[sl, :] = state_refs[11 + 2 * v_planes + v][:]
                fb_len[sl, :] = state_refs[11 + 3 * v_planes + v][:]

    return kernel


def _scene_matrices(scene, s_pad, plan=None):
    """Scene -> (geom [S,8] f32, attr limbs [48,S] bf16, bnd) operands.

    geom columns: [cx, cy, cz, r^2, 0...] — consumed as (S,1) broadcast
    columns by the dense VPU intersection sweep.  attrs are split into
    three bf16 limbs (hi, mid, lo with f32 = hi+mid+lo exactly) so the
    one-hot gather matmul runs in ONE bf16 MXU pass yet reassembles
    attribute values bit-exactly.

    `plan` (a `clusters.ClusterPlan`): Morton-permute the spheres into
    spatially coherent chunks of `plan.cluster_size` and also return
    `bnd` [4, n_clusters] = per-chunk bounding spheres [bx, by, bz, br^2]
    for the kernel's phase-A cull (bounds come from the LIVE geometry, so
    per-frame sphere edits need no replanning).  Pad slots duplicate a
    real sphere of the same chunk: a duplicate yields the same t at a
    higher packed index, and the min keeps the lower — results unchanged.
    """
    n = scene.count
    centers = scene.centers
    radii = scene.radii
    m = scene.materials
    kind_f = m.kind[scene.material_id].astype(jnp.float32)
    fuzz = m.fuzz[scene.material_id]
    ior = m.ior[scene.material_id]
    albedo = m.albedo[scene.material_id]
    bnd = None
    prio = None
    if plan is not None:
        from bevy_raytrace_tpu.kernels.clusters import cluster_bounds

        bx, by, bz, kq = cluster_bounds(centers, radii, plan)
        br2 = bx * bx + by * by + bz * bz - kq
        bnd = jnp.stack([bx, by, bz, br2]).astype(jnp.float32)  # [4, C]
        # Priority spheres: the K largest by |r| provide the per-lane
        # nearest-t upper bound for phase A's early termination.  The
        # SELECTION is static (host argsort of the concrete radii at plan
        # time would break tracing; plan.prio holds it) but the VALUES are
        # live geometry.
        pk = plan.prio
        prio = jnp.stack([
            centers[pk, 0], centers[pk, 1], centers[pk, 2],
            radii[pk] * radii[pk],
        ]).astype(jnp.float32)  # [4, K]
        perm = plan.perm
        centers = centers[perm]
        radii = radii[perm]
        kind_f = kind_f[perm]
        fuzz = fuzz[perm]
        ior = ior[perm]
        albedo = albedo[perm]
        n = perm.shape[0]  # == s_pad: already chunk-padded by the plan

    def padded(v, fill=0.0):
        return jnp.concatenate(
            [v, jnp.full((s_pad - n,), fill, jnp.float32)])

    cx = padded(centers[:, 0])
    cy = padded(centers[:, 1])
    cz = padded(centers[:, 2])
    # Dud rows: r^2 = -1 makes cq = |oc|^2 + 1 > hb^2 -> NaN sqrt ->
    # never a hit (no huge-magnitude sentinel needed).
    r2p = padded(radii * radii, -1.0)
    z = jnp.zeros((s_pad,), jnp.float32)
    geom = jnp.stack([cx, cy, cz, r2p, z, z, z, z], axis=1)  # (S, 8)
    attrs = jnp.stack([
        cx, cy, cz, padded(1.0 / radii, 1.0),
        padded(albedo[:, 0]), padded(albedo[:, 1]), padded(albedo[:, 2]),
        padded(kind_f), padded(fuzz), padded(ior, 1.0), r2p,
        z, z, z, z, z,
    ])  # (16, S)
    # Limb split via bit masking, NOT dtype casts: under TPU XLA's
    # --xla_allow_excess_precision=true the round-trip `a - bf16(a)` is
    # legally folded to zero (verified on hardware — the gather silently
    # became hi-limb-only).  The shared splitter documents the contract.
    from bevy_raytrace_tpu.core.geometry import split_bf16_limbs

    hi32, mid32, lo32 = split_bf16_limbs(attrs)
    limbs = jnp.concatenate([
        hi32.astype(jnp.bfloat16),
        mid32.astype(jnp.bfloat16),
        lo32.astype(jnp.bfloat16),
    ], axis=0)  # (48, S) bf16
    return geom, limbs, bnd, prio


def render_mxu(
    scene,
    camera,
    config: RenderConfig,
    frame=0,
    interpret: bool = False,
    tile_rows: int = TILE_ROWS,
    sphere_chunk: int = 0,
    perm=None,
    plan=None,
    round_unroll: int = ROUND_UNROLL,
    v_planes: int = V_PLANES,
):
    """Forward render on the v3 kernel -> linear float32 [H, W, 3].

    `perm`: optional int32 [num_pixels] permutation of absolute pixel ids
    (from `balance_perm`); lanes render perm[i] and the framebuffer is
    scattered back, so the image is bit-identical for any perm.
    """
    img, _ = render_mxu_with_len(
        scene, camera, config, frame, interpret=interpret,
        tile_rows=tile_rows, sphere_chunk=sphere_chunk, perm=perm,
        plan=plan, round_unroll=round_unroll, v_planes=v_planes,
        track_len=False)
    return img


def render_mxu_lanes(
    scene,
    camera,
    config: RenderConfig,
    pid_grid,
    frame=0,
    interpret: bool = False,
    tile_rows: int = TILE_ROWS,
    sphere_chunk: int = 0,
    sample_base: int = 0,
    max_rounds: int = 0,
    plan=None,
    round_unroll: int = ROUND_UNROLL,
    v_planes: int = V_PLANES,
    track_len: bool = True,
    dump=None,
    debug_expr=None,
):
    """Raw lane-slot render: `pid_grid` int32 [n_tiles*tile_rows, 128]
    holds the ABSOLUTE pixel id each lane renders (values may be traced —
    e.g. offset by a shard_map axis_index).  Returns (fb [p_pad, 3],
    len [p_pad]) in lane-slot order, already divided by spp.

    `plan` (a `clusters.ClusterPlan`) enables chunk-culled traversal:
    spheres are Morton-permuted into chunks of `plan.cluster_size`, each
    round tests chunk bounds first and dense-sweeps only live chunks.
    Results are bit-identical to the brute-force sweep (conservative
    bounds; duplicate pads lose min ties)."""
    if dump is not None or debug_expr:
        v_planes = 1
    n_rows = pid_grid.shape[0]
    n_tiles = n_rows // (tile_rows * v_planes)
    p_pad = n_rows * 128
    if plan is not None:
        sphere_chunk = plan.cluster_size
        s_pad = plan.n_clusters * plan.cluster_size
    else:
        if not sphere_chunk:
            # Auto: one fused chunk sized to the scene.  Two candidate
            # granularities (r5, both measured on v5e):
            #   8-row  (Mosaic sublane min) — fewest dud rows, but a
            #          non-128 chunk costs ~12% in sweep/gather layout
            #          (488 measured 8% SLOWER than 512 on the 486-
            #          sphere flagship despite 4.7% fewer rows);
            #   128-row — alignment-clean, but pads small scenes hard
            #          (197 -> 256 = 23% dud rows; 200 measured +8.6%
            #          over 256 on the reference scene, ref_probe.py).
            # Pick 8-row only when it saves >= 15% of the rows — the
            # measured break-even of the alignment penalty.  Chunking
            # only reorders the packed-key min, so results are
            # bit-identical at any granularity.
            cand8 = max(-(-scene.count // 8), 1) * 8
            cand128 = max(-(-scene.count // 128), 1) * 128
            sphere_chunk = min(SPHERE_CHUNK,
                               cand8 if cand8 <= 0.85 * cand128 else cand128)
        s_pad = max(-(-scene.count // sphere_chunk), 1) * sphere_chunk

    p_lanes = pid_grid.shape[0] * 128
    if p_lanes >= (1 << 24) or config.samples_per_pixel * v_planes >= (1 << 24):
        # Pixel ids and per-lane sample counters ride in f32 planes
        # (Mosaic cannot carry i32 through the while loop) — exact only
        # below 2^24.  An 8K-class framebuffer or an absurd spp would
        # corrupt silently; shard the image instead (render_mxu_sharded
        # keys RNG on absolute ids, so stripes compose bit-exactly).
        raise ValueError(
            f"pixel lanes ({p_lanes}) and samples_per_pixel*v_planes "
            f"({config.samples_per_pixel * v_planes}) must stay below "
            f"2^24 (f32-exact lane counters); shard larger framebuffers")
    if s_pad > (1 << IDX_BITS):
        # The packed nearest-hit key carries IDX_BITS of sphere index;
        # more spheres would silently attribute winners to the wrong
        # sphere (index wraparound), not merely lose precision.
        raise ValueError(
            f"the v3 kernel's packed key supports at most {1 << IDX_BITS} "
            f"sphere slots (IDX_BITS={IDX_BITS}); got {s_pad} "
            f"(scene.count={scene.count}).  Use the pallas or xla backend "
            f"for larger scenes, or raise IDX_BITS (costs nearest-hit key "
            f"precision).")

    geom, limbs, bnd, prio = _scene_matrices(scene, s_pad, plan)

    cam = camera.pack()
    with np.errstate(over="ignore"):
        seed = np.uint32(config.seed) + np.uint32(FRAME_MIX) * (
            np.uint32(frame) if isinstance(frame, int)
            else frame.astype(jnp.uint32))
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape(1)

    n_cull = plan.n_clusters if plan is not None else 0
    n_prio = int(prio.shape[1]) if plan is not None else 0
    kernel = _make_kernel(config, s_pad, tile_rows, sphere_chunk,
                          sample_base=sample_base, max_rounds=max_rounds,
                          n_cull=n_cull, n_prio=n_prio,
                          round_unroll=round_unroll, v_planes=v_planes,
                          track_len=track_len, dump=dump,
                          debug_expr=debug_expr)
    out_shape = jax.ShapeDtypeStruct((n_rows, 128), jnp.float32)
    fb_spec = pl.BlockSpec((tile_rows * v_planes, 128), lambda t: (t, 0),
                           memory_space=pltpu.VMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    in_specs = [vmem(), vmem(), smem(), smem()]
    inputs = [geom, limbs, cam, seed_arr]
    if plan is not None:
        in_specs += [smem(), smem()]
        inputs += [bnd, prio]
    in_specs.append(pl.BlockSpec((tile_rows * v_planes, 128),
                                 lambda t: (t, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(pid_grid)
    # alive + 11 + 4*v_planes per-lane state planes (see _make_kernel:
    # scf.while cannot carry vectors, so the round loop's state lives
    # here).
    n_state = 12 + 4 * v_planes + (4 if plan is not None else 0)
    scratch_shapes = [pltpu.VMEM((tile_rows, 128), jnp.float32)
                      for _ in range(n_state)]
    if plan is not None:
        scratch_shapes += [pltpu.SMEM((n_cull,), jnp.int32),
                           pltpu.SMEM((1,), jnp.int32)]

    fb_r, fb_g, fb_b, fb_len = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(fb_spec,) * 4,
        out_shape=(out_shape,) * 4,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*inputs)

    inv_spp = np.float32(1.0 / config.samples_per_pixel)
    fb = jnp.stack([fb_r.reshape(-1), fb_g.reshape(-1), fb_b.reshape(-1)],
                   axis=-1) * inv_spp
    ln = fb_len.reshape(-1) * inv_spp
    return fb, ln


def lane_pad(num_pixels: int, tile_rows: int = TILE_ROWS,
             v_planes: int = V_PLANES) -> int:
    """Lane-slot count for `num_pixels` (rounded up to whole tiles).

    v_planes is clamped the same way the renderers clamp it, so a small
    image is never padded past its own pixel count."""
    v_planes = max(1, min(v_planes, num_pixels // (tile_rows * 128)))
    tile_px = tile_rows * 128 * v_planes
    return -(-num_pixels // tile_px) * tile_px


def render_mxu_with_len(
    scene,
    camera,
    config: RenderConfig,
    frame=0,
    interpret: bool = False,
    tile_rows: int = TILE_ROWS,
    sphere_chunk: int = 0,
    perm=None,
    sample_base: int = 0,
    plan=None,
    round_unroll: int = ROUND_UNROLL,
    v_planes: int = V_PLANES,
    track_len: bool = True,
):
    """As `render_mxu`, also returning per-pixel mean path length [H, W]
    (the cost map that drives `balance_perm`; all-zero with
    track_len=False, which saves ~2% of the round)."""
    num_pixels = config.num_pixels
    # Deep tiles must not pad a small image past its pixel count: clamp
    # so one tile covers at most the whole image.
    v_planes = max(1, min(v_planes, num_pixels // (tile_rows * 128)))
    if config.max_depth <= 0:
        # Depth 0 = no path segments at all (`lax.scan` over zero rounds
        # in the XLA path); the refill loop always runs >= 1 round, so
        # short-circuit here.
        return (jnp.zeros((config.height, config.width, 3), jnp.float32),
                jnp.zeros((config.height, config.width), jnp.float32))
    p_pad = lane_pad(num_pixels, tile_rows, v_planes)

    if perm is None:
        pids = jnp.arange(p_pad, dtype=jnp.int32)
    else:
        pids = jnp.concatenate([
            jnp.asarray(perm, jnp.int32),
            jnp.arange(num_pixels, p_pad, dtype=jnp.int32),
        ])

    fb, ln = render_mxu_lanes(
        scene, camera, config, pids.reshape(p_pad // 128, 128), frame,
        interpret=interpret, tile_rows=tile_rows, sphere_chunk=sphere_chunk,
        sample_base=sample_base, plan=plan, round_unroll=round_unroll,
        v_planes=v_planes, track_len=track_len)

    # Scatter lane slots back to their absolute pixels (no-op for the
    # identity perm; drops the padding lanes either way).
    img = jnp.zeros((num_pixels, 3), jnp.float32)
    img = img.at[pids[:num_pixels]].set(fb[:num_pixels])
    lmap = jnp.zeros((num_pixels,), jnp.float32)
    lmap = lmap.at[pids[:num_pixels]].set(ln[:num_pixels])
    return (img.reshape(config.height, config.width, 3),
            lmap.reshape(config.height, config.width))


@functools.lru_cache(maxsize=8)
def _morton_rank(height: int, width: int):
    """Raster pid -> rank along the Morton (Z-order) curve of (x, y).

    Static per resolution; used as the secondary sort key so equal-cost
    pixels stay spatially compact (coherent tiles see few live chunks in
    the culled traversal)."""
    y, x = np.mgrid[0:height, 0:width].astype(np.uint64)

    def part(v):
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    code = (part(x) | (part(y) << np.uint64(1))).reshape(-1)
    rank = np.empty(code.size, np.int32)
    rank[np.argsort(code, kind="stable")] = np.arange(code.size,
                                                      dtype=np.int32)
    return rank


def balance_perm(len_map, coherent: bool = True, quant: float = 2.0):
    """Pixel permutation sorting by measured path length.

    Lanes of one tile then share similar per-sample cost, so the refill
    loop's round count tracks the tile MEAN path length instead of its
    max (measured 2.6 vs 6.3 on the bench scene — the whole wavefront
    finishes ~2.4x fewer rounds).

    `coherent` (default): quantize the cost to 1/`quant` steps and break
    ties along the Morton curve of the pixel grid, so tiles stay both
    cost-uniform AND spatially compact — the latter is what makes the
    chunk-culled traversal see few live chunks per tile.
    """
    ln = len_map.reshape(-1)
    if not coherent:
        return jnp.argsort(ln).astype(jnp.int32)
    h, w = len_map.shape
    n = h * w
    rank = jnp.asarray(_morton_rank(h, w))
    key = jnp.round(ln * np.float32(quant)).astype(jnp.int32) * np.int32(n)
    return jnp.argsort(key + rank).astype(jnp.int32)


def render_mxu_balanced(scene, camera, config: RenderConfig, frame=0,
                        probe_spp: int = 16, interpret: bool = False,
                        tile_rows: int = TILE_ROWS,
                        sphere_chunk: int = 0,
                        probe_reuse: bool = True, plan=None,
                        round_unroll: int = ROUND_UNROLL,
                        v_planes: int = V_PLANES):
    """Probe (probe_spp samples, identity layout) -> cost-sorted render.

    With `probe_reuse` (default) the probe's samples COUNT: the probe
    renders samples [0, probe_spp), the balanced main pass renders
    [probe_spp, spp), and the two accumulations are averaged — the probe
    is then almost free, so it can afford enough samples (16) to sort
    accurately.  Every path is identical to the plain render's; only the
    per-pixel summation association differs (allclose at f32, not
    bit-equal).  With probe_reuse=False the probe is discarded and the
    image is bit-identical to `render_mxu(...)`.
    """
    import dataclasses

    probe_spp = min(probe_spp, config.samples_per_pixel)
    probe_cfg = dataclasses.replace(config, samples_per_pixel=probe_spp,
                                    spp_chunk=0)
    probe_img, len_map = render_mxu_with_len(
        scene, camera, config=probe_cfg, frame=frame, interpret=interpret,
        tile_rows=tile_rows, sphere_chunk=sphere_chunk, plan=plan,
        round_unroll=round_unroll, v_planes=v_planes)
    perm = balance_perm(len_map)
    if not probe_reuse or probe_spp == config.samples_per_pixel:
        return render_mxu(scene, camera, config, frame, interpret=interpret,
                          tile_rows=tile_rows, sphere_chunk=sphere_chunk,
                          perm=perm, plan=plan, round_unroll=round_unroll,
                          v_planes=v_planes)
    rest = config.samples_per_pixel - probe_spp
    rest_cfg = dataclasses.replace(config, samples_per_pixel=rest,
                                   spp_chunk=0)
    rest_img, _ = render_mxu_with_len(
        scene, camera, config=rest_cfg, frame=frame, interpret=interpret,
        tile_rows=tile_rows, sphere_chunk=sphere_chunk, perm=perm,
        sample_base=probe_spp, plan=plan, round_unroll=round_unroll,
        v_planes=v_planes, track_len=False)
    w = np.float32(1.0 / config.samples_per_pixel)
    return (probe_img * (w * probe_spp)) + (rest_img * (w * rest))
