#!/usr/bin/env python
"""VPU throughput probe (dev tool, run on TPU).

Measures the dense intersection sweep's arithmetic in isolation:
  f32   — the production chunk_packed op chain on (S, R) f32
  bf16  — the same chain on bf16 (packed (16,128) native tiles): IF the
          VPU executes packed bf16 at 2 elements/lane/cycle this halves
          sweep cost; if not, parity with f32 kills the idea.
  fma   — pure fma chain (the op-throughput speed of light)

Each kernel loops `iters` times over the chain inside the kernel so the
measurement is VPU-bound, not launch/HBM-bound.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, R = 256, 1024
ITERS = 4000


def sweep_kernel(dtype):
    def kernel(g_ref, r_ref, o_ref):
        cx = g_ref[:, 0:1]
        cy = g_ref[:, 1:2]
        cz = g_ref[:, 2:3]
        r2 = g_ref[:, 3:4]
        oxr = r_ref[0:1, :]
        oyr = r_ref[1:2, :]
        ozr = r_ref[2:3, :]
        dxr = r_ref[3:4, :]
        dyr = r_ref[4:5, :]
        dzr = r_ref[5:6, :]
        t_min = 1e-3

        def body(i, carry):
            # carry: (1, R) row fed back into the origin so the loop body
            # cannot be hoisted as loop-invariant.
            ox_i = oxr + carry * 1e-30
            ocx = ox_i - cx
            ocy = oyr - cy
            ocz = ozr - cz
            hb = ocx * dxr + ocy * dyr + ocz * dzr
            cq = (ocx * ocx + ocy * ocy + ocz * ocz) - r2
            sq = jnp.sqrt(hb * hb - cq)
            rn = -hb - sq
            rf = sq - hb
            tn = jnp.where(rn > t_min, rn, rf)
            valid = tn > t_min
            picked = jnp.where(valid, tn, 3.0)
            return jnp.min(picked, axis=0, keepdims=True).astype(dtype)

        acc = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((1, R), dtype))
        o_ref[:] = acc.astype(jnp.float32) + 1.0

    return kernel


def fma_kernel(dtype):
    def kernel(g_ref, r_ref, o_ref):
        x = g_ref[:, 0:1] * r_ref[0:1, :]

        def body(i, x):
            # 16 dependent-ish fmas split into 4 chains for ILP
            a = x * 1.0001 + 0.1
            b = x * 0.9999 + 0.2
            c = a * 1.0002 + b
            d = b * 0.9998 + a
            for _ in range(3):
                a = a * 1.0001 + c
                b = b * 0.9999 + d
                c = c * 1.0002 + a
                d = d * 0.9998 + b
            return (a + b + c + d).astype(dtype)

        x = jax.lax.fori_loop(0, ITERS, body, x)
        o_ref[:] = jnp.min(x.astype(jnp.float32), axis=0, keepdims=True)

    return kernel


def run(name, kernel, dtype, ops_per_elem):
    g = jnp.asarray(np.random.rand(S, 8) + 1.0, dtype)
    r = jnp.asarray(np.random.rand(8, R), dtype)
    fn = jax.jit(functools.partial(
        pl.pallas_call,
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(kernel))
    float(np.asarray(fn(g, r))[0, 0])  # warm (D2H forces completion;
    # block_until_ready phantom-returns through the axon tunnel)
    times = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(fn(g, r))[0, 0])
        times.append(time.time() - t0)
    dt = min(times)
    tops = S * R * ITERS * ops_per_elem / dt / 1e12
    print(f"{name:12s} {dt * 1e3:7.2f} ms  {tops:6.2f} Tops/s "
          f"({S * R * ITERS / dt / 1e9:.1f} Gelem/s)", flush=True)


def sweep_full_dep(variant):
    """Production-like sweep: ALL ray rows perturbed by the carry, so
    nothing hoists.  variant: 'prod' | 'nosqrt' | 'norecip' trims ops to
    localize the gap vs pure-fma throughput."""

    def kernel(g_ref, r_ref, o_ref):
        cx = g_ref[:, 0:1]
        cy = g_ref[:, 1:2]
        cz = g_ref[:, 2:3]
        r2 = g_ref[:, 3:4]
        t_min = 1e-3

        def body(i, carry):
            e = carry * 1e-30
            oxr = r_ref[0:1, :] + e
            oyr = r_ref[1:2, :] + e
            ozr = r_ref[2:3, :] + e
            dxr = r_ref[3:4, :] + e
            dyr = r_ref[4:5, :] + e
            dzr = r_ref[5:6, :] + e
            ocx = oxr - cx
            ocy = oyr - cy
            ocz = ozr - cz
            hb = ocx * dxr + ocy * dyr + ocz * dzr
            cq = (ocx * ocx + ocy * ocy + ocz * ocz) - r2
            if variant == "nosqrt":
                sq = hb * hb - cq
            else:
                sq = jnp.sqrt(hb * hb - cq)
            rn = -hb - sq
            rf = sq - hb
            tn = jnp.where(rn > t_min, rn, rf)
            valid = tn > t_min
            bits = jax.lax.bitcast_convert_type(tn, jnp.int32)
            idx = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
            packed = jnp.where(valid, (bits & ~1023) | idx, 2**31 - 1)
            best = jnp.min(packed, axis=0, keepdims=True)
            return jax.lax.bitcast_convert_type(
                best & ~1023, jnp.float32)

        acc = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((1, R), jnp.float32))
        o_ref[:] = acc

    return kernel



if __name__ == "__main__":
    print(f"probe: (S,R)=({S},{R}) x {ITERS} iters", flush=True)
    run("sweep f32", sweep_kernel(jnp.float32), jnp.float32, 21)
    # bf16 sweep: REJECTED on v5e — Mosaic "Target does not support this
    # comparison" for vector bf16 cmpf; compares must be f32.
    run("fma f32", fma_kernel(jnp.float32), jnp.float32, 17)
    run("fma bf16", fma_kernel(jnp.bfloat16), jnp.bfloat16, 17)
    run("dep prod", sweep_full_dep("prod"), jnp.float32, 27)
    run("dep nosqrt", sweep_full_dep("nosqrt"), jnp.float32, 27)


