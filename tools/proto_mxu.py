#!/usr/bin/env python
"""Mosaic feasibility probes for the v3 MXU kernel (dev tool, run on TPU).

Each probe isolates one construct the v3 design depends on:
  P1: lax.while_loop with many (8,128) vreg carries + scalar any-alive cond
  P2: in-kernel f32 jnp.dot (S2,16)x(16,R) on the MXU
  P3: reshape (8,128)<->(1,1024) relayouts
  P4: jnp.min over sublane axis of a (S,R) array + packed argmin
  P5: equality one-hot + attribute-gather matmul
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def p1_while_vreg_carry():
    def kernel(x_ref, o_ref):
        shape = (8, 128)

        def cond(c):
            i, a, b, alive = c
            return jnp.max(jnp.where(alive, 1, 0)) > 0

        def body(c):
            i, a, b, alive = c
            a = a + 1.0
            b = b * 1.01 + a * 0.001
            alive = alive & (a < 50.0)
            return (i + 1, a, b, alive)

        i, a, b, alive = jax.lax.while_loop(
            cond, body, (0, x_ref[:], x_ref[:] * 2.0,
                         jnp.ones(shape, bool))
        )
        o_ref[:] = b + i.astype(jnp.float32)

    x = jnp.zeros((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return float(out[0, 0])


def p2_dot():
    S2, K, R = 1024, 16, 1024

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.RandomState(0).randn(S2, K), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(K, R), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S2, R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = a @ b
    return float(jnp.abs(out - ref).max() / jnp.abs(ref).max())


def p3_reshape():
    def kernel(x_ref, o_ref):
        flat = x_ref[:].reshape(1, 1024)
        back = (flat * 2.0).reshape(8, 128)
        o_ref[:] = back

    x = jnp.arange(1024, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return float(jnp.abs(out - x * 2.0).max())


def p4_min_packed():
    S, R = 512, 1024

    def kernel(t_ref, o_ref, oi_ref):
        t = t_ref[:]
        idx = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
        bits = jax.lax.bitcast_convert_type(t, jnp.int32)
        packed = (bits & ~511) | idx
        m = jnp.min(packed, axis=0, keepdims=True)  # (1, R)
        o_ref[:] = jax.lax.bitcast_convert_type(
            m & ~511, jnp.float32).reshape(8, 128)
        oi_ref[:] = (m & 511).reshape(8, 128)

    t = jnp.asarray(
        1.0 + np.random.RandomState(2).rand(S, R).astype(np.float32))
    out, oi = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(t)
    ref_i = np.argmin(np.asarray(t), axis=0)
    return int(np.sum(np.asarray(oi).reshape(-1) != ref_i))


def p5_onehot_gather():
    S, R, A = 512, 1024, 16

    def kernel(p_ref, m_ref, attr_ref, o_ref):
        onehot = (p_ref[:] == m_ref[:]).astype(jnp.float32)  # (S, R)
        g = jnp.dot(attr_ref[:], onehot,
                    preferred_element_type=jnp.float32)  # (A, R)
        o_ref[:] = g

    rs = np.random.RandomState(3)
    packed = jnp.asarray(rs.randint(0, 1 << 20, (S, R)), jnp.int32)
    m = jnp.min(packed, axis=0, keepdims=True)
    m = jnp.broadcast_to(m, (S, R))
    attr = jnp.asarray(rs.randn(A, S), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(packed, m, attr)
    am = np.argmin(np.asarray(packed), axis=0)
    ref = np.asarray(attr)[:, am]
    return float(np.abs(np.asarray(out) - ref).max())


if __name__ == "__main__":
    for name, fn in [("p1_while", p1_while_vreg_carry), ("p2_dot", p2_dot),
                     ("p3_reshape", p3_reshape), ("p4_minpack", p4_min_packed),
                     ("p5_onehot", p5_onehot_gather)]:
        t0 = time.time()
        try:
            r = fn()
            print(f"{name:12s} OK  result={r}  ({time.time()-t0:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:12s} FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
