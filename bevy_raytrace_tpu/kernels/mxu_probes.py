"""Probe surface for the v3 kernel — dev tools only, never the bench path.

The r1-r3 perf work (BENCHMARKS.md's roofline) was driven by timing and
value probes compiled INTO the kernel; by r3 ~120 lines of probe branches
had accreted inside the hot body (VERDICT r3 weak #7).  This module now
owns that surface: `mxu_render._make_kernel` keeps only short clearly-
marked structural gates (skip-the-sweep / skip-the-shade timing probes,
which by nature cut across the body), and calls out here for

  * `plane_expr`   — value probes: dump a chosen intermediate plane into
                     the path-length output (`debug_expr='bt'|'winner'|
                     'nx'|...`), read back via render_mxu_lanes;
  * `probe_loop`   — alternate round-loop drivers for timing the scf.while
                     scaffolding itself (`loop_min`, `loop_half`, `*fori`);
  * `write_output` — debug output routing (`debug_expr='rounds'`, `dump=`
                     state-plane dumps) replacing the framebuffer write.

Consumed by tools/round_probe.py, tools/livechunks.py, tools/sweep_mxu.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plane_expr(debug_expr, env):
    """Value-probe plane for `debug_expr`, or None if it is not one.

    `env` is the kernel body's locals() at the end of the shade stage;
    expressions index it so the kernel body needs exactly one call site.
    """
    from bevy_raytrace_tpu.kernels.mxu_render import _IDX_MASK

    table = {
        "winner": lambda e: (e["best"] & _IDX_MASK).reshape(
            e["shape"]).astype(jnp.float32),
        "bt": lambda e: e["bt"],
        "kind": lambda e: e["bkd"],
        "albr": lambda e: e["bar"],
        "u1": lambda e: e["u1"],
        "nx": lambda e: e["nx"],
        "lx": lambda e: e["lx"],
        "mx": lambda e: e["mx"],
        "ex": lambda e: e["ex"],
        "sx": lambda e: e["sx"],
        "hitf": lambda e: jnp.where(e["hit"], 1.0, 0.0),
        "bcx": lambda e: e["bcx"],
        "br2": lambda e: e["br2"],
        "binv": lambda e: e["binv"],
        "btm": lambda e: jnp.where(e["hit"], e["bt"], 0.0),
        "hx": lambda e: e["hx"],
    }
    fn = table.get(debug_expr)
    return fn(env) if fn else None


def probe_loop(debug_expr, body, state_refs, alive_ref, max_rounds):
    """Alternate round-loop drivers for scaffolding-cost probes.

    Returns a (work, iterations) pair like the production while loop, or
    None when `debug_expr` is not a loop probe (production loop runs).
    """
    if debug_expr == "loop_min":
        # One plane read+write per round, nothing else.
        def min_body(i, z):
            state_refs[0][:] = state_refs[0][:] + 1.0
            return z

        jax.lax.fori_loop(0, max_rounds, min_body, jnp.int32(0))
        return (jnp.int32(0), jnp.int32(max_rounds))
    if debug_expr == "loop_half":
        # 8 planes round-tripped per round.
        def half_body(i, z):
            for r in state_refs[:8]:
                r[:] = r[:] + 1.0
            return z

        jax.lax.fori_loop(0, max_rounds, half_body, jnp.int32(0))
        return (jnp.int32(0), jnp.int32(max_rounds))
    if debug_expr and debug_expr.endswith("fori"):
        # Same body under scf.for (no per-round scalar work-flag sync),
        # pinned to max_rounds iterations.
        def fori_body(i, z):
            state = (alive_ref[:] > 0.5,) + tuple(r[:] for r in state_refs)
            out = body(state)
            alive_ref[:] = jnp.where(out[0], 1.0, 0.0)
            for r, v in zip(state_refs, out[1:]):
                r[:] = v
            return z

        jax.lax.fori_loop(0, max_rounds, fori_body, jnp.int32(0))
        return (jnp.int32(0), jnp.int32(max_rounds))
    return None


def write_output(debug_expr, dump, outs, state_refs, alive_ref, wout,
                 round_unroll, zero):
    """Debug output routing; returns True if it wrote (production write
    is skipped)."""
    fb_r, fb_g, fb_b, fb_len = outs
    if debug_expr == "rounds":
        # Per-tile round count, broadcast over the len plane.
        fb_r[:] = state_refs[11][:]
        fb_g[:] = state_refs[12][:]
        fb_b[:] = state_refs[13][:]
        fb_len[:] = zero + (wout[1] * round_unroll).astype(jnp.float32)
        return True
    if dump is not None:
        # Dump chosen state planes (-1 = alive) instead of fb.
        for o, di in zip(outs, dump):
            o[:] = alive_ref[:] if di < 0 else state_refs[di][:]
        return True
    return False
