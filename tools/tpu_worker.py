#!/usr/bin/env python
"""Persistent TPU job worker (dev tool).

The axon tunnel's cold start costs minutes per process, so kernel
iteration runs through one long-lived process: this daemon warms the
device once, then executes job files submitted to /tmp/tpuq/.

Protocol: drop `job_<name>.py` into /tmp/tpuq/; the worker execs it
in-process (shared jax caches), captures stdout/stderr + traceback into
`job_<name>.out`, then renames the job to `job_<name>.done`.  Jobs run
sequentially in submission (mtime) order.  `STATUS` holds worker state.
"""
import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QDIR = "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)


def status(msg):
    with open(os.path.join(QDIR, "STATUS"), "w") as f:
        f.write(f"{time.time():.0f} {msg}\n")
    print(msg, flush=True)


status("importing jax")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

status("warming up device")
t0 = time.time()
val = float(jnp.ones((8, 8)).sum())
status(f"ready (warmup {time.time()-t0:.0f}s, {jax.devices()})")

while True:
    jobs = sorted(
        (f for f in os.listdir(QDIR)
         if f.startswith("job_") and f.endswith(".py")),
        key=lambda f: os.path.getmtime(os.path.join(QDIR, f)),
    )
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(QDIR, job)
    out_path = path[:-3] + ".out"
    status(f"running {job}")
    buf = io.StringIO()
    t0 = time.time()
    # Pick up source edits between jobs: purge the project's modules so
    # the job re-imports fresh code (jax itself stays warm).
    for mod in [m for m in sys.modules if m.startswith("bevy_raytrace_tpu")]:
        del sys.modules[mod]
    try:
        with open(path) as f:
            code = f.read()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            exec(compile(code, path, "exec"), {"__name__": "__tpu_job__"})
        verdict = "OK"
    except BaseException:
        buf.write(traceback.format_exc())
        verdict = "FAIL"
    with open(out_path, "w") as f:
        f.write(f"# {verdict} in {time.time()-t0:.1f}s\n")
        f.write(buf.getvalue())
    os.rename(path, path[:-3] + ".done")
    status(f"idle (last: {job} {verdict})")
