"""Test-session setup: force the CPU backend with 8 virtual devices.

SURVEY.md §4 item 4: distributed tests without a cluster use JAX's standard
trick — `--xla_force_host_platform_device_count=8` gives a fake 8-device CPU
mesh so pjit/shard_map logic is exercised for real.

This environment additionally ships an `axon` remote-TPU plugin whose
sitecustomize force-sets `jax_platforms=axon,cpu` at interpreter start (so
plain `JAX_PLATFORMS=cpu` in the env is overridden); tests must not run
through the remote-TPU tunnel, so we re-force the CPU platform via
jax.config after import, before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
