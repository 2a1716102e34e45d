"""Test harness: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use this virtual mesh; TPU-only Pallas kernels
fall back to their XLA paths automatically on CPU.

NOTE: this environment's sitecustomize registers an 'axon' TPU backend and
force-sets ``jax_platforms=axon,cpu`` via jax.config (so plain env vars are
ignored); the config update below must come after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
