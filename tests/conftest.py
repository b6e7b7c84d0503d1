"""Test configuration.

Forces the CPU backend with 8 virtual devices (the multi-chip emulation
strategy: ``XLA_FLAGS=--xla_force_host_platform_device_count=8``) so the
full dtype matrix (incl. float64/complex128) and the mesh-sharded paths
run without TPU hardware.

The container's ``sitecustomize`` registers the axon TPU plugin at
interpreter start and overwrites ``jax_platforms`` to "axon,cpu", so the
env var alone is not enough — the config must be reset before any JAX
backend initializes (they initialize lazily at the first computation).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
