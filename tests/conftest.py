"""Test configuration: force the CPU backend with 8 virtual devices.

This environment pre-imports jax (axon sitecustomize) with
JAX_PLATFORMS=axon pointing at tunneled TPU hardware; plain env vars are
therefore too late, and jax.config.update is the only effective override.
Tests must run on the virtual CPU mesh — both to exercise multi-device
sharding without hardware and to avoid contending for the single real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
