"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware."""

import os

# Hard override: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel)
# and its sitecustomize imports jax at interpreter startup, latching
# jax_platforms before this file runs. Setting os.environ alone is therefore
# too late — jax.config must be updated directly (backends initialize lazily,
# so this still lands before any device is created).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
