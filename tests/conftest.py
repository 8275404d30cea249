"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: under the axon TPU tunnel the JAX_PLATFORMS env var is not honored,
but jax.config.update('jax_platforms', ...) before first backend use is.
"""

import os

# pin the numpy ray sampler: the native one is contract-identical but has
# a different RNG stream, and outer_sample defaults to auto (use native
# when libfastloader.so is built); tests opt in explicitly where intended
os.environ.setdefault("VQNERF_NATIVE_SAMPLER", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
