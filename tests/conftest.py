"""Test harness: force CPU JAX with 8 virtual devices so every test runs
without TPU hardware (the analog of the reference's device-free `none`
backend testing, reference: tests/online.rs:1-4).

Note: the environment pins JAX_PLATFORMS=axon (single real TPU) and a
sitecustomize pre-imports jax, so both the env var and the config must be
overridden here, before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
