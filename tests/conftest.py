"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the one capability the reference lacked — SURVEY §4).

The container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the TPU tunnel), which locks the config default before
this conftest runs — so we must update the live config, not the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
