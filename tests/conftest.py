"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware.

The container's sitecustomize pre-registers the TPU backend with
JAX_PLATFORMS already set, so plain env vars are too late — override the
platform through jax.config before any backend is touched."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
