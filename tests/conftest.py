"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests run against 8 virtual CPU devices
(xla_force_host_platform_device_count) so multi-chip layouts are validated
without TPU hardware, per SURVEY.md section 4.

NOTE: this environment registers an 'axon' TPU PJRT plugin that ignores the
JAX_PLATFORMS env var, so we must force the platform through jax.config
*before* any backend is initialized.
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
