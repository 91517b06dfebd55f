"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile checks;
tests must be deterministic and runnable anywhere, so we force the CPU
platform with 8 virtual devices for sharding tests (SURVEY §5.3).

Note: this machine's sitecustomize pre-imports jax with the axon TPU
platform, so env vars alone are too late — we must update jax.config before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
