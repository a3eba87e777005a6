"""Test config: force an 8-virtual-device CPU mesh before backend init.

The reference has CUDA-only kernel tests (test_selective_scan.py:42); here
everything runs on CPU with a simulated 8-device mesh so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: jax may already be imported by a sitecustomize hook that points
JAX_PLATFORMS at a TPU plugin, so the platform override must go through
jax.config (runtime) in addition to the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
