"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding semantics are validated without a TPU pod by
simulating 8 host devices (standard JAX practice; the reference has no
distributed story at all — SURVEY.md §4/§5).

Note: the environment pre-imports jax with a TPU platform, so the platform
must be overridden via jax.config (env vars are read before conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# TOYCRYSTALS_TEST_TPU=1 keeps the real TPU backend (used to run the
# TPU-only kernel tests, e.g. tests/test_flash_attention.py).
if os.environ.get("TOYCRYSTALS_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
