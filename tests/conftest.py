"""Test harness: emulate an 8-device mesh on CPU.

The driver's multi-chip dry-run uses the same mechanism
(`xla_force_host_platform_device_count`); see SURVEY.md §4 for the test
strategy this framework adds over the reference (which ships no tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The hosted-TPU plugin in this image overrides JAX_PLATFORMS; the config
# update below wins regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
