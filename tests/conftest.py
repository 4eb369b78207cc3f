"""Test harness config: force an 8-device virtual CPU platform so
sharding/collective tests run without TPU hardware — the modern equivalent of
the reference's model_deploy_test strategy of asserting on placement without
devices (SURVEY.md §4).

Note: this environment registers a TPU backend from sitecustomize at
interpreter start, so the env var alone is not enough — we must also flip
jax_platforms via config.update before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
