"""Test harness setup: force the CPU backend with 8 virtual devices so
mesh/sharding tests run anywhere (SURVEY.md §4's multi-chip test guidance).

This environment's sitecustomize force-registers a TPU PJRT plugin in every
Python process and pins JAX_PLATFORMS to it, so plain env-var defaults are
not enough: we override the platform through jax.config *before any backend
is used* (and block the jaxtyping pytest plugin in pyproject.toml, which
would otherwise initialize JAX before this file runs)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Exact-match tests against the float64 scalar ground truth need x64.
jax.config.update("jax_enable_x64", True)
