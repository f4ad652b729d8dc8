"""Test configuration: force an 8-device virtual CPU platform so every
test (including mesh/pjit sharding tests) runs without TPU hardware —
the standard JAX recipe for testing multi-chip code paths."""

import os

# Force CPU even when the session presets JAX_PLATFORMS (e.g. the axon
# TPU tunnel): tests must see 8 virtual devices, and per-test compiles
# are faster on host than through the single-chip tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU tunnel via
# jax.config (overriding JAX_PLATFORMS env) — undo it before any
# backend initializes so tests run on the 8-device virtual CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
