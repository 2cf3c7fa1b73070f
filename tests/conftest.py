"""Test env: force CPU backend with 8 virtual devices so mesh/sharding tests
run without TPU hardware (SURVEY.md §4: fake-multichip strategy)."""

import os
import sys

# force-set: the ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel)
if not os.environ.get("MAGICDEC_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after env setup)

# jax is already imported by the image's sitecustomize with JAX_PLATFORMS=axon
# (TPU tunnel); env vars alone are too late, but config updates before first
# backend use still take effect.
if not os.environ.get("MAGICDEC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# XLA:CPU's default matmul precision truncates inputs (~bf16); parity tests
# compare fp32 numerics against HF, so force true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")
