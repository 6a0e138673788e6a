"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference stack is GPU-only and untested; our test pyramid runs on
CPU with 8 virtual devices so sharding/collective behavior is exercised
without TPU hardware (SURVEY.md §4 item 4). Must set env vars BEFORE
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU feeding deterministic and fast for tiny test shapes.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's axon sitecustomize force-overrides jax_platforms to
# "axon,cpu" at interpreter start (ignoring JAX_PLATFORMS); point it
# back at CPU before any backend is initialized so the virtual
# 8-device mesh is what tests actually run on.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
