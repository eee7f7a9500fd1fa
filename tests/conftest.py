"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-device sharding tests run on simulated host devices
(``xla_force_host_platform_device_count``) — the JAX-native answer to
testing multi-chip behavior without a cluster.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against the float64 torch reference; production code
# follows input dtypes, so float32 paths are still exercised explicitly.
jax.config.update("jax_enable_x64", True)
