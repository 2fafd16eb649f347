"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8) since real multi-chip hardware is
unavailable in CI; see SURVEY.md §4 implications.
"""

import os

# Force CPU for the test suite (the session env pins JAX_PLATFORMS to the real
# TPU tunnel, which is slow for many small test compiles and single-chip only).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A pytest plugin may have imported jax before this conftest ran, in which case
# the env vars above were read too early — fix the live config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
