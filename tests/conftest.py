"""Test configuration: force CPU backend with 8 virtual devices.

Multi-device sharding tests run against a faked 8-device host platform
(xla_force_host_platform_device_count), per the project test strategy
(SURVEY.md §4): no TPU hardware is needed to validate mesh/sharding logic.

Must set env vars before jax is imported anywhere in the test session.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests
# must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
