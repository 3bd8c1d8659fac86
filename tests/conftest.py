"""Test configuration: force CPU backend with 8 virtual devices.

Multi-device sharding tests run against a faked 8-device host platform
(xla_force_host_platform_device_count), per the project test strategy
(SURVEY.md §4): no TPU hardware is needed to validate mesh/sharding logic.

The session environment preloads jax via a sitecustomize hook and pins
JAX_PLATFORMS to the real (tunneled) TPU backend, so setting env vars here
is too late for the platform choice — but the backend itself initializes
lazily, so ``jax.config.update`` still wins as long as it runs before the
first device query. XLA_FLAGS is read when the CPU client is created, so
setting it here (before any jax op) is in time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
