"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on simulated devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring SURVEY.md §4's
test strategy.  The environment pre-registers a TPU ('axon') backend at
interpreter start, so the platform must be overridden via jax.config (env vars
are too late / ignored here).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Float64 stays OFF: the framework is f32-native by design (TPU-first); tests
# that need f64 host math use numpy.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")
