"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-device data-parallel semantics are tested without TPU hardware via
XLA's host-platform device-count override (SURVEY.md §4e).

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon (a tunneled TPU backend), so we must override the
platform through jax.config, not just os.environ, and must do it before any
backend is instantiated.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    # Fail fast if the platform override did not take.
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
