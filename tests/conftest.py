"""Test configuration: run the suite on an 8-device virtual CPU mesh.

This is the standard JAX trick for exercising multi-chip collectives without
hardware (SURVEY.md §4): ``--xla_force_host_platform_device_count=8`` fakes eight
CPU devices, and sharded sweeps are checked for exact agreement with the
single-device path.  The bench (`bench.py`) runs on the real TPU instead.

Note: this container routes jax to a remote TPU via the ``axon`` platform by
default (JAX_PLATFORMS=axon); we must flip the platform *before* the first backend
use, which a pytest conftest import is early enough for.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
