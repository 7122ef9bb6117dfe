"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8); real-TPU performance is
measured separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TPU_AUDIO_LOG", "warn")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The shell may export JAX_PLATFORMS=axon (the tunneled TPU); the env override
# above is not always honored once the axon plugin registers, so force the
# platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
