"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4.5). Benchmarks (bench.py) run on
the real TPU chip instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MPLBACKEND", "Agg")

import jax

# Note: the TPU plugin in this environment ignores JAX_PLATFORMS; the config
# knob is authoritative. Tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
