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
# knob is authoritative. Tests run on the virtual 8-device CPU mesh, EXCEPT
# when RUN_TPU_TESTS=1 is set: then the real backend is kept so that
# tests/test_tpu_smoke.py can compile the default Pallas kernel configs and
# the flagship RxPipeline on actual TPU hardware (the round-1 bf16 Mosaic
# regression was invisible to CPU-only CI).
if os.environ.get("RUN_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
