"""Mesh construction for the PHY's parallel axes.

The reference's concurrency (thread-per-block pipeline + multi-host UDP/RF,
SURVEY.md §2.5) maps onto a JAX device mesh with axes:

  dp — batch of packets (data parallel)
  sp — time-blocks of a capture with overlap-save halos (sequence parallel)

Antenna/stream and MU-user axes stay within a shard (they are size <= 4 and
benefit from fusion, not distribution).
"""
from __future__ import annotations

import jax
import numpy as np


def make_phy_mesh(n_devices: int | None = None, sp: int = 1):
    """Mesh over (dp, sp). sp divides n_devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    assert n % sp == 0
    return jax.make_mesh((n // sp, sp), ("dp", "sp"),
                         devices=np.asarray(devs[:n]))
