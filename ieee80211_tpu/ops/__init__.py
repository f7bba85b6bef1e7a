"""Batched PHY ops (JAX): coding, demodulation, synchronization."""
from . import coding, demod, sync

__all__ = ["coding", "demod", "sync"]
