"""Performance harnesses: PDR-vs-SNR sweeps and throughput measurement."""
from .pdr import pdr_sweep

__all__ = ["pdr_sweep"]
