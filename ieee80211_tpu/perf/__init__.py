"""Performance harnesses: PDR-vs-SNR sweeps and throughput measurement."""
from .pdr import mimo_pdr_sweep, pdr_sweep

__all__ = ["pdr_sweep", "mimo_pdr_sweep"]
