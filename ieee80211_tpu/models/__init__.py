"""Flagship end-to-end pipelines (the framework's "models")."""
from .pipeline import RxPipeline, make_rx_step

__all__ = ["RxPipeline", "make_rx_step"]
