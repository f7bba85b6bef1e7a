"""Pallas TPU kernels for the hot PHY loops."""
