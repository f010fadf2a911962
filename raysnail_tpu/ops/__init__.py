"""Pallas TPU kernels for the hot intersection stages."""
