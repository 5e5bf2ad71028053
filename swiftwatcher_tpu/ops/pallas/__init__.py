"""Pallas TPU kernels for the hot per-frame ops."""
