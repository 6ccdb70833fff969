"""Pallas TPU kernels — the native compute tier.

Each kernel is validated against the pure-NumPy reference scorer and the XLA
baseline in tests (interpret mode on CPU; compiled on real TPU via bench.py).
"""
