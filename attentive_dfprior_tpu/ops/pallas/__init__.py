"""Pallas TPU kernels for the hot ops.

Kernels are written against jax.experimental.pallas with TPU compiler
parameters; every kernel has an interpret-mode parity test against the
pure-jnp implementation so correctness is verified on any backend.
"""
