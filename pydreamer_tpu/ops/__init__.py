"""Pallas TPU kernels and low-level numeric ops.

The compute path is XLA-compiled JAX by default; kernels live here when a
fused Pallas implementation beats what XLA fuses on its own (the RSSM cell
scan is the main candidate — SURVEY §7 'hard parts').
"""
