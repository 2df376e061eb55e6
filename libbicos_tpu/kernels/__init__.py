"""Pallas/Mosaic TPU kernels for the BICOS hot loops.

The reference's CUDA kernel layer (``include/impl/cuda/*.cuh``) maps here:

* ``bicos_kernel_smem`` (bicos.cuh:77-140)  -> :mod:`.hamming` — the O(W^2)
  Hamming argmin scan, re-designed as an MXU matmul + VPU packed-min epilogue
  instead of a thread-per-pixel XOR/popcount scan.
* descriptor transform / agree kernels stay pure-XLA (VPU elementwise work
  that XLA already fuses well); Pallas variants are added only where measured
  to win.
"""

from .hamming import row_minima_pallas

__all__ = ["row_minima_pallas"]
