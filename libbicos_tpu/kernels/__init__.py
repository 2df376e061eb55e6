"""Pallas/Mosaic TPU kernels for the BICOS hot loops.

The reference's CUDA kernel layer (``include/impl/cuda/*.cuh``) maps here:

* ``bicos_kernel_smem`` (bicos.cuh:77-140) -> :mod:`.hamming` — the O(W^2)
  Hamming argmin scan, re-designed as an MXU matmul + VPU packed-min
  epilogue instead of a thread-per-pixel XOR/popcount scan. The descriptor
  transform (descriptor_transform.cuh:91-149) rides INSIDE it as two
  constant compare-matrix contractions (see descriptor.compare_coeffs), so
  the production path never materializes descriptor words in HBM.
* ``agree_kernel`` / ``agree_subpixel_kernel`` (agree.cuh:110-259) ->
  :mod:`.agree` — the NXCORR validation as an MXU one-hot gather of the
  matched right-image series plus an SMEM-resident subpixel sweep (this IS
  the production path on TPU; the pure-XLA ``libbicos_tpu.agree`` remains
  as the oracle-exact fallback and DOUBLE-precision path).
* :mod:`.transform` keeps a standalone Pallas descriptor transform for the
  n < 10 corner where the fused path does not apply.
"""

from .hamming import row_minima_pallas

__all__ = ["row_minima_pallas"]
