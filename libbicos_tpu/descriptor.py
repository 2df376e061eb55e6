"""Temporal binary descriptor transform (TPU-native).

Re-implements the reference descriptor transforms *bit-identically*:

* ``transform_limited`` — reference ``descriptor_transform.hpp:32-73``
* ``transform_full``    — reference ``descriptor_transform.hpp:76-123``

Design notes (TPU-first):

The reference walks each pixel's temporal series with a scalar bit-appender
(``bitfield.hpp:35-58``). Here every comparison is a whole-image vectorized
``jnp`` op over the ``(H, W)`` plane; the bit *order* (LSB-first append order)
is reproduced exactly, so packing the boolean planes into little-endian uint32
lanes yields the same words the reference stores in its 32/64/128/256-bit
descriptors. All VPU work, fully fused by XLA.

Exactness argument for the float mean comparison (``a < av``): the running
float sum of n <= 65 uint16 samples is an integer < 2^24, hence exact in
float32 regardless of summation order; the division by n then rounds
identically to the reference's ``av /= n``.

Outputs:
* ``descriptor_bits``  -> (H, W, B) bool — the canonical form. On TPU the
  Hamming search consumes this directly (as bf16 0/1 planes feeding the MXU);
  packed words are only materialized for parity tests and debug dumps.
* ``pack_bits``        -> (H, W, n_words) uint32 little-endian lanes.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from .config import TransformMode, actual_bits


def _limited_bits(s32, sf, av) -> List:
    """Bit planes for the LIMITED transform, in reference append order
    (``descriptor_transform.hpp:32-73``)."""
    n = s32.shape[0]
    bits = []
    pairsums = {}
    for t in range(n - 2):
        a, b, c = s32[t], s32[t + 1], s32[t + 2]
        bits.append(a < b)
        bits.append(a < c)
        bits.append(sf[t] < av)
        cur = a + b
        # prev_pair_sums[t % 2] holds the pairsum from t-2 (initialized to -1,
        # so no bit is emitted for t in {0, 1}).
        if t >= 2:
            bits.append(pairsums[t - 2] < cur)
        pairsums[t] = cur
    a, b = s32[n - 2], s32[n - 1]
    bits.append(a < b)
    bits.append(sf[n - 2] < av)
    bits.append(sf[n - 1] < av)
    if n >= 4:
        bits.append(pairsums[n - 4] < (a + b))
    else:
        # prev_pair_sums slot is still -1: (-1 < a+b) is always true since
        # pixel sums are non-negative (descriptor_transform.hpp:55,68).
        bits.append(jnp.ones(s32.shape[1:], dtype=bool))
    return bits


def _full_bits(s32, sf, av) -> List:
    """Bit planes for the FULL transform, in reference append order
    (``descriptor_transform.hpp:76-123``)."""
    n = s32.shape[0]
    bits = []
    pairsums = {}
    for t in range(n - 2):
        a, b, c = s32[t], s32[t + 1], s32[t + 2]
        bits.append(a < b)
        bits.append(a < c)
        bits.append(sf[t] < av)
        pairsums[t] = s32[t] + s32[t + 1]
    pairsums[n - 2] = s32[n - 2] + s32[n - 1]
    a, b = s32[n - 2], s32[n - 1]
    bits.append(a < b)
    bits.append(sf[n - 2] < av)
    bits.append(sf[n - 1] < av)
    for t in range(n - 1):
        for i in range(n - 1):
            if i == t or i == t - 1 or i == t + 1:
                continue
            bits.append(pairsums[t] < pairsums[i])
    return bits


def descriptor_bits(stack, mode: TransformMode):
    """Transform an image stack into binary descriptor bit planes.

    Args:
      stack: ``(n, H, W)`` uint8 or uint16 image stack.
      mode: LIMITED or FULL.

    Returns:
      ``(H, W, B)`` bool array; bit ``k`` along the last axis is the k-th bit
      the reference's ``Bitfield::set`` would append (LSB-first).
    """
    n = stack.shape[0]
    if n < 2:
        raise ValueError("need at least two images")
    s32 = stack.astype(jnp.int32)
    sf = stack.astype(jnp.float32)
    # Barrier: XLA may strength-reduce /n into a reciprocal multiply
    # (1 ulp off a correctly rounded divide); flat series sit exactly
    # on the a < av tie boundary, so that ulp flips mean-comparison
    # bits vs the reference (same guard as agree._stats).
    av = jnp.sum(sf, axis=0) / jax.lax.optimization_barrier(
        jnp.float32(n))
    if mode == TransformMode.FULL:
        bits = _full_bits(s32, sf, av)
    else:
        bits = _limited_bits(s32, sf, av)
    assert len(bits) == actual_bits(n, mode), (len(bits), n, mode)
    return jnp.stack(bits, axis=-1)


def descriptor_words(stack, mode: TransformMode, min_words: int = 1):
    """Transform an image stack directly into packed uint32 descriptor words.

    Same bit semantics as :func:`descriptor_bits` + :func:`pack_bits`, but
    the bit planes are OR-ed into their words as they are produced, so no
    ``(H, W, B)`` boolean tensor (nor the pack's ``(H, W, nw, 32)`` blow-up)
    is ever materialized — at 33x2200x3300 this is the difference between
    ~5 GB of intermediates and a single pass over the stack. This is the
    production path used by the pipeline; ``descriptor_bits`` remains the
    readable form pinned against the oracle in tests.

    Returns ``(H, W, ceil(B/32)) uint32``.
    """
    n = stack.shape[0]
    if n < 2:
        raise ValueError("need at least two images")
    s32 = stack.astype(jnp.int32)
    sf = stack.astype(jnp.float32)
    # Barrier: XLA may strength-reduce /n into a reciprocal multiply
    # (1 ulp off a correctly rounded divide); flat series sit exactly
    # on the a < av tie boundary, so that ulp flips mean-comparison
    # bits vs the reference (same guard as agree._stats).
    av = jnp.sum(sf, axis=0) / jax.lax.optimization_barrier(
        jnp.float32(n))
    if mode == TransformMode.FULL:
        bits = _full_bits(s32, sf, av)
    else:
        bits = _limited_bits(s32, sf, av)
    nbits = actual_bits(n, mode)
    assert len(bits) == nbits, (len(bits), n, mode)
    h, w = stack.shape[1], stack.shape[2]
    words = []
    for wi in range(max(n_words_for(nbits), min_words)):
        acc = jnp.zeros((h, w), jnp.uint32)
        for pos in range(32):
            k = wi * 32 + pos
            if k >= nbits:
                break
            acc = acc | (bits[k].astype(jnp.uint32) << pos)
        words.append(acc)
    return jnp.stack(words, axis=-1)


def compare_coeffs(n: int, mode: TransformMode):
    """Descriptor bits as integer comparison matrices: bit k is
    ``dot(CX[k], s) < dot(CY[k], s)`` over the raw temporal series ``s``.

    This is the algebraic form that lets the search kernel compute
    descriptors ON-CHIP with two tiny MXU contractions per tile (see
    ``kernels/hamming.py``) instead of a separate transform pass: every
    reference bit (``descriptor_transform.hpp:32-123``) is a comparison of
    integer linear combinations of samples —

    * ``a < b`` / ``a < c``: one-hot rows.
    * ``pairsums[p] < pairsums[q]``: two-hot rows.
    * ``sf[t] < av``: the reference compares against the float32 mean
      ``fl(sum/n)``, which is EXACTLY equivalent to the integer comparison
      ``n*s[t] < sum``: both sides are integers, and when they differ they
      differ by >= 1, while the mean's rounding error is < ulp(sum/n)/2
      << 1/n — the rounding can never cross the comparison boundary. (Ties
      ``sum == n*s[t]`` make both forms false.)

    All values stay < 2^24 (n <= 65, u16 samples), so bf16-coefficient MXU
    dots with f32 accumulation reproduce them exactly.

    Returns ``(CX, CY)`` as ``(nbits, n)`` numpy int32. Raises for the
    LIMITED n<4 case, whose final bit is the constant ``-1 < a+b``
    (``descriptor_transform.hpp:55,68``) — not expressible as X<Y of
    non-negative combinations; callers fall back to the bit-plane path.
    """
    import numpy as np

    nbits = actual_bits(n, mode)
    cx = np.zeros((nbits, n), np.int32)
    cy = np.zeros((nbits, n), np.int32)
    k = 0

    def emit_lt(xcoef, ycoef):
        nonlocal k
        for t, v in xcoef:
            cx[k, t] += v
        for t, v in ycoef:
            cy[k, t] += v
        k += 1

    av = [(t, 1) for t in range(n)]  # times n on the other side
    if mode == TransformMode.FULL:
        for t in range(n - 2):
            emit_lt([(t, 1)], [(t + 1, 1)])
            emit_lt([(t, 1)], [(t + 2, 1)])
            emit_lt([(t, n)], av)
        emit_lt([(n - 2, 1)], [(n - 1, 1)])
        emit_lt([(n - 2, n)], av)
        emit_lt([(n - 1, n)], av)
        for t in range(n - 1):
            for i in range(n - 1):
                if i in (t - 1, t, t + 1):
                    continue
                emit_lt([(t, 1), (t + 1, 1)], [(i, 1), (i + 1, 1)])
    else:
        if n < 4:
            raise ValueError(
                "LIMITED n<4 has a constant bit; use the bit-plane path"
            )
        for t in range(n - 2):
            emit_lt([(t, 1)], [(t + 1, 1)])
            emit_lt([(t, 1)], [(t + 2, 1)])
            emit_lt([(t, n)], av)
            if t >= 2:
                emit_lt([(t - 2, 1), (t - 1, 1)], [(t, 1), (t + 1, 1)])
        emit_lt([(n - 2, 1)], [(n - 1, 1)])
        emit_lt([(n - 2, n)], av)
        emit_lt([(n - 1, n)], av)
        emit_lt([(n - 4, 1), (n - 3, 1)], [(n - 2, 1), (n - 1, 1)])
    assert k == nbits, (k, nbits)
    return cx, cy


def n_words_for(num_bits: int) -> int:
    return (num_bits + 31) // 32


def pack_bits(bits):
    """Pack ``(H, W, B)`` bool bit planes into ``(H, W, ceil(B/32))`` uint32
    little-endian words (bit k -> word k//32, position k%32).

    This matches the reference's descriptor storage for every width: uint32,
    uint64 (= word0 | word1<<32), __uint128_t and std::bitset<256> all use
    LSB-first global bit order, so Hamming distances computed on these lanes
    are identical.
    """
    h, w, b = bits.shape
    nw = n_words_for(b)
    pad = nw * 32 - b
    u = bits.astype(jnp.uint32)
    if pad:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad)))
    u = u.reshape(h, w, nw, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(u << shifts, axis=-1, dtype=jnp.uint32)


def unpack_words(words, num_bits: int):
    """Inverse of :func:`pack_bits` -> ``(H, W, num_bits)`` bool."""
    h, w, nw = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(h, w, nw * 32)[..., :num_bits].astype(bool)


def popcounts(bits):
    """Per-pixel descriptor popcount ``(H, W) int32`` (sum of bit planes)."""
    return jnp.sum(bits.astype(jnp.int32), axis=-1)
