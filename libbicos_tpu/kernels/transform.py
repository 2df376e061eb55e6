"""Pallas TPU kernel for the descriptor transform.

Equivalent of the reference transform kernels
(``/root/reference/include/impl/cuda/descriptor_transform.cuh:30-149``),
re-designed for VMEM residency: each grid step keeps an 8-row batch of the
whole image stack on-chip, evaluates every temporal comparison once, and
ORs the bits straight into packed uint32 words. The XLA path
(``descriptor.descriptor_words``) round-trips (H, W) intermediates per
comparison through HBM (~60 ms per stack at 33x2200x3300); here traffic
drops to one read of the stack plus one write of the words.

Bit semantics are shared with the XLA path by reusing the exact same plane
generators (``descriptor._limited_bits`` / ``_full_bits``) — bit-identical
by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TransformMode, actual_bits
from ..descriptor import _full_bits, _limited_bits, n_words_for

ROW_BATCH = 8


def _transform_kernel(
    s_ref,  # (n, 8, WP) u8/u16
    out_ref,  # (nw, 8, WP) uint32
    *,
    mode: TransformMode,
    nbits: int,
    interpret: bool,
):
    n = s_ref.shape[0]
    s32 = s_ref[...].astype(jnp.int32)
    sf = s32.astype(jnp.float32)
    # Mean: integer-valued f32 sums are exact in any order; the division by
    # n must stay a true divide (interpret mode would strength-reduce it).
    B = jax.lax.optimization_barrier if interpret else (lambda x: x)
    av = jnp.sum(sf, axis=0) / B(jnp.float32(n))
    if mode == TransformMode.FULL:
        bits = _full_bits(s32, sf, av)
    else:
        bits = _limited_bits(s32, sf, av)
    assert len(bits) == nbits
    nw = n_words_for(nbits)
    for wi in range(nw):
        acc = jnp.zeros(s32.shape[1:], jnp.uint32)
        for pos in range(32):
            k = wi * 32 + pos
            if k >= nbits:
                break
            acc = acc | (bits[k].astype(jnp.uint32) << pos)
        out_ref[wi] = acc


def _pad2(x, mult0, mult1):
    p0 = (-x.shape[-2]) % mult0
    p1 = (-x.shape[-1]) % mult1
    if p0 == 0 and p1 == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, p0), (0, p1)]
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def descriptor_words_pallas(stack, mode: TransformMode,
                            interpret: bool = False):
    """(n, H, W) u8/u16 -> (H, W, nw) packed uint32 descriptor words."""
    n, h, w = stack.shape
    nbits = actual_bits(n, mode)
    nw = n_words_for(nbits)
    sp = _pad2(stack, ROW_BATCH, 128)
    hp, wp = sp.shape[1], sp.shape[2]

    kernel = functools.partial(
        _transform_kernel, mode=mode, nbits=nbits, interpret=interpret,
    )
    words = pl.pallas_call(
        kernel,
        grid=(hp // ROW_BATCH,),
        in_specs=[
            pl.BlockSpec((n, ROW_BATCH, wp), lambda r: (0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nw, ROW_BATCH, wp), lambda r: (0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, hp, wp), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(sp)
    return jnp.transpose(words, (1, 2, 0))[:h, :w]
