"""Pallas TPU kernels for the BICOS Hamming-argmin row scan.

This is the TPU-native re-design of the reference's hottest kernel, the
shared-memory correspondence scan ``bicos_kernel_smem``
(``/root/reference/include/impl/cuda/bicos.cuh:77-140``): for every left pixel,
find the right-row column minimizing the Hamming distance between binary
descriptors, plus the *last* column attaining that minimum (for the
NoDuplicates tie test).

Two kernel families share the sweep machinery:

* ``*_stack`` (the production path): FUSED transform+search. Raw image
  stacks go in; the descriptor bits are computed ON-CHIP by contracting the
  samples against constant compare-coefficient matrices
  (``descriptor.compare_coeffs`` — every reference descriptor bit is
  ``dot(CX[k], series) < dot(CY[k], series)`` over integers), emitted
  K-major, exactly the RHS layout the Hamming contraction wants. The
  reference's separate transform stage (``cpu.cpp:49-95`` pipeline order)
  disappears along with its descriptor HBM round-trip.
* ``*_words``: pre-packed uint32 descriptor words in (the W-band ring and
  transform-once-search-many callers); bits are unpacked on-chip.

TPU mapping (nothing here resembles the CUDA code on purpose):

* **Hamming as a matmul.** ``ham(a, b) = pop(a) + pop(b) - 2 a.b``. Encoding
  the query as ``+-8192`` (bit -> -8192, no bit -> +8192) and the database as
  0/1 bits, an MXU contraction yields ``s * 8192`` where
  ``s = ham - pop(a)`` — ``pop(b)`` is folded in, and ``pop(a)`` is a
  per-query constant that never affects the argmin.

* **Argmin folded into the matmul.** Two extra descriptor columns carry the
  *column index* of each database entry, split bf16-exactly as
  ``col = 256*hi + lo`` with query-side coefficients ``[256, 1]``; the MXU
  therefore emits ``packed = s*8192 + col`` directly, and the entire VPU
  epilogue is ONE elementwise ``min`` per cost entry: the running minimum is
  simultaneously (min cost, first argmin). Everything else derives from the
  SAME dot with broadcast adds — ``dot + (8191 - 2*col)`` re-packs for the
  *last*-argmin tiebreak, and ``dot - col`` recovers pure ``s*8192`` for
  the consistency reverse reduction — so each kernel issues exactly one
  contraction per chunk. All packed values are exact f32 integers
  (|s|*8192 <= 2^21, col < 2^13 => |packed| < 2^22 < 2^24).

* **Packed descriptors in HBM.** Descriptors travel as little-endian uint32
  lanes (8x less HBM traffic than bit planes) and are unpacked on-chip: the
  right row once per image row into VMEM scratch (the analogue of the CUDA
  kernel's dynamic-shared-memory row cache), the left tile once per grid
  step.

* **Padding never wins.** Right-row padding columns only exist in the final
  column chunk, which is peeled out of the chunk loop and masked there — the
  steady-state loop has zero masking overhead.

* **Two MXU engines.** The default ``bf16`` engine is the f32-packing
  design above (col rides the contraction; the whole first-argmin epilogue
  is one f32 min). The ``i8`` engine (``BICOS_MXU_ENGINE=i8``) contracts
  int8-encoded bits with int32 accumulation and packs ``(s << 13) + col``
  on the VPU; despite the nominal 2x int8 MXU rate it measured ~1.5x
  SLOWER at 33x2200x3300 on v5e (105 vs 160 ms fused) — kept selectable
  for hardware where the int8 path actually delivers.

Grid: ``(H, W0/TILE_I)``; each step runs one or two
``(TILE_I, 128k) @ (128k, TILE_J)`` bf16 contractions per right-column chunk.
The outputs are laid out ``(H, W0/TILE_I, TILE_I)`` so a whole row's result
block satisfies the TPU (8, 128) tile constraint while the grid walks single
rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed = s * pack_s + col; exact in f32 for widths < pack_s. ALL kernels
# here (words, fused *_stack, band ring) accept pack_s = PACK_S (default)
# or 2*PACK_S via pack_for_width(): at 16384 every packed value still stays
# an exact f32 integer (|s| <= 256 bits => |s|*16384 <= 2^22; + col < 2^22
# + 2^14; + the 2^23 pad penalty < 2^24), and the col split
# 256*(col>>8) + (col&255) keeps both factors bf16-exact (col>>8 < 64).
# Padded columns encode zero bits, so their packed value is col + penalty
# >= 2^23 — always above any real candidate (<= 2^22 + 2^14).
PACK_S = 8192
# Penalty magnitude for padded columns in the peeled last chunk.
PAD_PENALTY = float(1 << 23)
ACC_INIT = float(1 << 24)


def pack_for_width(width: int):
    """Column packing for a row width: ``(pack_s, shift)``.

    Single source of truth for the split ``packed = s*pack_s + col`` shared
    by the words/stack kernel wrappers, the band-ring kernel, and the W-band
    sharding decode (``sharding.row_minima_wband``) — encode and decode must
    byte-match, so every site derives the rule from here. Widths in
    [PACK_S, 2*PACK_S) use the wide 16384 packing (still exact, see the
    PACK_S note); wider rows raise, and callers fall back to the XLA path
    (``search.search_words``).
    """
    if width >= 2 * PACK_S:
        raise ValueError(
            f"image width >= {2 * PACK_S} not supported by kernel")
    pack_s = PACK_S if width < PACK_S else 2 * PACK_S
    return pack_s, pack_s.bit_length() - 1

DEF_TILE_I = 512
DEF_TILE_J = 512
# Right-row unpack proceeds in segments to bound shift/mask temporaries.
UNPACK_SEG = 512

# MXU engine: "bf16" folds the column index into the contraction so the
# entire first-argmin epilogue is ONE f32 min per cost entry; "i8" contracts
# int8 bits (nominally 2x the bf16 MXU rate) but must pack (s << 13) + col
# on the VPU afterwards: 106 ms vs 160 ms fused at 33x2200x3300 on one v5e
# core — bf16 default. Calibration (2026-08-17, one "TPU v5 lite" core):
# XLA's own 8192^3 matmul chain reaches 116 TF bf16 / 170 TOPS i8 — the
# practical device envelope, well under the 197/394 nameplate. A bare
# pallas kernel issuing only this kernel's (512,128)@(128,512) chunk dots
# runs 78.9 ms = 91.7 TF = 79% of that envelope, flat across tile shapes /
# rhs layouts / full-row N, and bare i8 at the same shapes is 115 TOPS (no
# 2x: int8 pairs two MACs along K, and K=128 leaves nothing to pair). The
# production kernel's dot time sits on that bare-dot floor, so the engine
# is within ~25% of device speed-of-light for this contraction shape.
# FULL mode (K=256, where int8 K-pairing has headroom) measured the same
# way: fused search n=16 at 3300x2200 is 140.7 ms bf16 vs 147.6 ms i8 —
# i8 never wins at any descriptor width; bf16 stays the default.
import os as _os

DEFAULT_ENGINE = _os.environ.get("BICOS_MXU_ENGINE", "bf16")
# Rows per grid step for the fused stack kernels: batching rows amortizes
# per-grid-step overhead (window swaps/semaphores) without changing dot
# shapes. Measured fused transform+search, 33x2200x3300 bf16 on one v5e
# core: rows 1/2/4/8/16 -> 105.6/94.5/93.8/89.4/103.5 ms — 8 is the
# optimum (-15%); 16 regresses (VMEM pressure breaks the pipeline).
# VMEM cost: rows x BPAD x W1PAD scratch. The consistency kernel has its
# own knob — its heavier rev-scratch epilogue shifts the optimum down
# (bracketed when it still ran two dots per chunk: rows 1/2/4/8 ->
# 149.3/145.0/143.4/154.1 ms; since then the second dot is derived from
# the first, see _consistency_kernel).
SEARCH_ROWS = int(_os.environ.get("BICOS_SEARCH_ROWS", "8"))
CONS_ROWS = int(_os.environ.get("BICOS_CONS_ROWS", "4"))
# Accumulator strategy: "1" keeps (TILE_I, 128) running minima and reduces
# each dot chunk lane-group by lane-group (4x less accumulator VMEM traffic
# than full (TILE_I, TILE_J) accumulators); "0" keeps full-tile accumulators.
DEFAULT_REDUCE = _os.environ.get("BICOS_MXU_REDUCE", "0") == "1"


def _unpack_bits_i32(flat):
    """(R, nw) uint32 packed words -> (R, nw*32) int32 0/1 bit planes.

    Bit k of the descriptor lives in word k//32, position k%32 (LSB-first),
    matching ``descriptor.pack_bits``. Pure arithmetic — no boolean selects
    (Mosaic-friendly layouts only).
    """
    r, nw = flat.shape
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (r, 32), 1)
    planes = []
    for wi in range(nw):
        wcol = flat[:, wi : wi + 1]  # (R, 1)
        planes.append(((wcol >> shifts) & jnp.uint32(1)).astype(jnp.int32))
    return jnp.concatenate(planes, axis=1)


def _encode_b(words_seg, col0: int, nbits: int, bpad: int):
    """Database-side encoding for one segment of the right row.

    (SEG, nw) uint32 -> (SEG, bpad) bf16: columns [0, nw*32) are the 0/1 bit
    planes (bits >= nbits are zero in the packed words already), column
    ``nbits`` carries ``(col0+r) >> 8`` and column ``nbits+1`` carries
    ``(col0+r) & 255`` — both bf16-exact (<= 255 resp. < 32).
    """
    seg, nw = words_seg.shape
    bits = _unpack_bits_i32(words_seg)  # (SEG, nw*32)
    if bpad > nw * 32:
        bits = jnp.concatenate(
            [bits, jnp.zeros((seg, bpad - nw * 32), jnp.int32)], axis=1
        )
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (seg, bpad), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (seg, bpad), 1)
    vals = jnp.where(lane == nbits, col >> 8, bits)
    vals = jnp.where(lane == nbits + 1, col & 255, vals)
    return vals.astype(jnp.bfloat16)


def _encode_b_i8(words_seg, nbits: int, bpad: int):
    """Database-side int8 encoding: (SEG, nw) uint32 -> (SEG, bpad) int8 0/1
    bit planes. No index columns — the int8 engine packs the column index on
    the VPU after the contraction (int8 coefficients cannot carry +-8192)."""
    seg, nw = words_seg.shape
    bits = _unpack_bits_i32(words_seg)
    if bpad > nw * 32:
        bits = jnp.concatenate(
            [bits, jnp.zeros((seg, bpad - nw * 32), jnp.int32)], axis=1
        )
    return bits.astype(jnp.int8)


def _encode_a_i8(words_tile, nbits: int, bpad: int):
    """Query-side int8 encoding: bit -> -1, no bit -> +1, lanes >= nbits
    zero. The dot against 0/1 database bits yields
    ``s = pop(b) - 2 a.b = ham - pop(a)`` exactly, accumulated in int32."""
    t, nw = words_tile.shape
    bits = _unpack_bits_i32(words_tile)
    if bpad > nw * 32:
        bits = jnp.concatenate(
            [bits, jnp.zeros((t, bpad - nw * 32), jnp.int32)], axis=1
        )
    pm = jnp.int32(1) - (bits << 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, bpad), 1)
    pm = jnp.where(lane >= nbits, 0, pm)
    return pm.astype(jnp.int8)


def _cmp_dots(s32, cxb, cyb, u16: bool, a_side: bool):
    """Compare-matrix contractions for on-chip descriptor bits.

    ``s32``: raw samples as int32 — ``(n, SEG)`` for the database side
    (returns ``(BPAD, SEG)`` xv/yv) or ``(n, TILE_I)`` contracted the other
    way for the query side (returns ``(TILE_I, BPAD)``). ``cxb``/``cyb`` are
    the (BPAD, n) bf16 compare-coefficient constants
    (:func:`..descriptor.compare_coeffs`). All products and sums are exact
    f32 integers (< 2^24); u16 samples run byte-split contractions
    recombined as ``256*hi + lo`` (also exact).
    """
    def dots(v32):
        vb = v32.astype(jnp.float32).astype(jnp.bfloat16)
        if a_side:
            dn = (((0,), (1,)), ((), ()))
            xv = jax.lax.dot_general(
                vb, cxb, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            yv = jax.lax.dot_general(
                vb, cyb, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        else:
            dn = (((1,), (0,)), ((), ()))
            xv = jax.lax.dot_general(
                cxb, vb, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            yv = jax.lax.dot_general(
                cyb, vb, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        return xv, yv

    if u16:
        xh, yh = dots(s32 >> 8)
        xl, yl = dots(s32 & jnp.int32(0xFF))
        return (xh * jnp.float32(256.0) + xl,
                yh * jnp.float32(256.0) + yl)
    return dots(s32)


def _encode_b_i8_stack(s_rows, cxb, cyb, u16: bool):
    """(n, SEG) raw samples -> (BPAD, SEG) int8 0/1 descriptor bits.

    The transform happens ON-CHIP as two tiny MXU contractions against the
    compare-coefficient matrices — no separate descriptor pass, no packed
    words in HBM. Rows >= nbits have all-zero coefficients, so their bits
    are (0 < 0) = 0 automatically. Output is K-major: exactly the layout
    the main Hamming contraction wants for its RHS.
    """
    xv, yv = _cmp_dots(s_rows.astype(jnp.int32), cxb, cyb, u16, a_side=False)
    return (xv < yv).astype(jnp.int8)


def _encode_a_i8_stack(s_tile, cxb, cyb, nbits: int, u16: bool):
    """(n, TILE_I) raw samples -> (TILE_I, BPAD) int8 query encoding:
    bit -> -1, no bit -> +1, lanes >= nbits zero."""
    tile_i = s_tile.shape[1]
    bpad = cxb.shape[0]
    xv, yv = _cmp_dots(s_tile.astype(jnp.int32), cxb, cyb, u16, a_side=True)
    pm = jnp.where(xv < yv, jnp.int32(-1), jnp.int32(1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_i, bpad), 1)
    pm = jnp.where(lane >= nbits, 0, pm)
    return pm.astype(jnp.int8)


def _encode_b_bf16_stack(s_rows, cxb, cyb, nbits: int, col0, u16: bool):
    """(n, SEG) raw samples -> (BPAD, SEG) bf16 database encoding for the
    bf16 engine: rows [0, nbits) are 0/1 bits (on-chip transform), row
    ``nbits`` carries ``col >> 8`` and row ``nbits+1`` carries ``col & 255``
    for the index-in-contraction packing (both bf16-exact)."""
    bpad, _ = cxb.shape
    seg = s_rows.shape[1]
    xv, yv = _cmp_dots(s_rows.astype(jnp.int32), cxb, cyb, u16, a_side=False)
    bits = jnp.where(xv < yv, jnp.int32(1), jnp.int32(0))
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (bpad, seg), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bpad, seg), 0)
    vals = jnp.where(row == nbits, col >> 8, bits)
    vals = jnp.where(row == nbits + 1, col & 255, vals)
    return vals.astype(jnp.bfloat16)


def _encode_a_bf16_stack(s_tile, cxb, cyb, nbits: int, u16: bool,
                         extras: bool, shift: int = 13):
    """(n, TILE_I) raw samples -> (TILE_I, BPAD) bf16 query encoding:
    bit -> -(1 << shift), no bit -> +(1 << shift), i.e. ±pack_s with
    ``shift`` = log2(pack_s) (13 for the default 8192 packing, 14 for the
    wide 16384 one). The dot emits s*pack_s + col when ``extras`` puts the
    [256, 1] col-split coefficients at lanes nbits/nbits+1;
    ``extras=False`` zeroes them for a pure s*pack_s dot (no current
    caller — the consistency kernels derive s*pack_s from the extras dot
    by subtracting the column broadcast)."""
    tile_i = s_tile.shape[1]
    bpad = cxb.shape[0]
    xv, yv = _cmp_dots(s_tile.astype(jnp.int32), cxb, cyb, u16, a_side=True)
    scale = jnp.int32(1) << shift
    pm = jnp.where(xv < yv, -scale, scale)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_i, bpad), 1)
    pm = jnp.where(lane >= nbits, 0, pm)
    if extras:
        pm = jnp.where(lane == nbits, 256, pm)
        pm = jnp.where(lane == nbits + 1, 1, pm)
    return pm.astype(jnp.bfloat16)


def _encode_a(words_tile, nbits: int, bpad: int, sign: int, shift: int = 13):
    """Query-side encoding: (T, nw) uint32 -> (T, bpad) bf16.

    ``sign=-1``: bit -> -pack_s, no bit -> +pack_s (emits
    packed = s*pack_s + col); ``sign=+1`` flips (emits col - s*pack_s).
    ``shift`` = log2(pack_s) (13 for the default 8192 packing, 14 for the
    wide 16384 packing). Columns [nbits, nbits+1] get the col-split
    coefficients [256, 1]; any remaining columns are zero.
    """
    t, nw = words_tile.shape
    bits = _unpack_bits_i32(words_tile)
    if bpad > nw * 32:
        bits = jnp.concatenate(
            [bits, jnp.zeros((t, bpad - nw * 32), jnp.int32)], axis=1
        )
    # (1 - 2*bit) << shift = +-pack_s without vector multiplies.
    pm = (jnp.int32(1) - (bits << 1)) << shift
    if sign > 0:
        pm = -pm
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, bpad), 1)
    pm = jnp.where(lane >= nbits, 0, pm)
    pm = jnp.where(lane == nbits, 256, pm)
    pm = jnp.where(lane == nbits + 1, 1, pm)
    return pm.astype(jnp.bfloat16)


def _minima_kernel(
    w0_ref,  # (RB, TILE_I, nw) uint32 — left descriptor words for this tile
    w1_ref,  # (RB, W1PAD, nw) uint32 — full right rows, revisited across i
    outf_ref,  # (RB, NI, TILE_I) f32 — whole row of packed first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — whole row of packed last-maxima
    b_scratch,  # (RB, W1PAD, BPAD) bf16 — encoded right rows
    *,
    nbits: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    need_last: bool,
    reduce: bool,
    pack_s: int = PACK_S,
):
    i = pl.program_id(1)
    rb = w0_ref.shape[0]
    tile_i = w0_ref.shape[1]
    bpad = b_scratch.shape[2]

    # Encode the right rows into VMEM once per grid row (i == 0), in
    # segments inside a fori_loop so the shift/mask temporaries are reused.
    # RB image rows per grid step (SEARCH_ROWS) amortize per-step overhead.
    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = w1_ref[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :]
                b_scratch[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :] = (
                    _encode_b(seg, k * UNPACK_SEG, nbits, bpad)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)

    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a(w0_ref[r], nbits, bpad, sign=-1, shift=shift)

        def dotf_chunk(j, r=r, a_f=a_f):
            b_tile = b_scratch[r, pl.ds(j * tile_j, tile_j), :]
            return jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_I, TILE_J) = s*8192 + col

        outf, outl = _sweep_minima_bf16(
            dotf_chunk, tile_i, tile_j, nj, w1, need_last, reduce,
            pack_s=pack_s,
        )
        outf_ref[r, i, :] = outf
        outl_ref[r, i, :] = outl


def _sweep_minima_bf16(
    dotf_chunk, tile_i: int, tile_j: int, nj: int, w1: int,
    need_last: bool, reduce: bool, pack_s: int = PACK_S,
):
    """Shared f32 packed-minima sweep for the bf16 engine: ``dotf_chunk(j)``
    returns (TILE_I, TILE_J) f32 ``packed = s*pack_s + col``.

    The last-argmin packing is derived from the SAME dot output:
      dotf + (pack_s-1 - 2*col) = s*pack_s + (pack_s-1 - col),
    whose min keeps the minimal s with the LARGEST col as tiebreak —
    one broadcast add instead of a second matmul.
    """

    def iota_j(j):
        return j * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile_j), 1
        )

    def body(j, carry):
        accf, accl = carry
        dotf = dotf_chunk(j)
        accf = jnp.minimum(accf, dotf)
        if need_last:
            cvec = (jnp.float32(pack_s - 1)
                    - 2.0 * iota_j(j).astype(jnp.float32))
            accl = jnp.minimum(accl, dotf + cvec)
        return accf, accl

    # Trailing chunks that touch padding mask columns >= W1 out of both
    # reductions; steady-state chunks have zero masking overhead.
    def body_masked(j, carry):
        accf, accl = carry
        dotf = dotf_chunk(j)
        colv = iota_j(j)
        pen = jnp.where(colv >= w1, jnp.float32(PAD_PENALTY), 0.0)
        accf = jnp.minimum(accf, dotf + pen)
        if need_last:
            cvec = (jnp.float32(pack_s - 1)
                    - 2.0 * colv.astype(jnp.float32))
            accl = jnp.minimum(accl, dotf + cvec + pen)
        return accf, accl

    # Lane-group reduction (see _sweep_minima_i8.body_reduced): the dot
    # already emits packed = s*8192 + col, so the first-minima fold is a
    # bare vreg-aligned min per 128-lane slice.
    def body_reduced(j, carry, masked):
        accf, accl = carry
        dotf = dotf_chunk(j)
        for k in range(tile_j // 128):
            dk = dotf[:, 128 * k : 128 * (k + 1)]
            colk = (j * tile_j + 128 * k
                    + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1))
            if masked:
                pen = jnp.where(colk >= w1, jnp.float32(PAD_PENALTY), 0.0)
                dk = dk + pen
            accf = jnp.minimum(accf, dk)
            if need_last:
                cvec = (jnp.float32(pack_s - 1)
                        - 2.0 * colk.astype(jnp.float32))
                accl = jnp.minimum(accl, dk + cvec)
        return accf, accl

    # Fully unrolled at trace time: Mosaic then software-pipelines the
    # chunks, overlapping each chunk's MXU contraction with the previous
    # chunk's VPU min — measured ~2x over a fori_loop (which fences per
    # iteration). nj is small (<= W/128 chunks), so code size stays sane.
    nj_fast = min(w1 // tile_j, nj)
    acc_w = 128 if reduce else tile_j
    init = jnp.full((tile_i, acc_w), jnp.float32(ACC_INIT), jnp.float32)
    accf, accl = init, init
    if reduce:
        for j in range(nj_fast):
            accf, accl = body_reduced(j, (accf, accl), False)
        for j in range(nj_fast, nj):
            accf, accl = body_reduced(j, (accf, accl), True)
    else:
        for j in range(nj_fast):
            accf, accl = body(j, (accf, accl))
        for j in range(nj_fast, nj):
            accf, accl = body_masked(j, (accf, accl))

    outf = jnp.min(accf, axis=1)
    outl = (jnp.min(accl, axis=1) if need_last
            else jnp.zeros((tile_i,), jnp.float32))
    return outf, outl


def _sweep_minima_i8(
    dot_chunk, tile_i: int, tile_j: int, nj: int, w1: int,
    need_last: bool, reduce: bool, pack_s: int = PACK_S,
):
    """Shared int32 packed-minima sweep over the right-row chunks.

    ``dot_chunk(j)`` must return the (TILE_I, TILE_J) int32 contraction
    ``s = ham - pop(a)`` for chunk j. Packing is exact integer math, with
    shift = log2(pack_s) derived here so shift and the pack_s-1 complement
    can never disagree:

      packed_first = (s << shift) + col               (min keeps smallest col)
      packed_last  = (s << shift) + (pack_s-1 - col)  (min keeps largest col)

    Returns the per-query (TILE_I,) packed minima (first, last-or-zeros).
    """
    shift = pack_s.bit_length() - 1

    def iota_j(j):
        return j * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile_j), 1
        )

    def body(j, carry):
        accf, accl = carry
        s13 = dot_chunk(j) << shift
        colv = iota_j(j)
        accf = jnp.minimum(accf, s13 + colv)
        if need_last:
            accl = jnp.minimum(accl, s13 + (jnp.int32(pack_s - 1) - colv))
        return accf, accl

    def body_masked(j, carry):
        accf, accl = carry
        s13 = dot_chunk(j) << shift
        colv = iota_j(j)
        pen = jnp.where(colv >= w1, jnp.int32(1) << 23, 0)
        accf = jnp.minimum(accf, s13 + colv + pen)
        if need_last:
            accl = jnp.minimum(
                accl, s13 + (jnp.int32(pack_s - 1) - colv) + pen
            )
        return accf, accl

    # Lane-group reduction: running minima live in a (TILE_I, 128) block —
    # each 128-lane slice of the dot output (vreg-aligned, no shuffles)
    # min-folds straight into it, so accumulator VMEM traffic shrinks by
    # TILE_J/128 versus full-tile accumulators. Packed values carry the
    # column index, so cross-lane-group mins stay exact.
    def body_reduced(j, carry, masked):
        accf, accl = carry
        d = dot_chunk(j)
        for k in range(tile_j // 128):
            s13 = d[:, 128 * k : 128 * (k + 1)] << shift
            colk = (j * tile_j + 128 * k
                    + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1))
            pen = (jnp.where(colk >= w1, jnp.int32(1) << 23, 0)
                   if masked else 0)
            accf = jnp.minimum(accf, s13 + (colk + pen))
            if need_last:
                accl = jnp.minimum(
                    accl, s13 + ((jnp.int32(pack_s - 1) - colk) + pen)
                )
        return accf, accl

    nj_fast = min(w1 // tile_j, nj)
    acc_w = 128 if reduce else tile_j
    init = jnp.full((tile_i, acc_w), jnp.int32(1) << 24, jnp.int32)
    accf, accl = init, init
    if reduce:
        for j in range(nj_fast):
            accf, accl = body_reduced(j, (accf, accl), False)
        for j in range(nj_fast, nj):
            accf, accl = body_reduced(j, (accf, accl), True)
    else:
        for j in range(nj_fast):
            accf, accl = body(j, (accf, accl))
        for j in range(nj_fast, nj):
            accf, accl = body_masked(j, (accf, accl))

    outf = jnp.min(accf, axis=1)
    outl = (jnp.min(accl, axis=1) if need_last
            else jnp.zeros((tile_i,), jnp.int32))
    return outf, outl


def _minima_kernel_i8(
    w0_ref,  # (RB, TILE_I, nw) uint32 — left descriptor words for this tile
    w1_ref,  # (RB, W1PAD, nw) uint32 — full right rows, revisited across i
    outf_ref,  # (RB, NI, TILE_I) i32 — whole row of packed first-minima
    outl_ref,  # (RB, NI, TILE_I) i32 — whole row of packed last-minima
    b_scratch,  # (RB, W1PAD, BPAD) int8 — encoded right rows
    *,
    nbits: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    need_last: bool,
    reduce: bool,
    pack_s: int = PACK_S,
):
    """int8-MXU variant of :func:`_minima_kernel`: the v5e MXU runs int8
    contractions at twice the bf16 rate, and the index packing moves to
    exact int32 VPU arithmetic (see :func:`_sweep_minima_i8`)."""
    i = pl.program_id(1)
    rb = w0_ref.shape[0]
    tile_i = w0_ref.shape[1]
    bpad = b_scratch.shape[2]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = w1_ref[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :]
                b_scratch[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :] = (
                    _encode_b_i8(seg, nbits, bpad)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)

    nj = w1pad // tile_j

    for r in range(rb):
        a_i = _encode_a_i8(w0_ref[r], nbits, bpad)

        def dot_chunk(j, r=r, a_i=a_i):
            b_tile = b_scratch[r, pl.ds(j * tile_j, tile_j), :]
            return jax.lax.dot_general(
                a_i, b_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (TILE_I, TILE_J) = s

        outf, outl = _sweep_minima_i8(
            dot_chunk, tile_i, tile_j, nj, w1, need_last, reduce,
            pack_s=pack_s,
        )
        outf_ref[r, i, :] = outf
        outl_ref[r, i, :] = outl


def _consistency_lookup(
    outf_ref, rev_scratch, rcf_ref, rcl_ref, *,
    ni: int, tile_i: int, w1pad: int, no_dupes: bool,
    row: int = 0, src_base: int = 0, pack_s: int = PACK_S,
):
    """In-kernel reverse-minima lookup for the Consistency variant.

    For every left pixel, fetch the packed reverse minima at its forward
    argmin column. The XLA alternative (``take_along_axis`` over the full
    image) costs ~150 ms at 2200x3300 on TPU — element-wise gathers are the
    architecture's weak spot — so the lookup runs here as an exact one-hot
    contraction per row tile: packed reverse values are byte-split into
    three <=255 rows (bf16-exact), and a (W1PAD, TILE_I) one-hot of the
    forward argmin columns selects exactly one product per output in f32
    accumulation. Capacity: three bytes hold values < 2^24 exactly; the
    wide 16384 packing with rowpen reaches ~2^23 + 2^22 + 2^14, so the
    split has NO headroom beyond 2^24 — anything that grows packed values
    (a 4x packing, a larger penalty) must widen this split first.

    Runs inside the ``i == ni-1`` grid step, after ``rev_scratch`` holds the
    whole row's reverse minima and ``outf_ref`` the whole row's forward
    minima. Padded query pixels gather 0 (their argmin column exceeds
    W1PAD's one-hot range or points at unselected columns) and are sliced
    off by the wrapper. Multi-row kernels pass ``row`` (leading block
    index) and ``src_base`` (this row's base in the shared rev scratch).
    """
    f32 = outf_ref.dtype == jnp.float32
    nsrc = 2 if no_dupes else 1

    # Byte-split value matrix (nsrc*3, W1PAD): rows 3k..3k+2 carry source
    # k's bytes b0/b1/b2 (packed values < 2^24 — exactly 3 bytes' capacity;
    # see the docstring's headroom note).
    rows = []
    for k in range(nsrc):
        v = rev_scratch[src_base + k:src_base + k + 1, :]
        v32 = v.astype(jnp.int32) if f32 else v
        for b in range(3):
            rows.append(
                ((v32 >> (8 * b)) & jnp.int32(0xFF))
                .astype(jnp.float32).astype(jnp.bfloat16)
            )
    vmat = jnp.concatenate(rows, axis=0)  # (nsrc*3, W1PAD)

    cidx = jax.lax.broadcasted_iota(jnp.int32, (w1pad, tile_i), 0)
    for ti in range(ni):
        mfv = outf_ref[row, ti, :].reshape(1, tile_i)
        if f32:
            s = jnp.floor(mfv * jnp.float32(1.0 / pack_s))
            idx = (mfv - s * jnp.float32(pack_s)).astype(jnp.int32)
        else:
            idx = mfv & jnp.int32(pack_s - 1)
        onehot = jnp.where(
            cidx == idx, jnp.float32(1.0), jnp.float32(0.0)
        ).astype(jnp.bfloat16)  # (W1PAD, TILE_I)
        g = jax.lax.dot_general(
            vmat, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nsrc*3, TILE_I)

        def recombine(k):
            val = (g[3 * k:3 * k + 1, :]
                   + g[3 * k + 1:3 * k + 2, :] * jnp.float32(256.0)
                   + g[3 * k + 2:3 * k + 3, :] * jnp.float32(65536.0))
            return val if f32 else val.astype(jnp.int32)

        rcf_ref[row, ti, :] = recombine(0)[0]
        if no_dupes:
            rcl_ref[row, ti, :] = recombine(1)[0]
        else:
            rcl_ref[row, ti, :] = jnp.zeros(
                (tile_i,), rcl_ref.dtype
            )


def _encode_b_segments(b_scratch, w1pad: int, write_seg):
    """Fill the K-major database scratch in UNPACK_SEG lane segments inside
    a fori_loop (bounds the encoder's shift/compare temporaries);
    ``write_seg(k)`` must write segment k."""

    def encode_seg(k, carry):
        write_seg(k)
        return carry

    jax.lax.fori_loop(0, w1pad // UNPACK_SEG, encode_seg, 0)


def _minima_kernel_i8_stack(
    cx_ref,  # (BPAD, n) bf16 — compare coefficients (X side)
    cy_ref,  # (BPAD, n) bf16 — compare coefficients (Y side)
    s0_ref,  # (RB, n, TILE_I) raw left samples for this tile
    s1_ref,  # (RB, n, W1PAD) raw right rows, revisited across i
    outf_ref,  # (RB, NI, TILE_I) i32 — packed first-minima
    outl_ref,  # (RB, NI, TILE_I) i32 — packed last-minima
    b_scratch,  # (RB, BPAD, W1PAD) int8 — on-chip descriptor bits, K-major
    *,
    nbits: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    need_last: bool,
    reduce: bool,
    u16: bool,
    pack_s: int = PACK_S,
):
    """Fused transform+search: consumes RAW image stacks and computes the
    descriptor bits on-chip via compare-matrix MXU contractions
    (:func:`_encode_b_i8_stack`), eliminating the separate descriptor
    transform pass entirely (reference pipeline order ``cpu.cpp:49-95``
    runs transform then search as distinct stages; here the transform is
    a prologue of the search kernel's MXU schedule). RB rows per grid step
    (``SEARCH_ROWS``) amortize per-step overhead.
    """
    i = pl.program_id(1)
    rb = s0_ref.shape[0]
    tile_i = s0_ref.shape[2]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_i8_stack(seg, cxb, cyb, u16)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)

    nj = w1pad // tile_j

    for r in range(rb):
        a_i = _encode_a_i8_stack(s0_ref[r], cxb, cyb, nbits, u16)

        def dot_chunk(j, r=r, a_i=a_i):
            b_tile = b_scratch[r, :, pl.ds(j * tile_j, tile_j)]
            return jax.lax.dot_general(
                a_i, b_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (TILE_I, TILE_J) = s

        outf, outl = _sweep_minima_i8(
            dot_chunk, tile_i, tile_j, nj, w1, need_last, reduce,
            pack_s=pack_s,
        )
        outf_ref[r, i, :] = outf
        outl_ref[r, i, :] = outl


def _minima_kernel_bf16_stack(
    cx_ref,  # (BPAD, n) bf16 — compare coefficients (X side)
    cy_ref,  # (BPAD, n) bf16 — compare coefficients (Y side)
    s0_ref,  # (RB, n, TILE_I) raw left samples for this tile
    s1_ref,  # (RB, n, W1PAD) raw right rows, revisited across i
    outf_ref,  # (RB, NI, TILE_I) f32 — packed first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — packed last-minima
    *rest,  # [outb_ref (RB, 128) i32 when bases > 0], b_scratch
    nbits: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    need_last: bool,
    reduce: bool,
    u16: bool,
    pack_s: int = PACK_S,
    bases: tuple = (),  # (chunk, wcap, wp) — emit agree window bases
    w0: int = 0,  # real left width (bases keep mask); only when bases
):
    """bf16-engine fused transform+search (see :func:`_minima_kernel_i8_stack`
    for the on-chip transform and :func:`_minima_kernel` for the
    index-in-contraction packing). RB rows per grid step (``SEARCH_ROWS``)
    amortize per-step overhead; dot shapes are unchanged.

    When ``bases`` is set, a third output carries the agree stage's
    dynamic-window bases (``kernels/agree.py`` ``_chunk_window_bases``
    values, bit-equal) computed from the packed minima already in
    registers: the NoDuplicates keep mask is ``first == last`` and the
    matched column of a kept pixel IS the first argmin, so the per-chunk
    keep-masked min/max falls out of this kernel's epilogue for free.
    Producing these values OUTSIDE the kernel — no matter how — measured
    +17 ms/frame on the fused pipeline (r3 chained-probe bisects,
    bench/logs/r3/probe_chained_compose_stale*.log: any implementation
    that consumes the full decoded disparity between the kernels pays it,
    while trivially-derived operands are free)."""
    if rest and len(rest) == 2:
        outb_ref, b_scratch = rest
    else:
        outb_ref, (b_scratch,) = None, rest
    i = pl.program_id(1)
    rb = s0_ref.shape[0]
    tile_i = s0_ref.shape[2]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_bf16_stack(
                        seg, cxb, cyb, nbits, k * UNPACK_SEG, u16
                    )
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)

    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a_bf16_stack(
            s0_ref[r], cxb, cyb, nbits, u16, extras=True, shift=shift
        )

        def dotf_chunk(j, r=r, a_f=a_f):
            b_tile = b_scratch[r, :, pl.ds(j * tile_j, tile_j)]
            return jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_I, TILE_J) = s*8192 + col

        outf, outl = _sweep_minima_bf16(
            dotf_chunk, tile_i, tile_j, nj, w1, need_last, reduce,
            pack_s=pack_s,
        )
        outf_ref[r, i, :] = outf
        outl_ref[r, i, :] = outl

        if outb_ref is not None:
            bchunk, bwcap, bwp = bases
            # Decode first/last argmin from the packed minima (exact f32
            # integer arithmetic; pack_s is a power of two).
            inv = jnp.float32(1.0 / pack_s)
            o2f = outf.reshape(1, tile_i)
            o2l = outl.reshape(1, tile_i)
            c1 = o2f - jnp.floor(o2f * inv) * pack_s
            cl = (jnp.float32(pack_s - 1)
                  - (o2l - jnp.floor(o2l * inv) * pack_s))
            colg = (i * tile_i + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_i), 1))
            keep = (c1 == cl) & (colg < w0)
            for hsub in range(tile_i // bchunk):
                sl = slice(hsub * bchunk, (hsub + 1) * bchunk)
                ks = keep[:, sl]
                cs = c1[:, sl]
                lo = jnp.min(jnp.where(ks, cs, jnp.float32(w1 - 1)),
                             axis=1, keepdims=True)
                hi = jnp.max(jnp.where(ks, cs, jnp.float32(0.0)),
                             axis=1, keepdims=True)
                bse = (jnp.minimum(lo.astype(jnp.int32),
                                   jnp.int32(bwp - bwcap))
                       & ~jnp.int32(127))
                ok = hi.astype(jnp.int32) <= bse + jnp.int32(bwcap - 1)
                # Lane hsub of this (row, tile) 128-lane block.
                outb_ref[r:r + 1, hsub:hsub + 1] = jnp.where(
                    ok, bse, jnp.int32(-1))


def _consistency_kernel_bf16_stack(
    cx_ref,  # (BPAD, n) bf16
    cy_ref,  # (BPAD, n) bf16
    s0_ref,  # (RB, n, TILE_I)
    s1_ref,  # (RB, n, W1PAD)
    outf_ref,  # (RB, NI, TILE_I) f32 — packed forward first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — packed forward last-minima
    rcf_ref,  # (RB, NI, TILE_I) f32 — reverse first-minima AT the fwd argmin
    rcl_ref,  # (RB, NI, TILE_I) f32 — reverse last-minima AT the fwd argmin
    b_scratch,  # (RB, BPAD, W1PAD) bf16
    rev_scratch,  # (max(8, 2*RB), W1PAD) f32 — rows 2r/2r+1 per image row
    *,
    nbits: int,
    w0: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    tile_i: int,
    no_dupes: bool,
    u16: bool,
    pack_s: int = PACK_S,
):
    """bf16-engine fused transform + forward/reverse Consistency scan
    (combines :func:`_consistency_kernel` with the on-chip transform).
    ``pop0`` for the reverse packing comes from the query encoding's lane
    sum (extras-corrected); the pure ``s*8192`` the reverse direction
    needs is derived from the one forward dot by subtracting the column
    broadcast — ONE contraction per chunk. RB rows per grid step
    (``CONS_ROWS``); each row owns 2 lanes of the shared rev scratch."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    rb = s0_ref.shape[0]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_bf16_stack(
                        seg, cxb, cyb, nbits, k * UNPACK_SEG, u16
                    )
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)
        rev_scratch[...] = jnp.full(
            rev_scratch.shape, jnp.float32(ACC_INIT * 2), jnp.float32
        )

    row0 = i * tile_i + jax.lax.broadcasted_iota(
        jnp.int32, (tile_i, 1), 0
    )
    rowpen = jnp.where(row0 >= w0, jnp.float32(PAD_PENALTY), 0.0)
    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a_bf16_stack(
            s0_ref[r], cxb, cyb, nbits, u16, extras=True, shift=shift
        )

        # pop0 = number of set query bits, recovered from a_f's lane sum:
        # the bit lanes contribute -pack_s per set / +pack_s per clear bit
        # and the two col-split extras a constant 256 + 1 (all exact f32
        # integers, so the correction is exact).
        sum_pm = (jnp.sum(a_f.astype(jnp.float32), axis=1, keepdims=True)
                  - jnp.float32(257.0))
        pop0 = (jnp.float32(nbits)
                - sum_pm * jnp.float32(1.0 / pack_s)) * jnp.float32(0.5)
        radd_f = (pop0 * jnp.float32(pack_s)
                  + row0.astype(jnp.float32) + rowpen)
        radd_l = (pop0 * jnp.float32(pack_s)
                  + (jnp.float32(pack_s - 1) - row0.astype(jnp.float32))
                  + rowpen)

        def chunk(j, accf, accl, masked, r=r, a_f=a_f,
                  radd_f=radd_f, radd_l=radd_l):
            b_tile = b_scratch[r, :, pl.ds(j * tile_j, tile_j)]
            dn = (((1,), (0,)), ((), ()))
            dotf = jax.lax.dot_general(
                a_f, b_tile, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            colv = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1
            )
            colf = colv.astype(jnp.float32)
            # Steady-state chunks (all columns < w1, the peeled fast loop
            # below) skip the padding-penalty add — one fewer full
            # (TILE_I, TILE_J) VPU pass per chunk, like the NoDuplicates
            # sweep's peel.
            pen = (jnp.where(colv >= w1, jnp.float32(PAD_PENALTY), 0.0)
                   if masked else None)
            accf = jnp.minimum(accf, dotf + pen if masked else dotf)
            if no_dupes:
                cvec = jnp.float32(pack_s - 1) - 2.0 * colf
                if masked:
                    cvec = cvec + pen
                accl = jnp.minimum(accl, dotf + cvec)
            # The reverse direction needs pure s*pack_s — derived from the
            # SAME dot (instead of a second bits-only contraction: halves
            # the MXU work), and the column subtraction commutes out of
            # the row reduction: min_rows(dotf - colf + radd) ==
            # min_rows(dotf + radd) - colf (all exact f32 integers), so
            # the (TILE_I, TILE_J) ``dots`` materialization pass
            # disappears — colf is subtracted from the (1, TJ) reduced
            # vector instead.
            rev_f = jnp.min(dotf + radd_f, axis=0, keepdims=True) - colf
            js = pl.ds(j * tile_j, tile_j)
            sb = 2 * r
            rev_scratch[sb:sb + 1, js] = jnp.minimum(
                rev_scratch[sb:sb + 1, js], rev_f
            )
            if no_dupes:
                rev_l = (jnp.min(dotf + radd_l, axis=0, keepdims=True)
                         - colf)
                rev_scratch[sb + 1:sb + 2, js] = jnp.minimum(
                    rev_scratch[sb + 1:sb + 2, js], rev_l
                )
            return accf, accl

        init = jnp.full(
            (tile_i, tile_j), jnp.float32(ACC_INIT), jnp.float32
        )
        accf, accl = init, init
        nj_fast = min(w1 // tile_j, nj)
        for j in range(nj_fast):
            accf, accl = chunk(j, accf, accl, False)
        for j in range(nj_fast, nj):
            accf, accl = chunk(j, accf, accl, True)

        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if no_dupes
                             else jnp.zeros((tile_i,), jnp.float32))

    @pl.when(i == ni - 1)
    def _():
        for r in range(rb):
            _consistency_lookup(
                outf_ref, rev_scratch, rcf_ref, rcl_ref,
                ni=ni, tile_i=tile_i, w1pad=w1pad, no_dupes=no_dupes,
                row=r, src_base=2 * r, pack_s=pack_s,
            )


def _consistency_kernel_bf16_stack_range(
    cx_ref,  # (BPAD, n) bf16
    cy_ref,  # (BPAD, n) bf16
    s0_ref,  # (RB, n, TILE_I)
    s1_ref,  # (RB, n, W1PAD)
    outf_ref,  # (RB, NI, TILE_I) f32 — packed forward first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — packed forward last-minima
    rcf_ref,  # (RB, NI, TILE_I) f32 — reverse first-minima AT the fwd argmin
    rcl_ref,  # (RB, NI, TILE_I) f32 — reverse last-minima AT the fwd argmin
    b_scratch,  # (RB, BPAD, W1PAD) bf16
    rev_scratch,  # (max(8, 2*RB), W1PAD) f32
    *,
    nbits: int,
    w0: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    tile_i: int,
    wwin: int,
    no_dupes: bool,
    u16: bool,
    dmin: int,
    dmax: int,
    pack_s: int = PACK_S,
):
    """Disparity-range fused Consistency scan: the runtime-offset window
    structure of :func:`_minima_kernel_bf16_stack_range` applied to
    :func:`_consistency_kernel_bf16_stack`. Out-of-range (col0, col1)
    pairs are penalized out of all four streams — union over the left
    tiles covers exactly the in-range pair set, so the reverse minima in
    ``rev_scratch`` are the correctly restricted reverse search. The
    reverse range penalty is 2^22 (NOT PAD_PENALTY): reverse packings go
    through the lookup's 3-byte split whose capacity is 2^24
    (``_consistency_lookup``), and 2^22 already exceeds every real
    reverse packing (ham*pack_s + col <= 2^21 + 2^13) while keeping
    penalty + rowpen + value < 2^24 exact. Columns no tile visits keep
    the scratch init — only ever looked up through a penalized forward
    packing, which the wrapper's sentinels gate."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    rb = s0_ref.shape[0]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_bf16_stack(
                        seg, cxb, cyb, nbits, k * UNPACK_SEG, u16
                    )
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)
        rev_scratch[...] = jnp.full(
            rev_scratch.shape, jnp.float32(ACC_INIT * 2), jnp.float32
        )

    base = jnp.clip((i * tile_i - dmax) & ~127, 0, w1pad - wwin)
    base = pl.multiple_of(base, 128)
    row0 = i * tile_i + jax.lax.broadcasted_iota(
        jnp.int32, (tile_i, 1), 0
    )
    rowpen = jnp.where(row0 >= w0, jnp.float32(PAD_PENALTY), 0.0)

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a_bf16_stack(
            s0_ref[r], cxb, cyb, nbits, u16, extras=True, shift=shift
        )
        sum_pm = (jnp.sum(a_f.astype(jnp.float32), axis=1, keepdims=True)
                  - jnp.float32(257.0))
        pop0 = (jnp.float32(nbits)
                - sum_pm * jnp.float32(1.0 / pack_s)) * jnp.float32(0.5)
        radd_f = (pop0 * jnp.float32(pack_s)
                  + row0.astype(jnp.float32) + rowpen)
        radd_l = (pop0 * jnp.float32(pack_s)
                  + (jnp.float32(pack_s - 1) - row0.astype(jnp.float32))
                  + rowpen)

        init = jnp.full(
            (tile_i, tile_j), jnp.float32(ACC_INIT), jnp.float32
        )
        accf, accl = init, init
        for j in range(wwin // tile_j):
            b_tile = b_scratch[r, :, pl.ds(base + j * tile_j, tile_j)]
            dotf = jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            colv = (base + j * tile_j) + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1)
            colf = colv.astype(jnp.float32)
            dm = row0 - colv
            bad = (dm < dmin) | (dm > dmax) | (colv >= w1)
            penf = jnp.where(bad, jnp.float32(PAD_PENALTY), 0.0)
            penr = jnp.where(bad, jnp.float32(1 << 22), 0.0)
            accf = jnp.minimum(accf, dotf + penf)
            if no_dupes:
                cvec = (jnp.float32(pack_s - 1) - 2.0 * colf) + penf
                accl = jnp.minimum(accl, dotf + cvec)
            dotr = dotf + penr
            rev_f = jnp.min(dotr + radd_f, axis=0, keepdims=True) - colf
            js = pl.ds(base + j * tile_j, tile_j)
            sb = 2 * r
            rev_scratch[sb:sb + 1, js] = jnp.minimum(
                rev_scratch[sb:sb + 1, js], rev_f
            )
            if no_dupes:
                rev_l = (jnp.min(dotr + radd_l, axis=0, keepdims=True)
                         - colf)
                rev_scratch[sb + 1:sb + 2, js] = jnp.minimum(
                    rev_scratch[sb + 1:sb + 2, js], rev_l
                )

        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if no_dupes
                             else jnp.zeros((tile_i,), jnp.float32))

    @pl.when(i == ni - 1)
    def _():
        for r in range(rb):
            _consistency_lookup(
                outf_ref, rev_scratch, rcf_ref, rcl_ref,
                ni=ni, tile_i=tile_i, w1pad=w1pad, no_dupes=no_dupes,
                row=r, src_base=2 * r, pack_s=pack_s,
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "no_dupes", "drange", "tile_i", "tile_j", "interpret",
        "rows",
    ),
)
def row_minima_consistency_stack_range(
    stack0,
    stack1,
    *,
    mode,
    no_dupes: bool,
    drange: tuple,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    rows: int | None = None,
):
    """Range-restricted fused Consistency search
    (:func:`_consistency_kernel_bf16_stack_range`). Returns
    ``((None, first0, last0), (None, rc0, rc0_last))`` with no-candidate
    sentinels: forward ``first0 = -1, last0 = -2``; reverse ``rc0 = -1,
    rc0_last = -2`` (never within ``max_lr_diff`` of a real column, and
    explicitly gated by the >= 0 guards in the decode). bf16 engine."""
    from ..config import actual_bits

    n, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    nbits = actual_bits(n, mode)
    pack_s, _ = pack_for_width(max(w0, w1))
    # Same 1<<22 sentinel-headroom guard as row_minima_stack_range.
    assert nbits * pack_s + pack_s - 1 < 1 << 22, (
        f"packing overflow: nbits={nbits} pack_s={pack_s} collides with "
        "the 1<<22 no-candidate sentinel")
    if rows is None:
        rows = CONS_ROWS if pack_s == PACK_S else min(CONS_ROWS, 2)
    tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
    cxp, cyp, _ = _padded_coeffs(n, mode, bpad)
    u16 = stack0.dtype == jnp.uint16
    dmin, dmax = int(drange[0]), int(drange[1])

    st0, st1 = _prep_stack_operands(stack0, stack1, tile_i, tile_j)
    rb = max(1, min(rows, h))
    st0 = _pad_axis(st0, 0, rb)
    st1 = _pad_axis(st1, 0, rb)
    hpad = st0.shape[0]
    w0pad, w1pad = st0.shape[2], st1.shape[2]
    ni = w0pad // tile_i
    span = tile_i + (dmax - dmin) + 128
    wwin = min(w1pad, -(-span // tile_j) * tile_j)

    kernel = functools.partial(
        _consistency_kernel_bf16_stack_range,
        nbits=nbits,
        w0=w0,
        w1=w1,
        w1pad=w1pad,
        tile_j=tile_j,
        tile_i=tile_i,
        wwin=wwin,
        no_dupes=no_dupes,
        u16=u16,
        dmin=dmin,
        dmax=dmax,
        pack_s=pack_s,
    )
    cxj = jnp.asarray(cxp, jnp.bfloat16)
    cyj = jnp.asarray(cyp, jnp.bfloat16)
    grid = (hpad // rb, ni)
    mf, ml, mrf, mrl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, tile_i), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, w1pad), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, bpad, w1pad), jnp.bfloat16),
            pltpu.VMEM((max(8, 2 * rb), w1pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * hpad * w0pad * wwin * bpad,
            bytes_accessed=hpad * (w0pad + w1pad) * n
            + hpad * (w0pad + w1pad) * 8,
            transcendentals=0,
        ),
    )(cxj, cyj, st0, st1)

    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    mrf = mrf.reshape(hpad, w0pad)[:h, :w0]
    big = jnp.float32(1 << 22)

    def dec_first(m, sent):
        s = jnp.floor(m / pack_s)
        return jnp.where(m >= big, jnp.int32(sent),
                         (m - s * pack_s).astype(jnp.int32))

    def dec_last(m, sent):
        s = jnp.floor(m / pack_s)
        return jnp.where(m >= big, jnp.int32(sent),
                         (pack_s - 1) - (m - s * pack_s).astype(jnp.int32))

    first0 = dec_first(mf, -1)
    rc0 = dec_first(mrf, -1)
    if no_dupes:
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
        last0 = dec_last(ml, -2)
        mrl = mrl.reshape(hpad, w0pad)[:h, :w0]
        rc0_last = dec_last(mrl, -2)
    else:
        last0 = None
        rc0_last = None
    return (None, first0, last0), (None, rc0, rc0_last)


def _consistency_kernel_i8_stack(
    cx_ref,  # (BPAD, n) bf16
    cy_ref,  # (BPAD, n) bf16
    s0_ref,  # (RB, n, TILE_I)
    s1_ref,  # (RB, n, W1PAD)
    outf_ref,  # (RB, NI, TILE_I) i32 — packed forward first-minima
    outl_ref,  # (RB, NI, TILE_I) i32 — packed forward last-minima
    rcf_ref,  # (RB, NI, TILE_I) i32 — reverse first-minima AT the fwd argmin
    rcl_ref,  # (RB, NI, TILE_I) i32 — reverse last-minima AT the fwd argmin
    b_scratch,  # (RB, BPAD, W1PAD) int8
    rev_scratch,  # (max(8, 2*RB), W1PAD) i32 — rows 2r/2r+1 per image row
    *,
    nbits: int,
    w0: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    tile_i: int,
    no_dupes: bool,
    u16: bool,
    pack_s: int = PACK_S,
):
    """Fused transform + forward/reverse Consistency scan from raw stacks
    (see :func:`_minima_kernel_i8_stack` and :func:`_consistency_kernel_i8`).
    The reverse packing needs the query popcount to restore the true
    row-dependent Hamming cost; it falls out of the query encoding:
    ``pop0 = (nbits - sum(a_i)) / 2`` since bit lanes carry -1/+1 and
    masked lanes 0."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    rb = s0_ref.shape[0]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_i8_stack(seg, cxb, cyb, u16)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)
        rev_scratch[...] = jnp.full(
            rev_scratch.shape, jnp.int32(1) << 25, jnp.int32
        )

    row0 = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)
    rowpen = jnp.where(row0 >= w0, jnp.int32(1) << 23, 0)
    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_i = _encode_a_i8_stack(s0_ref[r], cxb, cyb, nbits, u16)
        pop0 = (jnp.int32(nbits)
                - jnp.sum(a_i.astype(jnp.int32), axis=1, keepdims=True)) >> 1
        radd_f = (pop0 << shift) + row0 + rowpen
        radd_l = (pop0 << shift) + (jnp.int32(pack_s - 1) - row0) + rowpen

        def chunk(j, accf, accl, r=r, a_i=a_i,
                  radd_f=radd_f, radd_l=radd_l):
            b_tile = b_scratch[r, :, pl.ds(j * tile_j, tile_j)]
            s13 = jax.lax.dot_general(
                a_i, b_tile, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) << shift
            colv = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1
            )
            pen = jnp.where(colv >= w1, jnp.int32(1) << 23, 0)
            accf = jnp.minimum(accf, s13 + colv + pen)
            if no_dupes:
                accl = jnp.minimum(
                    accl, s13 + (jnp.int32(pack_s - 1) - colv) + pen
                )
            rev_f = jnp.min(s13 + radd_f, axis=0, keepdims=True)  # (1, TJ)
            js = pl.ds(j * tile_j, tile_j)
            sb = 2 * r
            rev_scratch[sb:sb + 1, js] = jnp.minimum(
                rev_scratch[sb:sb + 1, js], rev_f
            )
            if no_dupes:
                rev_l = jnp.min(s13 + radd_l, axis=0, keepdims=True)
                rev_scratch[sb + 1:sb + 2, js] = jnp.minimum(
                    rev_scratch[sb + 1:sb + 2, js], rev_l
                )
            return accf, accl

        init = jnp.full((tile_i, tile_j), jnp.int32(1) << 24, jnp.int32)
        accf, accl = init, init
        for j in range(nj):
            accf, accl = chunk(j, accf, accl)

        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if no_dupes
                             else jnp.zeros((tile_i,), jnp.int32))

    @pl.when(i == ni - 1)
    def _():
        for r in range(rb):
            _consistency_lookup(
                outf_ref, rev_scratch, rcf_ref, rcl_ref,
                ni=ni, tile_i=tile_i, w1pad=w1pad, no_dupes=no_dupes,
                row=r, src_base=2 * r, pack_s=pack_s,
            )


def _consistency_kernel(
    w0_ref,  # (RB, TILE_I, nw) uint32 — left descriptor words for this tile
    w1_ref,  # (RB, W1PAD, nw) uint32 — full right rows, revisited across i
    outf_ref,  # (RB, NI, TILE_I) f32 — packed forward first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — packed forward last-minima
    rcf_ref,  # (RB, NI, TILE_I) f32 — reverse first-minima AT the fwd argmin
    rcl_ref,  # (RB, NI, TILE_I) f32 — reverse last-minima AT the fwd argmin
    b_scratch,  # (RB, W1PAD, BPAD) bf16 — encoded right rows
    rev_scratch,  # (max(8, 2*RB), W1PAD) f32 — rows 2r/2r+1 per image row
    *,
    nbits: int,
    w0: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    tile_i: int,
    no_dupes: bool,
    pack_s: int = PACK_S,
):
    """Fused forward+reverse scan for the Consistency variant.

    The reference runs a second full scan per matched pixel
    (``bicos.hpp:100-101``); the XLA path runs two full kernel passes with
    the operands swapped. Here BOTH directions come out of one sweep of the
    cost matrix: the forward packing rides the col-index matmul columns as
    usual, and the reverse packing re-adds the row-varying terms
    (``pop0*8192 + col0``, turning ``s = ham - pop0(col0)`` back into the
    true Hamming cost, which IS row-dependent along the reverse reduction)
    as a per-row broadcast before reducing over rows. Reverse results
    accumulate across the row-tile grid in VMEM scratch and flush on the
    last tile. RB image rows per grid step (``CONS_ROWS``); each row owns
    2 lanes of the shared rev scratch.
    """
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    rb = w0_ref.shape[0]
    bpad = b_scratch.shape[2]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = w1_ref[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :]
                b_scratch[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :] = (
                    _encode_b(seg, k * UNPACK_SEG, nbits, bpad)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)
        rev_scratch[...] = jnp.full(
            rev_scratch.shape, jnp.float32(ACC_INIT * 2), jnp.float32
        )

    row0 = i * tile_i + jax.lax.broadcasted_iota(
        jnp.int32, (tile_i, 1), 0
    )
    rowpen = jnp.where(row0 >= w0, jnp.float32(PAD_PENALTY), 0.0)
    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a(w0_ref[r], nbits, bpad, sign=-1, shift=shift)

        # Row-varying reverse terms: pop0*8192 restores the true Hamming
        # cost (s depends on the row's popcount, which is NOT constant
        # along the reverse reduction), col0 packs the argmin, and padded
        # query rows (>= W0) get a penalty so they never win.
        bits0 = _unpack_bits_i32(w0_ref[r].reshape(tile_i, -1))
        pop0 = jnp.sum(bits0, axis=1, keepdims=True).astype(jnp.float32)
        radd_f = (pop0 * jnp.float32(pack_s)
                  + row0.astype(jnp.float32) + rowpen)
        radd_l = (pop0 * jnp.float32(pack_s)
                  + (jnp.float32(pack_s - 1) - row0.astype(jnp.float32))
                  + rowpen)

        def chunk(j, accf, accl, masked, r=r, a_f=a_f,
                  radd_f=radd_f, radd_l=radd_l):
            b_tile = b_scratch[r, pl.ds(j * tile_j, tile_j), :]
            dn = (((1,), (1,)), ((), ()))
            dotf = jax.lax.dot_general(
                a_f, b_tile, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            colv = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1
            )
            colf = colv.astype(jnp.float32)
            # Steady-state chunks (peeled loop below) skip the pad-penalty
            # add; the reverse direction's pure s*pack_s is derived from
            # the SAME dot (halving the MXU work vs a second contraction)
            # with the column subtraction commuted OUT of the row
            # reduction — min_rows(dotf - colf + radd) ==
            # min_rows(dotf + radd) - colf on exact f32 integers — so the
            # (TILE_I, TILE_J) ``dots`` pass disappears.
            pen = (jnp.where(colv >= w1, jnp.float32(PAD_PENALTY), 0.0)
                   if masked else None)
            accf = jnp.minimum(accf, dotf + pen if masked else dotf)
            if no_dupes:
                cvec = jnp.float32(pack_s - 1) - 2.0 * colf
                if masked:
                    cvec = cvec + pen
                accl = jnp.minimum(accl, dotf + cvec)
            # Reverse: min over rows of (ham*8192 + col0) per right column.
            rev_f = jnp.min(dotf + radd_f, axis=0, keepdims=True) - colf
            js = pl.ds(j * tile_j, tile_j)
            sb = 2 * r
            rev_scratch[sb:sb + 1, js] = jnp.minimum(
                rev_scratch[sb:sb + 1, js], rev_f
            )
            if no_dupes:
                rev_l = (jnp.min(dotf + radd_l, axis=0, keepdims=True)
                         - colf)
                rev_scratch[sb + 1:sb + 2, js] = jnp.minimum(
                    rev_scratch[sb + 1:sb + 2, js], rev_l
                )
            return accf, accl

        init = jnp.full(
            (tile_i, tile_j), jnp.float32(ACC_INIT), jnp.float32
        )
        accf, accl = init, init
        nj_fast = min(w1 // tile_j, nj)
        for j in range(nj_fast):
            accf, accl = chunk(j, accf, accl, False)
        for j in range(nj_fast, nj):
            accf, accl = chunk(j, accf, accl, True)

        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if no_dupes
                             else jnp.zeros((tile_i,), jnp.float32))

    @pl.when(i == ni - 1)
    def _():
        for r in range(rb):
            _consistency_lookup(
                outf_ref, rev_scratch, rcf_ref, rcl_ref,
                ni=ni, tile_i=tile_i, w1pad=w1pad, no_dupes=no_dupes,
                row=r, src_base=2 * r, pack_s=pack_s,
            )


def _consistency_kernel_i8(
    w0_ref,  # (RB, TILE_I, nw) uint32
    w1_ref,  # (RB, W1PAD, nw) uint32
    outf_ref,  # (RB, NI, TILE_I) i32 — packed forward first-minima
    outl_ref,  # (RB, NI, TILE_I) i32 — packed forward last-minima
    rcf_ref,  # (RB, NI, TILE_I) i32 — reverse first-minima AT the fwd argmin
    rcl_ref,  # (RB, NI, TILE_I) i32 — reverse last-minima AT the fwd argmin
    b_scratch,  # (RB, W1PAD, BPAD) int8 — encoded right rows
    rev_scratch,  # (max(8, 2*RB), W1PAD) i32 — rows 2r/2r+1 per image row
    *,
    nbits: int,
    w0: int,
    w1: int,
    w1pad: int,
    tile_j: int,
    tile_i: int,
    no_dupes: bool,
    pack_s: int = PACK_S,
):
    """int8-MXU fused Consistency scan.

    Like the bf16 kernel this issues ONE contraction per chunk — here the
    dot IS pure ``s`` and both directions pack on the VPU (the bf16 kernel
    instead derives ``s*pack_s`` from its extras dot by subtracting the
    column broadcast). RB image rows per grid step; each row owns 2 lanes
    of the rev scratch.
    """
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    rb = w0_ref.shape[0]
    bpad = b_scratch.shape[2]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = w1_ref[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :]
                b_scratch[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :] = (
                    _encode_b_i8(seg, nbits, bpad)
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)
        rev_scratch[...] = jnp.full(
            rev_scratch.shape, jnp.int32(1) << 25, jnp.int32
        )

    row0 = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)
    rowpen = jnp.where(row0 >= w0, jnp.int32(1) << 23, 0)
    nj = w1pad // tile_j

    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_i = _encode_a_i8(w0_ref[r], nbits, bpad)

        # Row-varying reverse terms: pop0*8192 restores the true Hamming
        # cost; padded query rows (>= W0) are penalized out.
        bits0 = _unpack_bits_i32(w0_ref[r].reshape(tile_i, -1))
        pop0 = jnp.sum(bits0, axis=1, keepdims=True)
        radd_f = (pop0 << shift) + row0 + rowpen
        radd_l = (pop0 << shift) + (jnp.int32(pack_s - 1) - row0) + rowpen

        def chunk(j, accf, accl, r=r, a_i=a_i,
                  radd_f=radd_f, radd_l=radd_l):
            b_tile = b_scratch[r, pl.ds(j * tile_j, tile_j), :]
            s13 = jax.lax.dot_general(
                a_i, b_tile, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) << shift
            colv = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1
            )
            pen = jnp.where(colv >= w1, jnp.int32(1) << 23, 0)
            accf = jnp.minimum(accf, s13 + colv + pen)
            if no_dupes:
                accl = jnp.minimum(
                    accl, s13 + (jnp.int32(pack_s - 1) - colv) + pen
                )
            rev_f = jnp.min(s13 + radd_f, axis=0, keepdims=True)  # (1, TJ)
            js = pl.ds(j * tile_j, tile_j)
            sb = 2 * r
            rev_scratch[sb:sb + 1, js] = jnp.minimum(
                rev_scratch[sb:sb + 1, js], rev_f
            )
            if no_dupes:
                rev_l = jnp.min(s13 + radd_l, axis=0, keepdims=True)
                rev_scratch[sb + 1:sb + 2, js] = jnp.minimum(
                    rev_scratch[sb + 1:sb + 2, js], rev_l
                )
            return accf, accl

        init = jnp.full((tile_i, tile_j), jnp.int32(1) << 24, jnp.int32)
        accf, accl = init, init
        for j in range(nj):
            accf, accl = chunk(j, accf, accl)

        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if no_dupes
                             else jnp.zeros((tile_i,), jnp.int32))

    @pl.when(i == ni - 1)
    def _():
        for r in range(rb):
            _consistency_lookup(
                outf_ref, rev_scratch, rcf_ref, rcl_ref,
                ni=ni, tile_i=tile_i, w1pad=w1pad, no_dupes=no_dupes,
                row=r, src_base=2 * r, pack_s=pack_s,
            )


def _pad_axis(x, axis: int, mult: int):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbits", "need_last", "tile_i", "tile_j", "interpret", "engine",
        "reduce", "rows", "pack_s",
    ),
)
def _row_minima_words(
    words0,
    words1,
    pop0,
    *,
    nbits: int,
    need_last: bool,
    tile_i: int,
    tile_j: int,
    interpret: bool,
    engine: str,
    reduce: bool = False,
    rows: int = 1,
    pack_s: int = PACK_S,
):
    h, w0, nw = words0.shape
    w1 = words1.shape[1]

    words0p = _pad_axis(words0, 1, tile_i)
    words1p = _pad_axis(words1, 1, max(tile_j, UNPACK_SEG))
    rb = max(1, min(rows, h))
    words0p = _pad_axis(words0p, 0, rb)
    words1p = _pad_axis(words1p, 0, rb)
    hpad = words0p.shape[0]
    w0pad = words0p.shape[1]
    w1pad = words1p.shape[1]
    ni = w0pad // tile_i
    if engine == "i8":
        # Bits only: the column index packs on the VPU post-contraction.
        bpad = max(128, ((nbits + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = _minima_kernel_i8, jnp.int8, jnp.int32
    else:
        # Two col-split columns ride after the descriptor bits.
        bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _minima_kernel, jnp.bfloat16, jnp.float32,
        )

    kernel = functools.partial(
        kernel_fn,
        nbits=nbits,
        w1=w1,
        w1pad=w1pad,
        tile_j=tile_j,
        need_last=need_last,
        reduce=reduce,
        pack_s=pack_s,
    )

    grid = (hpad // rb, ni)
    mf, ml = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rb, tile_i, nw),
                lambda r, i: (r, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rb, w1pad, nw),
                lambda r, i: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype),
            jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((rb, w1pad, bpad), b_dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * hpad * w0pad * w1pad * bpad * (2 if need_last else 1),
            bytes_accessed=(hpad * (w0pad + w1pad) * nw * 4
                            + hpad * w0pad * 8),
            transcendentals=0,
        ),
    )(words0p, words1p)

    shift = pack_s.bit_length() - 1
    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    if engine == "i8":
        # mf = s*pack_s + col in exact int32; >> shift floors for negative s
        # and the low bits are col regardless of sign.
        first = mf & jnp.int32(pack_s - 1)
        cost = (mf >> shift) + pop0
        if need_last:
            ml = ml.reshape(hpad, w0pad)[:h, :w0]
            last = (pack_s - 1) - (ml & jnp.int32(pack_s - 1))
        else:
            last = None
        return cost, first, last
    # Decode mf = s*pack_s + col (exact f32 ints; s may be negative).
    sf = jnp.floor(mf / pack_s)
    first = (mf - sf * pack_s).astype(jnp.int32)
    cost = sf.astype(jnp.int32) + pop0
    if need_last:
        # ml = min(s*pack_s + (pack_s-1 - col)): the minimal s wins with the
        # LARGEST col as tiebreak; col = pack_s-1 - (ml mod pack_s).
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
        sl = jnp.floor(ml / pack_s)
        last = (pack_s - 1) - (ml - sl * pack_s).astype(jnp.int32)
    else:
        last = None
    return cost, first, last


def _band_range_penalty(off_delta, i, tile_i: int, j, tile_j: int,
                        drange: tuple):
    """(TILE_I, TILE_J) disparity-range penalty for one band-kernel tile.

    ``d = col0_global - col1_global = off_delta + (i*tile_i + ii)
    - (j*tile_j + jj)`` with ``off_delta = off0 - off1`` (left minus right
    band offset, a runtime scalar). Branch-free: out-of-range candidates
    get PAD_PENALTY added, exactly like the pad masks — no control flow,
    no specialization on the runtime offsets (the r4 Mosaic-pipelining
    lesson)."""
    dmin, dmax = drange
    base = off_delta + i * tile_i - j * tile_j
    rowv = jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    colv = jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    d = base + rowv - colv
    bad = (d < jnp.int32(dmin)) | (d > jnp.int32(dmax))
    return jnp.where(bad, jnp.float32(PAD_PENALTY), 0.0)


def _minima_kernel_band(
    off_ref,  # SMEM (2,) int32 — [right-band offset, left-band offset]
    w0_ref,  # (RB, TILE_I, nw) uint32 — left-band descriptor words
    w1_ref,  # (RB, BANDPAD, nw) uint32 — right band (the ring payload)
    outf_ref,  # (RB, NI, TILE_I) f32 — packed s*8192 + col_global
    outl_ref,  # (RB, NI, TILE_I) f32 — packed s*8192 + (8191 - col_global)
    b_scratch,  # (RB, BANDPAD, BPAD) bf16 — encoded band
    *,
    nbits: int,
    band: int,
    bandpad: int,
    w1_total: int,
    tile_j: int,
    need_last: bool,
    pack_s: int = PACK_S,
    drange: tuple = (),
):
    """W-band variant of :func:`_minima_kernel` for the ``ppermute`` ring
    (``sharding.row_minima_wband``): scans ONE right-descriptor band whose
    global column offset arrives as a scalar (SMEM) operand, and emits
    minima packed on GLOBAL column indices so successive ring steps fold
    with a plain elementwise min (the analogue of the reference's smem row
    staging ``bicos.cuh:77-140``, here spread over chips). Local tile
    padding (local col >= ``band``) and ring padding (global col >=
    ``w1_total``) are penalized out of both reductions; all chunks run
    masked because the boundary chunk depends on the runtime offset.
    ``drange=(dmin, dmax)`` additionally penalizes out-of-range candidates
    (``d = col0_global - col1_global``, Config.disparity_range on the
    W-banded path): a branch-free per-tile mask — the range's real saving
    is the whole ring visits the sharding layer statically skips."""
    i = pl.program_id(1)
    off = off_ref[0]
    rb = w0_ref.shape[0]
    tile_i = w0_ref.shape[1]
    bpad = b_scratch.shape[2]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = w1_ref[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :]
                b_scratch[r, pl.ds(k * UNPACK_SEG, UNPACK_SEG), :] = (
                    _encode_b(seg, off + k * UNPACK_SEG, nbits, bpad)
                )

        _encode_b_segments(b_scratch, bandpad, write_seg)

    nj = bandpad // tile_j
    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a(w0_ref[r], nbits, bpad, sign=-1, shift=shift)
        init = jnp.full((tile_i, tile_j), jnp.float32(ACC_INIT),
                        jnp.float32)
        accf, accl = init, init
        for j in range(nj):
            b_tile = b_scratch[r, pl.ds(j * tile_j, tile_j), :]
            dotf = jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_I, TILE_J) = s*8192 + col_global
            lcol = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1)
            gcol = off + lcol
            pen = (jnp.where(lcol >= band, jnp.float32(PAD_PENALTY), 0.0)
                   + jnp.where(gcol >= w1_total,
                               jnp.float32(PAD_PENALTY), 0.0))
            if drange:
                pen = pen + _band_range_penalty(
                    off_ref[1] - off, i, tile_i, j, tile_j, drange)
            accf = jnp.minimum(accf, dotf + pen)
            if need_last:
                cvec = (jnp.float32(pack_s - 1)
                        - 2.0 * gcol.astype(jnp.float32))
                accl = jnp.minimum(accl, dotf + cvec + pen)
        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if need_last
                             else jnp.zeros((tile_i,), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbits", "w1_total", "need_last", "tile_i", "tile_j", "interpret",
        "rows", "drange",
    ),
)
def row_minima_words_band(
    words0,
    words1_band,
    col_off,
    col_off0=0,
    *,
    nbits: int,
    w1_total: int,
    need_last: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    rows: int = 0,
    drange=None,
):
    """Packed minima of a left column band against ONE right band at global
    column offset ``col_off`` (a traced scalar — one compiled kernel serves
    every ring step).

    Returns RAW f32 packings ``(s*8192 + col_global,
    s*8192 + (8191 - col_global))`` of shape (H, W0) — fold ring steps with
    ``jnp.minimum`` and decode once at the end (``cost = floor(p / 8192) +
    pop(a)``, see ``_row_minima_words``). ``ml`` is None when ``need_last``
    is False."""
    h, w0, nw = words0.shape
    band = words1_band.shape[1]
    # Ultra-wide rings (total width in [8192, 16384)) use the 16384 packing;
    # derived via pack_for_width from the STATIC w1_total so every caller
    # (and the decode in sharding._ring_minima_packed) shares the rule.
    pack_s, _ = pack_for_width(w1_total)
    if not rows and pack_s != PACK_S:
        rows = min(SEARCH_ROWS, 4)
    rows = rows or SEARCH_ROWS
    words0p = _pad_axis(words0, 1, tile_i)
    words1p = _pad_axis(words1_band, 1, max(tile_j, UNPACK_SEG))
    rb = max(1, min(rows, h))
    words0p = _pad_axis(words0p, 0, rb)
    words1p = _pad_axis(words1p, 0, rb)
    hpad, w0pad = words0p.shape[:2]
    bandpad = words1p.shape[1]
    ni = w0pad // tile_i
    bpad = max(128, ((nbits + 2 + 127) // 128) * 128)

    kernel = functools.partial(
        _minima_kernel_band,
        nbits=nbits,
        band=band,
        bandpad=bandpad,
        w1_total=w1_total,
        tile_j=tile_j,
        need_last=need_last,
        pack_s=pack_s,
        drange=tuple(drange) if drange is not None else (),
    )
    off_arr = jnp.stack([
        jnp.asarray(col_off, jnp.int32).reshape(()),
        jnp.asarray(col_off0, jnp.int32).reshape(()),
    ])
    grid = (hpad // rb, ni)
    mf, ml = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rb, tile_i, nw),
                lambda r, i: (r, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rb, bandpad, nw),
                lambda r, i: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rb, bandpad, bpad), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * hpad * w0pad * bandpad * bpad
                   * (2 if need_last else 1)),
            bytes_accessed=(hpad * (w0pad + bandpad) * nw * 4
                            + hpad * w0pad * 8),
            transcendentals=0,
        ),
    )(off_arr, words0p, words1p)

    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    if need_last:
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
    else:
        ml = None
    return mf, ml


def _minima_kernel_bf16_stack_range(
    cx_ref,  # (BPAD, n) bf16 — compare coefficients (X side)
    cy_ref,  # (BPAD, n) bf16 — compare coefficients (Y side)
    s0_ref,  # (RB, n, TILE_I) raw left samples for this tile
    s1_ref,  # (RB, n, W1PAD) raw right rows
    outf_ref,  # (RB, NI, TILE_I) f32 — packed first-minima
    outl_ref,  # (RB, NI, TILE_I) f32 — packed last-minima
    b_scratch,  # (RB, BPAD, W1PAD) bf16
    *,
    nbits: int,
    w1: int,
    w1pad: int,
    tile_i: int,
    tile_j: int,
    wwin: int,  # static window width (tile_i + range span, aligned)
    u16: bool,
    dmin: int,
    dmax: int,
    pack_s: int = PACK_S,
):
    """Disparity-range fused transform+search (``Config.disparity_range``).

    Same grid/operands as :func:`_minima_kernel_bf16_stack`, but the sweep
    covers only a ``wwin``-column window of the encoded right row whose
    offset is a LINEAR function of the (runtime) tile index — a dynamic
    128-aligned slice, no branches (dynamic slices measured ~3 ms/frame vs
    ~31 for per-chunk branching; BASELINE.md "The dynamic-window
    artifact"). The column packing rides the contraction (the encode bakes
    GLOBAL column ids into the b rows), so the packings are correct at any
    slice position. Every chunk applies the range/row mask (the range
    boundary is diagonal in (col0, col1), so there is no steady state).
    A pixel whose range window leaves the row keeps a penalized packing,
    which the wrapper decodes to the no-candidate sentinel.
    """
    i = pl.program_id(1)
    rb = s0_ref.shape[0]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_bf16_stack(
                        seg, cxb, cyb, nbits, k * UNPACK_SEG, u16
                    )
                )

        _encode_b_segments(b_scratch, w1pad, write_seg)

    # Window base for this tile: covers col1 in
    # [i*TILE_I - dmax, i*TILE_I + TILE_I - 1 - dmin], clamped to the row.
    base = jnp.clip((i * tile_i - dmax) & ~127, 0, w1pad - wwin)
    base = pl.multiple_of(base, 128)
    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a_bf16_stack(
            s0_ref[r], cxb, cyb, nbits, u16, extras=True, shift=shift
        )
        init = jnp.full((tile_i, tile_j), jnp.float32(ACC_INIT),
                        jnp.float32)
        accf, accl = init, init
        row0 = i * tile_i + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, 1), 0)
        for j in range(wwin // tile_j):
            b_tile = b_scratch[r, :, pl.ds(base + j * tile_j, tile_j)]
            dotf = jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_I, TILE_J) = s*pack_s + col_global
            colv = (base + j * tile_j) + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1)
            dm = row0 - colv  # (TILE_I, TILE_J) candidate disparity
            bad = (dm < dmin) | (dm > dmax) | (colv >= w1)
            dotp = dotf + jnp.where(bad, jnp.float32(PAD_PENALTY), 0.0)
            accf = jnp.minimum(accf, dotp)
            cvec = (jnp.float32(pack_s - 1)
                    - 2.0 * colv.astype(jnp.float32))
            accl = jnp.minimum(accl, dotp + cvec)
        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = jnp.min(accl, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "drange", "tile_i", "tile_j", "interpret", "rows",
    ),
)
def row_minima_stack_range(
    stack0,
    stack1,
    *,
    mode,
    drange: tuple,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    rows: int | None = None,
):
    """Fused transform+search restricted to ``drange = (dmin, dmax)``
    (:func:`_minima_kernel_bf16_stack_range`): returns ``(None, first,
    last)`` with the no-candidate sentinel ``first = -1, last = -2``.
    NoDuplicates only (need_last always on); bf16 engine only. The sweep
    is O(W * range) instead of O(W^2): ``wwin`` columns per tile instead
    of the full padded width."""
    from ..config import actual_bits

    n, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    nbits = actual_bits(n, mode)
    pack_s, _ = pack_for_width(max(w0, w1))
    # The no-candidate sentinel test below (mf >= 1<<22) needs every real
    # packing (cost * pack_s + idx <= nbits * pack_s + pack_s - 1) to stay
    # strictly under it; actual_bits caps at 254 today, which leaves only
    # ~16k headroom at pack_s=16384 — fail loudly if a future MAX_BITS
    # change would silently misdecode max-cost pixels as invalid.
    assert nbits * pack_s + pack_s - 1 < 1 << 22, (
        f"packing overflow: nbits={nbits} pack_s={pack_s} collides with "
        "the 1<<22 no-candidate sentinel")
    if rows is None:
        rows = SEARCH_ROWS if pack_s == PACK_S else min(SEARCH_ROWS, 4)
    tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
    cxp, cyp, _ = _padded_coeffs(n, mode, bpad)
    u16 = stack0.dtype == jnp.uint16
    dmin, dmax = int(drange[0]), int(drange[1])

    st0, st1 = _prep_stack_operands(stack0, stack1, tile_i, tile_j)
    rb = max(1, min(rows, h))
    st0 = _pad_axis(st0, 0, rb)
    st1 = _pad_axis(st1, 0, rb)
    hpad = st0.shape[0]
    w0pad, w1pad = st0.shape[2], st1.shape[2]
    ni = w0pad // tile_i
    # Window: [i*TI - dmax (128-aligned down), ...) spanning the range plus
    # the tile, rounded to whole tile_j chunks; clamped windows still cover
    # because in-range col1 never leaves [0, w1).
    span = tile_i + (dmax - dmin) + 128  # +128 for the align-down slack
    wwin = min(w1pad, -(-span // tile_j) * tile_j)

    kernel = functools.partial(
        _minima_kernel_bf16_stack_range,
        nbits=nbits,
        w1=w1,
        w1pad=w1pad,
        tile_i=tile_i,
        tile_j=tile_j,
        wwin=wwin,
        u16=u16,
        dmin=dmin,
        dmax=dmax,
        pack_s=pack_s,
    )
    cxj = jnp.asarray(cxp, jnp.bfloat16)
    cyj = jnp.asarray(cyp, jnp.bfloat16)
    mf, ml = pl.pallas_call(
        kernel,
        grid=(hpad // rb, ni),
        in_specs=[
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, tile_i), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, w1pad), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rb, bpad, w1pad), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * hpad * w0pad * wwin * bpad * 2,
            bytes_accessed=hpad * (w0pad + w1pad) * n + hpad * w0pad * 8,
            transcendentals=0,
        ),
    )(cxj, cyj, st0, st1)

    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    ml = ml.reshape(hpad, w0pad)[:h, :w0]
    # No-candidate sentinel: real packings stay < 2^22 at both pack
    # widths; penalized / never-visited pixels carry >= PAD_PENALTY -
    # 2^21 or ACC_INIT.
    none = mf >= jnp.float32(1 << 22)
    sf = jnp.floor(mf / pack_s)
    first = jnp.where(none, jnp.int32(-1),
                      (mf - sf * pack_s).astype(jnp.int32))
    sl = jnp.floor(ml / pack_s)
    last = jnp.where(none, jnp.int32(-2),
                     (pack_s - 1) - (ml - sl * pack_s).astype(jnp.int32))
    return None, first, last


def _minima_kernel_band_stack(
    off_ref,  # (2,) i32 in SMEM — [visiting-band offset, left-band offset]
    cx_ref,  # (BPAD, n) bf16 — compare coefficients (X side)
    cy_ref,  # (BPAD, n) bf16 — compare coefficients (Y side)
    s0_ref,  # (RB, n, TILE_I) raw left samples for this tile
    s1_ref,  # (RB, n, BANDPAD) raw right BAND samples
    outf_ref,  # (RB, NI, TILE_I) f32 — packed first-minima (global cols)
    outl_ref,  # (RB, NI, TILE_I) f32 — packed last-minima
    b_scratch,  # (RB, BPAD, BANDPAD) bf16 — on-chip bits + col rows
    *,
    nbits: int,
    band: int,
    bandpad: int,
    w1_total: int,
    tile_j: int,
    need_last: bool,
    u16: bool,
    pack_s: int = PACK_S,
    drange: tuple = (),
):
    """FUSED transform + W-band scan: the ``ppermute`` ring rotates RAW
    image bands and each visit computes the descriptor bits ON-CHIP from
    the compare-coefficient contractions (``_encode_b_bf16_stack``) —
    replacing :func:`_minima_kernel_band`'s per-visit uint32 unpack, the
    words path's dominant VPU cost (the single-chip fused-vs-words gap is
    89 vs 134 ms for the same reason). Packing/penalty structure is
    identical to the words band kernel: global-column packings so ring
    steps fold with one elementwise min."""
    i = pl.program_id(1)
    off = off_ref[0]
    rb = s0_ref.shape[0]
    tile_i = s0_ref.shape[2]
    cxb = cx_ref[...]
    cyb = cy_ref[...]

    @pl.when(i == 0)
    def _():
        def write_seg(k):
            for r in range(rb):
                seg = s1_ref[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)]
                b_scratch[r, :, pl.ds(k * UNPACK_SEG, UNPACK_SEG)] = (
                    _encode_b_bf16_stack(
                        seg, cxb, cyb, nbits, off + k * UNPACK_SEG, u16
                    )
                )

        _encode_b_segments(b_scratch, bandpad, write_seg)

    nj = bandpad // tile_j
    shift = pack_s.bit_length() - 1
    for r in range(rb):
        a_f = _encode_a_bf16_stack(
            s0_ref[r], cxb, cyb, nbits, u16, extras=True, shift=shift
        )
        init = jnp.full((tile_i, tile_j), jnp.float32(ACC_INIT),
                        jnp.float32)
        accf, accl = init, init
        for j in range(nj):
            b_tile = b_scratch[r, :, pl.ds(j * tile_j, tile_j)]
            dotf = jax.lax.dot_general(
                a_f, b_tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TILE_I, TILE_J) = s*pack_s + col_global
            lcol = j * tile_j + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_j), 1)
            gcol = off + lcol
            pen = (jnp.where(lcol >= band, jnp.float32(PAD_PENALTY), 0.0)
                   + jnp.where(gcol >= w1_total,
                               jnp.float32(PAD_PENALTY), 0.0))
            if drange:
                pen = pen + _band_range_penalty(
                    off_ref[1] - off, i, tile_i, j, tile_j, drange)
            accf = jnp.minimum(accf, dotf + pen)
            if need_last:
                cvec = (jnp.float32(pack_s - 1)
                        - 2.0 * gcol.astype(jnp.float32))
                accl = jnp.minimum(accl, dotf + cvec + pen)
        outf_ref[r, i, :] = jnp.min(accf, axis=1)
        outl_ref[r, i, :] = (jnp.min(accl, axis=1) if need_last
                             else jnp.zeros((tile_i,), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "w1_total", "need_last", "tile_i", "tile_j", "interpret",
        "rows", "drange",
    ),
)
def row_minima_stack_band(
    stack0_band,
    stack1_band,
    col_off,
    col_off0=0,
    *,
    mode,
    w1_total: int,
    need_last: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    rows: int = 0,
    drange=None,
):
    """Fused transform + band scan from RAW ``(n, H, band)`` stacks (the
    W-band ring's fused engine — see :func:`_minima_kernel_band_stack`).

    Same contract as :func:`row_minima_words_band` (raw f32 global-column
    packings, fold with ``jnp.minimum``, decode once after the ring), but
    descriptors never materialize: both sides encode on-chip. Raises
    ValueError for LIMITED n < 4 (constant descriptor bit) — callers fall
    back to the words ring."""
    from ..config import actual_bits

    n, h, w0 = stack0_band.shape
    band = stack1_band.shape[2]
    nbits = actual_bits(n, mode)
    pack_s, _ = pack_for_width(w1_total)
    if not rows and pack_s != PACK_S:
        rows = min(SEARCH_ROWS, 4)
    rows = rows or SEARCH_ROWS
    tile_i = min(tile_i, max(128, ((w0 + 127) // 128) * 128))
    st0, st1 = _prep_stack_operands(stack0_band, stack1_band, tile_i, tile_j)
    rb = max(1, min(rows, h))
    st0 = _pad_axis(st0, 0, rb)
    st1 = _pad_axis(st1, 0, rb)
    hpad = st0.shape[0]
    w0pad, bandpad = st0.shape[2], st1.shape[2]
    ni = w0pad // tile_i
    bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
    cxp, cyp, _ = _padded_coeffs(n, mode, bpad)
    u16 = stack0_band.dtype == jnp.uint16

    kernel = functools.partial(
        _minima_kernel_band_stack,
        nbits=nbits,
        band=band,
        bandpad=bandpad,
        w1_total=w1_total,
        tile_j=tile_j,
        need_last=need_last,
        u16=u16,
        pack_s=pack_s,
        drange=tuple(drange) if drange is not None else (),
    )
    off_arr = jnp.stack([
        jnp.asarray(col_off, jnp.int32).reshape(()),
        jnp.asarray(col_off0, jnp.int32).reshape(()),
    ])
    cxj = jnp.asarray(cxp, jnp.bfloat16)
    cyj = jnp.asarray(cyp, jnp.bfloat16)
    grid = (hpad // rb, ni)
    mf, ml = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, tile_i), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, bandpad), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
            jax.ShapeDtypeStruct((hpad, ni, tile_i), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rb, bpad, bandpad), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * hpad * w0pad * bandpad * bpad
                   * (2 if need_last else 1)),
            bytes_accessed=(hpad * (w0pad + bandpad) * n
                            + hpad * w0pad * 8),
            transcendentals=0,
        ),
    )(off_arr, cxj, cyj, st0, st1)

    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    if need_last:
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
    else:
        ml = None
    return mf, ml


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbits", "no_dupes", "tile_i", "tile_j", "interpret", "engine",
        "rows", "pack_s",
    ),
)
def _row_minima_consistency_words(
    words0,
    words1,
    pop0,
    *,
    nbits: int,
    no_dupes: bool,
    tile_i: int,
    tile_j: int,
    interpret: bool,
    engine: str,
    rows: int = 1,
    pack_s: int = PACK_S,
):
    h, w0, nw = words0.shape
    w1 = words1.shape[1]

    words0p = _pad_axis(words0, 1, tile_i)
    words1p = _pad_axis(words1, 1, max(tile_j, UNPACK_SEG))
    rb = max(1, min(rows, h))
    words0p = _pad_axis(words0p, 0, rb)
    words1p = _pad_axis(words1p, 0, rb)
    hpad = words0p.shape[0]
    w0pad = words0p.shape[1]
    w1pad = words1p.shape[1]
    ni = w0pad // tile_i
    if engine == "i8":
        bpad = max(128, ((nbits + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _consistency_kernel_i8, jnp.int8, jnp.int32,
        )
    else:
        bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _consistency_kernel, jnp.bfloat16, jnp.float32,
        )

    kernel = functools.partial(
        kernel_fn,
        nbits=nbits,
        w0=w0,
        w1=w1,
        w1pad=w1pad,
        tile_j=tile_j,
        tile_i=tile_i,
        no_dupes=no_dupes,
        pack_s=pack_s,
    )

    grid = (hpad // rb, ni)
    mf, ml, mrf, mrl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rb, tile_i, nw), lambda r, i: (r, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rb, w1pad, nw), lambda r, i: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, w1pad, bpad), b_dtype),
            pltpu.VMEM((max(8, 2 * rb), w1pad), out_dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * hpad * w0pad * w1pad * bpad,
            bytes_accessed=(hpad * (w0pad + w1pad) * nw * 4
                            + hpad * (w0pad + w1pad) * 8),
            transcendentals=0,
        ),
    )(words0p, words1p)

    shift = pack_s.bit_length() - 1
    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    mrf = mrf.reshape(hpad, w0pad)[:h, :w0]
    if engine == "i8":
        mask = jnp.int32(pack_s - 1)
        first0 = mf & mask
        cost0 = (mf >> shift) + pop0
        rc0 = mrf & mask
        if no_dupes:
            ml = ml.reshape(hpad, w0pad)[:h, :w0]
            last0 = (pack_s - 1) - (ml & mask)
            mrl = mrl.reshape(hpad, w0pad)[:h, :w0]
            rc0_last = (pack_s - 1) - (mrl & mask)
        else:
            last0 = None
            rc0_last = None
        return (cost0, first0, last0), (None, rc0, rc0_last)
    sf = jnp.floor(mf / pack_s)
    first0 = (mf - sf * pack_s).astype(jnp.int32)
    cost0 = sf.astype(jnp.int32) + pop0
    sr = jnp.floor(mrf / pack_s)
    rc0 = (mrf - sr * pack_s).astype(jnp.int32)
    if no_dupes:
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
        sl = jnp.floor(ml / pack_s)
        last0 = (pack_s - 1) - (ml - sl * pack_s).astype(jnp.int32)
        mrl = mrl.reshape(hpad, w0pad)[:h, :w0]
        srl = jnp.floor(mrl / pack_s)
        rc0_last = (pack_s - 1) - (mrl - srl * pack_s).astype(jnp.int32)
    else:
        last0 = None
        rc0_last = None
    return (cost0, first0, last0), (None, rc0, rc0_last)


def _prep_stack_operands(stack0, stack1, tile_i: int, tile_j: int):
    """(n, H, W) stacks -> row-major (H, n, Wpad) operands for the fused
    kernels (sample axis on sublanes, pixels on lanes — the layout both the
    compare-matrix contractions and the DMA want)."""
    st0 = jnp.transpose(stack0, (1, 0, 2))
    st1 = jnp.transpose(stack1, (1, 0, 2))
    st0 = _pad_axis(st0, 2, tile_i)
    st1 = _pad_axis(st1, 2, max(tile_j, UNPACK_SEG))
    return st0, st1


def _padded_coeffs(n: int, mode, bpad: int):
    import numpy as np

    from ..descriptor import compare_coeffs

    cx, cy = compare_coeffs(n, mode)
    nbits = cx.shape[0]
    cxp = np.zeros((bpad, n), np.int32)
    cyp = np.zeros((bpad, n), np.int32)
    cxp[:nbits] = cx
    cyp[:nbits] = cy
    return cxp, cyp, nbits


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "need_last", "tile_i", "tile_j", "interpret", "engine",
        "reduce", "rows", "pack_s", "bases",
    ),
)
def _row_minima_stack(
    stack0,
    stack1,
    *,
    mode,
    need_last: bool,
    tile_i: int,
    tile_j: int,
    interpret: bool,
    engine: str,
    reduce: bool,
    rows: int = 1,
    pack_s: int = PACK_S,
    bases: tuple = (),
):
    from ..config import actual_bits

    n, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    nbits = actual_bits(n, mode)
    if engine == "i8":
        bpad = max(128, ((nbits + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _minima_kernel_i8_stack, jnp.int8, jnp.int32,
        )
    else:
        bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _minima_kernel_bf16_stack, jnp.bfloat16, jnp.float32,
        )
    cxp, cyp, _ = _padded_coeffs(n, mode, bpad)
    u16 = stack0.dtype == jnp.uint16

    st0, st1 = _prep_stack_operands(stack0, stack1, tile_i, tile_j)
    rb = max(1, min(rows, h))
    st0 = _pad_axis(st0, 0, rb)
    st1 = _pad_axis(st1, 0, rb)
    hpad = st0.shape[0]
    w0pad, w1pad = st0.shape[2], st1.shape[2]
    ni = w0pad // tile_i
    if tile_j == 0:
        # Full-row chunk: one (TILE_I, BPAD) @ (BPAD, W1PAD) contraction
        # per row tile (maximum N per MXU issue).
        tile_j = w1pad

    # Agree-stage dynamic-window bases as a third kernel output (bf16
    # NoDuplicates only — the eligibility gate lives in search.py).
    emit_bases = bool(bases) and engine != "i8" and need_last \
        and tile_i % bases[0] == 0 if bases else False
    kernel = functools.partial(
        kernel_fn,
        nbits=nbits,
        w1=w1,
        w1pad=w1pad,
        tile_j=tile_j,
        need_last=need_last,
        reduce=reduce,
        u16=u16,
        pack_s=pack_s,
        **({"bases": bases, "w0": w0} if emit_bases else {}),
    )

    cxj = jnp.asarray(cxp, jnp.bfloat16)
    cyj = jnp.asarray(cyp, jnp.bfloat16)
    grid = (hpad // rb, ni)
    out_specs = [
        pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype),
        jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype),
    ]
    if emit_bases:
        out_specs.append(
            pl.BlockSpec((rb, 128), lambda r, i: (r, i),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((hpad, ni * 128), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, tile_i), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, w1pad), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((rb, bpad, w1pad), b_dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * hpad * w0pad * w1pad * bpad * (2 if need_last else 1),
            bytes_accessed=hpad * (w0pad + w1pad) * n + hpad * w0pad * 8,
            transcendentals=0,
        ),
    )(cxj, cyj, st0, st1)
    if emit_bases:
        mf, ml, braw = outs
        # Lanes [0, tile_i/bchunk) of each tile's 128-lane block hold the
        # per-256-column bases; compact to (hpad, ni * tile_i / bchunk).
        nh = tile_i // bases[0]
        braw = braw.reshape(hpad, ni, 128)[:, :, :nh].reshape(hpad, ni * nh)
    else:
        mf, ml = outs
        braw = None

    # No cost surface: the fused path never materializes pop(a), and no
    # production consumer needs the raw Hamming cost (search.py uses only
    # the argmin columns).
    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    if engine == "i8":
        first = mf & jnp.int32(pack_s - 1)
        if need_last:
            ml = ml.reshape(hpad, w0pad)[:h, :w0]
            last = (pack_s - 1) - (ml & jnp.int32(pack_s - 1))
        else:
            last = None
        return None, first, last, braw
    sf = jnp.floor(mf / pack_s)
    first = (mf - sf * pack_s).astype(jnp.int32)
    if need_last:
        ml = ml.reshape(hpad, w0pad)[:h, :w0]
        sl = jnp.floor(ml / pack_s)
        last = (pack_s - 1) - (ml - sl * pack_s).astype(jnp.int32)
    else:
        last = None
    return None, first, last, braw


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "no_dupes", "tile_i", "tile_j", "interpret", "engine",
        "rows", "pack_s",
    ),
)
def _row_minima_consistency_stack(
    stack0,
    stack1,
    *,
    mode,
    no_dupes: bool,
    tile_i: int,
    tile_j: int,
    interpret: bool,
    engine: str,
    rows: int = 1,
    pack_s: int = PACK_S,
):
    from ..config import actual_bits

    n, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    nbits = actual_bits(n, mode)
    if engine == "i8":
        bpad = max(128, ((nbits + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _consistency_kernel_i8_stack, jnp.int8, jnp.int32,
        )
    else:
        bpad = max(128, ((nbits + 2 + 127) // 128) * 128)
        kernel_fn, b_dtype, out_dtype = (
            _consistency_kernel_bf16_stack, jnp.bfloat16, jnp.float32,
        )
    cxp, cyp, _ = _padded_coeffs(n, mode, bpad)
    u16 = stack0.dtype == jnp.uint16

    st0, st1 = _prep_stack_operands(stack0, stack1, tile_i, tile_j)
    rb = max(1, min(rows, h))
    st0 = _pad_axis(st0, 0, rb)
    st1 = _pad_axis(st1, 0, rb)
    hpad = st0.shape[0]
    w0pad, w1pad = st0.shape[2], st1.shape[2]
    ni = w0pad // tile_i

    kernel = functools.partial(
        kernel_fn,
        nbits=nbits,
        w0=w0,
        w1=w1,
        w1pad=w1pad,
        tile_j=tile_j,
        tile_i=tile_i,
        no_dupes=no_dupes,
        u16=u16,
        pack_s=pack_s,
    )

    cxj = jnp.asarray(cxp, jnp.bfloat16)
    cyj = jnp.asarray(cyp, jnp.bfloat16)
    grid = (hpad // rb, ni)
    mf, ml, mrf, mrl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpad, n), lambda r, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, tile_i), lambda r, i: (r, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n, w1pad), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((rb, ni, tile_i), lambda r, i: (r, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((hpad, ni, tile_i), out_dtype)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, bpad, w1pad), b_dtype),
            pltpu.VMEM((max(8, 2 * rb), w1pad), out_dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * hpad * w0pad * w1pad * bpad,
            bytes_accessed=hpad * (w0pad + w1pad) * n
            + hpad * (w0pad + w1pad) * 8,
            transcendentals=0,
        ),
    )(cxj, cyj, st0, st1)

    mf = mf.reshape(hpad, w0pad)[:h, :w0]
    mrf = mrf.reshape(hpad, w0pad)[:h, :w0]
    if engine == "i8":
        mask = jnp.int32(pack_s - 1)
        first0 = mf & mask
        rc0 = mrf & mask
        if no_dupes:
            ml = ml.reshape(hpad, w0pad)[:h, :w0]
            last0 = (pack_s - 1) - (ml & mask)
            mrl = mrl.reshape(hpad, w0pad)[:h, :w0]
            rc0_last = (pack_s - 1) - (mrl & mask)
        else:
            last0 = None
            rc0_last = None
        return (None, first0, last0), (None, rc0, rc0_last)

    def dec_first(m):
        s = jnp.floor(m / pack_s)
        return (m - s * pack_s).astype(jnp.int32)

    def dec_last(m):
        s = jnp.floor(m / pack_s)
        return (pack_s - 1) - (m - s * pack_s).astype(jnp.int32)

    first0 = dec_first(mf)
    rc0 = dec_first(mrf)
    if no_dupes:
        last0 = dec_last(ml.reshape(hpad, w0pad)[:h, :w0])
        rc0_last = dec_last(mrl.reshape(hpad, w0pad)[:h, :w0])
    else:
        last0 = None
        rc0_last = None
    return (None, first0, last0), (None, rc0, rc0_last)


def row_minima_stack(
    stack0,
    stack1,
    *,
    mode,
    need_last: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
    reduce: bool | None = None,
    rows: int | None = None,
    bases: tuple = (),
):
    """Fused transform+search surface: raw (n, H, W) u8/u16 stacks in,
    packed-argmin columns out. Raises ValueError for LIMITED n<4 (constant
    descriptor bit — see :func:`..descriptor.compare_coeffs`); callers
    fall back to the words path. ``rows`` (default ``BICOS_SEARCH_ROWS``)
    batches image rows per grid step.

    ``bases=(chunk, wcap, wp)`` additionally emits the agree stage's
    dynamic-window bases from the kernel epilogue (bf16 engine,
    ``tile_i % chunk == 0`` only; see ``_minima_kernel_bf16_stack``) and
    returns a 4-tuple ``(cost, first, last, bases_(h_pad, >=wp/chunk))`` —
    the bases array is padded on both axes; callers slice."""
    _, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    pack_s, _ = pack_for_width(max(w0, w1))
    if rows is None:
        rows = SEARCH_ROWS if pack_s == PACK_S else min(SEARCH_ROWS, 4)
    if tile_j == 0:
        tile_i = min(tile_i, max(128, ((w0 + 127) // 128) * 128))
    else:
        tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    out = _row_minima_stack(
        stack0,
        stack1,
        mode=mode,
        need_last=need_last,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine or DEFAULT_ENGINE,
        reduce=DEFAULT_REDUCE if reduce is None else reduce,
        rows=rows,
        pack_s=pack_s,
        bases=bases,
    )
    return out if bases else out[:3]


def row_minima_consistency_stack(
    stack0,
    stack1,
    *,
    mode,
    no_dupes: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
    rows: int | None = None,
):
    """Fused transform + Consistency-search surface (raw stacks in).
    ``rows`` (default ``BICOS_CONS_ROWS``) batches image rows per grid
    step."""
    _, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    pack_s, _ = pack_for_width(max(w0, w1))
    if rows is None:
        rows = CONS_ROWS if pack_s == PACK_S else min(CONS_ROWS, 2)
    tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    return _row_minima_consistency_stack(
        stack0,
        stack1,
        mode=mode,
        no_dupes=no_dupes,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine or DEFAULT_ENGINE,
        rows=rows,
        pack_s=pack_s,
    )


def _snap_tiles(w0: int, w1: int, tile_i: int, tile_j: int):
    """tile_j must divide the padded width (a multiple of UNPACK_SEG), so it
    is snapped to a power of two in [128, UNPACK_SEG]."""
    want_j = min(tile_j, max(128, ((w1 + 127) // 128) * 128), UNPACK_SEG)
    tj = 128
    while tj * 2 <= want_j:
        tj *= 2
    ti = min(tile_i, max(128, ((w0 + 127) // 128) * 128))
    return ti, tj


def _pop_from_words(words):
    return jnp.sum(
        jax.lax.population_count(words).astype(jnp.int32), axis=-1
    )


def row_minima_consistency_words(
    words0,
    words1,
    *,
    nbits: int,
    no_dupes: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
    rows: int | None = None,
):
    """Packed-words surface of the fused Consistency kernel. ``rows``
    (default ``BICOS_CONS_ROWS``) batches image rows per grid step."""
    h, w0, _ = words0.shape
    w1 = words1.shape[1]
    # Ultra-wide rows (>= 8192) use the 16384 packing — still exact f32
    # integers (see the PACK_S note); rows capped to bound the wider VMEM
    # scratch.
    pack_s, _ = pack_for_width(max(w0, w1))
    if rows is None:
        rows = CONS_ROWS if pack_s == PACK_S else min(CONS_ROWS, 2)
    tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    return _row_minima_consistency_words(
        words0,
        words1,
        _pop_from_words(words0),
        nbits=nbits,
        no_dupes=no_dupes,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine or DEFAULT_ENGINE,
        rows=rows,
        pack_s=pack_s,
    )


def row_minima_consistency_pallas(
    bits0,
    bits1,
    no_dupes: bool,
    *,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
):
    """Fused forward+reverse minima for the Consistency variant: one sweep of
    the cost matrix yields, per row, the left->right (cost, first[, last])
    minima AND the right->left minima already looked up at each left
    pixel's forward argmin column (the ``take_along_axis`` the decode would
    otherwise need costs ~150 ms at full resolution on TPU; the kernel's
    one-hot lookup is ~10x cheaper) — ~1.8x over two plain passes.

    Returns ``((cost0, first0, last0), (None, rc0, rc0_last))`` where
    ``rc0[h, c0]`` is the reverse first-argmin at column ``first0[h, c0]``
    and ``rc0_last`` its last-argmin twin; ``last`` entries are None unless
    ``no_dupes``.
    """
    from ..descriptor import pack_bits

    nbits = bits0.shape[-1]
    return row_minima_consistency_words(
        pack_bits(bits0),
        pack_bits(bits1),
        nbits=nbits,
        no_dupes=no_dupes,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine,
    )


def row_minima_pallas_words(
    words0,
    words1,
    *,
    nbits: int,
    need_last: bool,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
    reduce: bool | None = None,
    rows: int | None = None,
):
    """Packed-words surface of the Hamming-scan kernel (production path).
    ``rows`` (default ``BICOS_SEARCH_ROWS``) batches image rows per grid
    step."""
    h, w0, _ = words0.shape
    w1 = words1.shape[1]
    # Ultra-wide rows (>= 8192) use the 16384 packing — still exact f32
    # integers (see the PACK_S note); rows capped to bound the wider VMEM
    # scratch.
    pack_s, _ = pack_for_width(max(w0, w1))
    if rows is None:
        rows = SEARCH_ROWS if pack_s == PACK_S else min(SEARCH_ROWS, 4)
    tile_i, tile_j = _snap_tiles(w0, w1, tile_i, tile_j)
    return _row_minima_words(
        words0,
        words1,
        _pop_from_words(words0),
        nbits=nbits,
        need_last=need_last,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine or DEFAULT_ENGINE,
        reduce=DEFAULT_REDUCE if reduce is None else reduce,
        rows=rows,
        pack_s=pack_s,
    )


def row_minima_pallas(
    bits0,
    bits1,
    need_last: bool,
    *,
    tile_i: int = DEF_TILE_I,
    tile_j: int = DEF_TILE_J,
    interpret: bool = False,
    engine: str | None = None,
    reduce: bool | None = None,
):
    """Drop-in Pallas analogue of :func:`..search.row_minima_xla`.

    Args:
      bits0: (H, W0, B) bool descriptor bit planes (query side).
      bits1: (H, W1, B) bool (database side).
      need_last: also compute last-occurrence argmin (NoDuplicates tie test).

    Returns:
      (cost, first, last): (H, W0) int32 minima of the Hamming scan;
      ``last`` is None when ``need_last`` is False.
    """
    from ..descriptor import pack_bits

    nbits = bits0.shape[-1]
    return row_minima_pallas_words(
        pack_bits(bits0),
        pack_bits(bits1),
        nbits=nbits,
        need_last=need_last,
        tile_i=tile_i,
        tile_j=tile_j,
        interpret=interpret,
        engine=engine,
        reduce=reduce,
    )
