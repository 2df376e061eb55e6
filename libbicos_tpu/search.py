"""Binary correspondence search: per-row Hamming-distance argmin.

Reference semantics (``bicos.hpp:50-113``): for every pixel of the left image,
scan the *entire* right epipolar row, take the argmin of the Hamming distance
between descriptors (first occurrence), then

* NoDuplicates: invalidate if the minimum is not unique (``bicos.hpp:63-73``);
* Consistency: re-search from the best right column back into the left row and
  accept iff ``|col0 - reverse_col0| <= max_lr_diff``; disparity becomes
  ``(col0 + reverse_col0) // 2 - best_col1`` (``bicos.hpp:99-107``).

TPU-first design
----------------
The serial scan becomes a *reduction over a cost matrix*. Two ideas:

1. **Packed argmin**: reduce ``K*cost + col1`` with a plain ``min`` to get
   (min cost, first argmin) in one pass, and ``K*cost + (W-1-col1)`` to get the
   last argmin. The min is unique iff first == last — this replaces the
   reference's duplicate counter with two cheap min-reductions that tile and
   shard trivially. K = 32768 keeps every packed value an exact int below
   2^24, so the fast path can run the reduction in float32 straight out of the
   MXU.

2. **Hamming-as-matmul** (fast path, ``kernels/hamming.py``): for 0/1 bit
   planes, ``ham(a, b) = pop(a) + pop(b) - 2 a.b``, so the W x W cost matrix of
   a row is a ``(W, B) @ (B, W)`` matmul on the MXU.

The consistency variant's reverse search is the transpose of the same cost
matrix; we evaluate it as a second pass with the operands swapped, which —
unlike the reference, which re-scans per pixel (``bicos.hpp:100-101``) —
computes each reverse argmin exactly once per column.

This module holds the always-correct XLA fallback (integer XOR+popcount on
packed uint32 lanes) plus the variant/decode logic shared with the Pallas
fast path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import Consistency, NoDuplicates, SearchVariant
from .descriptor import pack_bits, popcounts

INVALID_I16 = jnp.int16(-32768)

# Packing constant: packed = K * cost + col. cost <= 256 and col < K, so
# packed <= 2^23 + 2^15 < 2^24: exact in f32 and comfortably inside int32.
PACK_K = 32768


def decode_packed_minima(mf, ml, w1: int, need_last: bool,
                         pack_k: int = PACK_K):
    """Decode the packings ``mf = cost*pack_k + col`` and
    ``ml = cost*pack_k + (w1-1-col)`` into ``(cost, first, last-or-None)``.

    Single decode shared by the XLA row scan here and the W-band ring
    (``sharding._ring_minima`` / ``row_minima_wband``) so the encode and
    decode rules cannot drift apart."""
    cost = mf // pack_k
    first = mf - cost * pack_k
    if need_last:
        last = (w1 - 1) - (ml - (ml // pack_k) * pack_k)
    else:
        last = None
    return cost, first, last


def _row_chunk_minima(w0, w1, need_last: bool, pack_k: int = PACK_K,
                      drange=None):
    """Minima for one chunk of rows via direct XOR+popcount (int32 exact).

    w0: (R, W0, nw) uint32, w1: (R, W1, nw) uint32.
    Returns (mf, ml): packed minima (R, W0) int32; ml is None-like zeros if
    ``need_last`` is False. ``drange=(dmin, dmax)`` penalizes candidates
    whose disparity ``col0 - col1`` falls outside the inclusive range
    (the ``Config.disparity_range`` extension) — a pixel with no in-range
    candidate keeps the penalty in its packing, which the decode turns
    into the invalid sentinel.
    """
    r, wid0, nw = w0.shape
    wid1 = w1.shape[1]
    cost = None
    for k in range(nw):
        x = w0[:, :, None, k] ^ w1[:, None, :, k]
        p = jax.lax.population_count(x).astype(jnp.int32)
        cost = p if cost is None else cost + p
    col = jnp.arange(wid1, dtype=jnp.int32)
    pf = cost * pack_k + col[None, None, :]
    if need_last:
        pl_ = cost * pack_k + (wid1 - 1 - col)[None, None, :]
    if drange is not None:
        dmin, dmax = drange
        dm = (jnp.arange(wid0, dtype=jnp.int32)[None, :, None]
              - col[None, None, :])
        # where-replace (not add): the decoded cost of an all-penalized
        # pixel must exceed any true cost (<= 256) for EVERY pack width
        # up to the 2^22 ultra-wide packing.
        bad = (dm < dmin) | (dm > dmax)
        big = jnp.int32(0x7F000000)
        pf = jnp.where(bad, big, pf)
        if need_last:
            pl_ = jnp.where(bad, big, pl_)
    mf = jnp.min(pf, axis=2)
    if need_last:
        ml = jnp.min(pl_, axis=2)
    else:
        ml = jnp.zeros_like(mf)
    return mf, ml


# Column-chunk width for very wide rows: bounds the materialized cost slab
# to (row_chunk, W0, COL_CHUNK) int32 regardless of the image width.
COL_CHUNK = 8192


def _row_chunk_minima_cols(w0, w1, need_last: bool, pack_k: int,
                           drange=None):
    """Column-chunked :func:`_row_chunk_minima` for unbounded image widths.

    The reference's CPU scan walks any width with O(1) state
    (bicos.hpp:54); this is its XLA equivalent — a ``lax.scan`` over
    COL_CHUNK column slabs folding a running packed minimum, so memory
    stays O(R * W0 * COL_CHUNK) while the packing widens to the next power
    of two >= W1 (exact in int32 for widths up to 2^22 at 256 bits).
    """
    r, wid0, nw = w0.shape
    wid1 = w1.shape[1]
    ncc = -(-wid1 // COL_CHUNK)
    padc = ncc * COL_CHUNK - wid1
    w1p = jnp.pad(w1, ((0, 0), (0, padc), (0, 0)))
    w1cc = jnp.moveaxis(w1p.reshape(r, ncc, COL_CHUNK, nw), 1, 0)
    # > any real packing at every pack width (decoded cost > 256); only
    # decoded when a range leaves a pixel without candidates.
    big = jnp.int32(0x7F000000)

    def step(carry, args):
        w1c, base = args
        cost = None
        for k in range(nw):
            x = w0[:, :, None, k] ^ w1c[:, None, :, k]
            p = jax.lax.population_count(x).astype(jnp.int32)
            cost = p if cost is None else cost + p
        col = base + jnp.arange(COL_CHUNK, dtype=jnp.int32)
        ok = (col < wid1)[None, None, :]
        if drange is not None:
            dmin, dmax = drange
            dm = (jnp.arange(wid0, dtype=jnp.int32)[None, :, None]
                  - col[None, None, :])
            ok = ok & (dm >= dmin) & (dm <= dmax)
        pf = jnp.where(ok, cost * pack_k + col[None, None, :], big)
        mf = jnp.minimum(carry[0], jnp.min(pf, axis=2))
        if need_last:
            pl_ = jnp.where(
                ok, cost * pack_k + (wid1 - 1 - col)[None, None, :], big)
            ml = jnp.minimum(carry[1], jnp.min(pl_, axis=2))
        else:
            ml = carry[1]
        return (mf, ml), None

    init = (jnp.full((r, wid0), big, jnp.int32),
            jnp.full((r, wid0), big, jnp.int32))
    bases = jnp.arange(ncc, dtype=jnp.int32) * COL_CHUNK
    (mf, ml), _ = jax.lax.scan(step, init, (w1cc, bases))
    if not need_last:
        ml = jnp.zeros_like(mf)
    return mf, ml


def row_minima_xla(
    bits0, bits1, need_last: bool, row_chunk: int = 8, drange=None
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Bit-plane wrapper over :func:`row_minima_xla_words` (tests/oracle
    surface; the pipeline passes packed words directly)."""
    return row_minima_xla_words(
        pack_bits(bits0), pack_bits(bits1), need_last, row_chunk,
        drange=drange,
    )


def row_minima_xla_words(
    words0, words1, need_last: bool, row_chunk: int = 8, drange=None
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Forward search minima of every left pixel against its full right row.

    Args:
      words0: (H, W0, nw) uint32 packed descriptors (left/query side).
      words1: (H, W1, nw) uint32 (right/database side).
      need_last: also compute the last-occurrence argmin (for NoDuplicates).
      drange: optional inclusive (dmin, dmax) disparity-range restriction
        (``Config.disparity_range``); pixels without an in-range candidate
        decode to ``first = -1, last = -2`` (never equal, never a column).

    Returns:
      cost  (H, W0) int32 — minimum Hamming cost,
      first (H, W0) int32 — first column attaining it,
      last  (H, W0) int32 or None — last column attaining it.
    """
    h, w0, _ = words0.shape
    w1 = words1.shape[1]
    if w1 <= PACK_K:
        pack_k = PACK_K
    else:
        # Unbounded-width support (reference scans any width,
        # bicos.hpp:54): widen the packing to the next power of two and
        # fold column slabs sequentially. cost*pack_k + col stays exact in
        # int32 up to pack_k = 2^22 (cost <= 256 bits).
        pack_k = 1 << (w1 - 1).bit_length()
        if pack_k > 1 << 22:
            raise ValueError(
                f"image width {w1} > {1 << 22} overflows the int32 "
                "cost-packing")

    col_chunked = w1 > 2 * COL_CHUNK
    if col_chunked:
        # Bound the (row_chunk, W0, COL_CHUNK) int32 cost slab to ~1 GiB.
        row_chunk = max(
            1, min(row_chunk, (1 << 28) // max(1, w0 * COL_CHUNK)))
    pad = (-h) % row_chunk
    if pad:
        words0 = jnp.pad(words0, ((0, pad), (0, 0), (0, 0)))
        words1 = jnp.pad(words1, ((0, pad), (0, 0), (0, 0)))
    nchunk = words0.shape[0] // row_chunk
    w0c = words0.reshape(nchunk, row_chunk, w0, words0.shape[-1])
    w1c = words1.reshape(nchunk, row_chunk, w1, words1.shape[-1])
    fn = _row_chunk_minima_cols if col_chunked else _row_chunk_minima
    mf, ml = jax.lax.map(
        lambda args: fn(args[0], args[1], need_last, pack_k, drange),
        (w0c, w1c),
    )
    mf = mf.reshape(-1, w0)[:h]
    ml = ml.reshape(-1, w0)[:h]
    cost, first, last = decode_packed_minima(mf, ml, w1, need_last, pack_k)
    if drange is not None:
        # No in-range candidate: the penalty survived the min. Sentinels
        # -1/-2 are never equal and never a real column, so every variant
        # decode naturally invalidates (plus the explicit >= 0 guards).
        none = cost > 256
        first = jnp.where(none, jnp.int32(-1), first)
        if need_last:
            last = jnp.where(none, jnp.int32(-2), last)
    return cost, first, last


def _row_minima_w(words0, words1, nbits, need_last: bool, backend: str,
                  drange=None):
    if drange is not None:
        # Disparity-range restriction: the words kernels have no range
        # masking — the masked XLA scan is the correct path (the FAST
        # ranged path is the fused stack kernel, search_stack).
        backend = "xla"
    if backend in ("pallas", "pallas_interpret"):
        from .kernels.hamming import row_minima_pallas_words

        return row_minima_pallas_words(
            words0, words1, nbits=nbits, need_last=need_last,
            interpret=(backend == "pallas_interpret"),
        )
    return row_minima_xla_words(words0, words1, need_last, drange=drange)


def resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    platform = jax.devices()[0].platform
    return "pallas" if platform == "tpu" else "xla"


def search(bits0, bits1, variant: SearchVariant, backend: str = "auto"):
    """Full correspondence search -> (H, W0) int16 disparity.

    Bit-exact to the reference's integer disparity output (``bicos.hpp:78-113``
    with INVALID = -32768). Bit-plane surface; the pipeline calls
    :func:`search_words` with packed descriptors directly.
    """
    nbits = bits0.shape[-1]
    return search_words(
        pack_bits(bits0), pack_bits(bits1), nbits, variant, backend
    )


def _finish_nodupes(first, last, w0: int):
    col0 = jnp.arange(w0, dtype=jnp.int32)[None, :]
    # first >= 0 guards the disparity-range no-candidate sentinel (-1/-2);
    # always true for the unrestricted scan.
    valid = (first == last) & (first >= 0)
    disp = col0 - first
    return jnp.where(valid, disp, jnp.int32(INVALID_I16)).astype(jnp.int16)


def _finish_consistency(
    first0, last0, first1, last1, h: int, w0: int, w1: int,
    variant: Consistency,
):
    """Decode from per-right-column reverse minima (XLA path; the gathers
    are fine on CPU/GPU backends)."""
    bc1 = first0
    rc0 = jnp.take_along_axis(first1, bc1, axis=1)
    if variant.no_dupes:
        rvalid = first1 == last1
        rok = jnp.take_along_axis(rvalid, bc1, axis=1)
    else:
        rok = jnp.ones((h, w0), dtype=bool)
    return _finish_consistency_gathered(
        first0, last0, rc0, rok, h, w0, variant
    )


def _finish_consistency_gathered(
    first0, last0, rc0, rok, h: int, w0: int, variant: Consistency,
):
    """Decode from reverse minima already looked up at the forward argmin
    (the Pallas kernels do the lookup on-chip — element-wise gathers over
    the full image cost ~150 ms on TPU)."""
    col0 = jnp.arange(w0, dtype=jnp.int32)[None, :]
    valid = jnp.ones((h, w0), dtype=bool)
    if variant.no_dupes:
        valid = first0 == last0
    # >= 0 guards the disparity-range no-candidate sentinels (forward and
    # reverse); always true for the unrestricted scan.
    valid = (
        valid & rok & (first0 >= 0) & (rc0 >= 0)
        & (jnp.abs(col0 - rc0) <= jnp.int32(variant.max_lr_diff))
    )
    disp = (col0 + rc0) // 2 - first0
    return jnp.where(valid, disp, jnp.int32(INVALID_I16)).astype(jnp.int16)


def search_words(
    words0, words1, nbits: int, variant: SearchVariant,
    backend: str = "auto", drange=None,
):
    """Correspondence search on packed uint32 descriptor words.

    ``drange``: optional inclusive (dmin, dmax) disparity-range
    restriction (``Config.disparity_range``); routed through the masked
    XLA scan (the fast ranged path is the fused stack kernel)."""
    backend = resolve_backend(backend)
    h, w0, _ = words0.shape
    w1 = words1.shape[1]
    if backend in ("pallas", "pallas_interpret") and max(w0, w1) >= 16384:
        # The Pallas words kernels pack col into 13 bits (14 for ultra-wide
        # rows in [8192, 16384)); beyond that the XLA path packs into
        # PACK_K = 32768 and keeps working.
        backend = "xla"
    if drange is not None:
        backend = "xla"  # see _row_minima_w

    if isinstance(variant, NoDuplicates):
        _, first, last = _row_minima_w(
            words0, words1, nbits, True, backend, drange)
        return _finish_nodupes(first, last, w0)
    assert isinstance(variant, Consistency)
    nodupes = variant.no_dupes
    if backend in ("pallas", "pallas_interpret"):
        # Fused kernel: forward + reverse minima from ONE sweep of the
        # cost matrix, reverse values pre-gathered at the forward argmin
        # (kernels/hamming.py) — ~1.8x over two passes, no XLA gathers.
        from .kernels.hamming import row_minima_consistency_words

        (_, first0, last0), (_, rc0, rc0_last) = (
            row_minima_consistency_words(
                words0, words1, nbits=nbits, no_dupes=nodupes,
                interpret=(backend == "pallas_interpret"),
            )
        )
        rok = (rc0 == rc0_last if nodupes
               else jnp.ones((h, w0), dtype=bool))
        return _finish_consistency_gathered(
            first0, last0, rc0, rok, h, w0, variant
        )
    _, first0, last0 = _row_minima_w(
        words0, words1, nbits, nodupes, backend, drange)
    # Reverse search: query and candidate roles swap, so the range
    # reflects to (-dmax, -dmin).
    drange_rev = None if drange is None else (-drange[1], -drange[0])
    _, first1, last1 = _row_minima_w(
        words1, words0, nbits, nodupes, backend, drange_rev)
    if not nodupes:
        last0 = last1 = None
    return _finish_consistency(
        first0, last0, first1, last1, h, w0, w1, variant
    )


def fused_stack_search_ok(
    mode, n: int, backend: str, width: int
) -> bool:
    """Eligibility of the fused transform+search kernel: pallas backend, no
    constant descriptor bit (LIMITED n<4, see descriptor.compare_coeffs),
    and row width inside the kernel's column packing (13-bit, or 14-bit
    for ultra-wide rows in [8192, 16384))."""
    if backend not in ("pallas", "pallas_interpret"):
        return False
    if width >= 16384:
        return False
    from .config import TransformMode

    return not (mode == TransformMode.LIMITED and n < 4)


def search_stack_nodupes_with_bases(
    stack0, stack1, mode, *, chunk: int, wcap: int, wp: int,
    backend: str = "auto",
):
    """NoDuplicates fused search that ALSO returns the agree stage's
    dynamic-window bases, emitted from the search kernel's epilogue.

    Returns ``(disparity, bases)`` where ``bases`` is the
    ``kernels.agree._chunk_window_bases`` array (``(pad(H, 8), wp/chunk)``
    int32, base or -1 per (row, chunk)) — bit-equal by construction (the
    NoDuplicates keep mask is ``first == last`` and a kept pixel's matched
    column IS the first argmin) — or None when the fused kernel cannot
    emit them (non-pallas backend, snapped tiles, i8 engine, pack width).
    Why in-kernel: any implementation that computes these values from the
    decoded disparity BETWEEN the kernels measured +17 ms/frame on the
    fused pipeline (bench/logs/r3/probe_chained_compose_stale*.log);
    emitted from registers the kernel already holds, they are free.
    """
    n, h, w0 = stack0.shape
    backend = resolve_backend(backend)
    if not fused_stack_search_ok(mode, n, backend, max(w0, stack1.shape[2])):
        # Same transform-then-search fallback search_stack applies.
        return search_stack(
            stack0, stack1, mode, NoDuplicates(), backend=backend), None
    from .kernels.hamming import row_minima_stack

    _, first, last, braw = row_minima_stack(
        stack0, stack1, mode=mode, need_last=True,
        interpret=(backend == "pallas_interpret"),
        bases=(chunk, wcap, wp),
    )
    disp = _finish_nodupes(first, last, w0)
    if braw is None:
        return disp, None
    hp = h + ((-h) % 8)  # agree kernel ROW_BATCH padding
    nc = wp // chunk
    if braw.shape[0] != hp or braw.shape[1] < nc:
        return disp, None
    return disp, braw[:, :nc]


def search_stack(
    stack0, stack1, mode, variant: SearchVariant, backend: str = "auto",
    drange=None,
):
    """Correspondence search straight from raw (n, H, W) image stacks.

    On the Pallas backend this runs the FUSED transform+search kernel
    (descriptor bits computed on-chip from compare-coefficient MXU
    contractions, ``kernels/hamming.py``) — the separate descriptor pass
    and its packed-words HBM round-trip disappear. Other backends (or the
    LIMITED n<4 corner) fall back to transform-then-search with identical
    results.

    ``drange``: inclusive (dmin, dmax) disparity-range restriction
    (``Config.disparity_range``). On the Pallas backend both variants run
    range-specialized fused kernels (compile-time chunk skipping:
    O(W * range) instead of O(W^2)) — ``row_minima_stack_range`` for
    NoDuplicates, ``row_minima_consistency_stack_range`` for Consistency
    (± no_dupes). Combinations the fused path can't take (u16 byte-split
    corner, n<4 LIMITED, non-Pallas backends) route through the masked
    XLA scan — correct, not fast.
    """
    from .config import actual_bits
    from .descriptor import descriptor_words

    backend = resolve_backend(backend)
    n, h, w0 = stack0.shape
    w1 = stack1.shape[2]
    fused_ok = fused_stack_search_ok(mode, n, backend, max(w0, w1))
    if drange is not None and not fused_ok:
        return search_words(
            descriptor_words(stack0, mode, min_words=2),
            descriptor_words(stack1, mode, min_words=2),
            actual_bits(n, mode), variant, backend, drange=drange,
        )
    if drange is not None and isinstance(variant, Consistency):
        from .kernels.hamming import row_minima_consistency_stack_range

        (_, first0, last0), (_, rc0, rc0_last) = (
            row_minima_consistency_stack_range(
                stack0, stack1, mode=mode, no_dupes=variant.no_dupes,
                drange=drange,
                interpret=(backend == "pallas_interpret"),
            )
        )
        rok = (rc0 == rc0_last if variant.no_dupes
               else jnp.ones((h, w0), dtype=bool))
        return _finish_consistency_gathered(
            first0, last0, rc0, rok, h, w0, variant
        )
    if not fused_ok:
        nbits = actual_bits(n, mode)
        # min_words=2: single-word (H, W, 1) uint32 outputs provoke a
        # 128x-padded-layout HBM blow-up on TPU (see pipeline._match_impl).
        return search_words(
            descriptor_words(stack0, mode, min_words=2),
            descriptor_words(stack1, mode, min_words=2),
            nbits, variant, backend,
        )
    interpret = backend == "pallas_interpret"
    if isinstance(variant, NoDuplicates):
        if drange is not None:
            from .kernels.hamming import row_minima_stack_range

            _, first, last = row_minima_stack_range(
                stack0, stack1, mode=mode, drange=drange,
                interpret=interpret,
            )
            return _finish_nodupes(first, last, w0)
        from .kernels.hamming import row_minima_stack

        _, first, last = row_minima_stack(
            stack0, stack1, mode=mode, need_last=True, interpret=interpret
        )
        return _finish_nodupes(first, last, w0)
    assert isinstance(variant, Consistency)
    from .kernels.hamming import row_minima_consistency_stack

    (_, first0, last0), (_, rc0, rc0_last) = row_minima_consistency_stack(
        stack0, stack1, mode=mode, no_dupes=variant.no_dupes,
        interpret=interpret,
    )
    rok = (rc0 == rc0_last if variant.no_dupes
           else jnp.ones((h, w0), dtype=bool))
    return _finish_consistency_gathered(
        first0, last0, rc0, rok, h, w0, variant
    )
