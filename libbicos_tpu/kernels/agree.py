"""Pallas TPU kernel for the fused NXCORR "agree" stage.

TPU-native re-design of the reference's validation kernels
(``/root/reference/include/impl/cuda/agree.cuh:110-259``): recompute the
normalized cross-correlation between each matched pixel pair's temporal
series, optionally sweeping a subpixel parabola, and invalidate matches
below the threshold.

Why a kernel: the XLA formulation gathers the right-hand series with
``take_along_axis`` over HBM (three ~240M-element gathers for the subpixel
variant) and round-trips (n, H, W) float32 temporaries per sweep step —
measured ~1.8 s at 33x2200x3300. Here the whole stereo row pair lives in
VMEM, the matched series are gathered on-chip, and the x sweep runs out of
registers.

Gather strategy: Mosaic's lane shuffle (``tpu.dynamic_gather``) only spans a
single 128-lane vreg, so the row gather is hierarchical — for each 128-wide
output chunk, loop over the W/128 source blocks, shuffle within the block,
and select where the index's block id matches. One shuffle+select pair per
(output chunk x source block).

Exactness: NXCORR accumulations run as serial chains over the stack axis in
the reference's loop order and are free to contract into fused
multiply-adds — exactly the reference arithmetic (``__fma_rn``,
``agree.cuh:67-97``). Algebraic rewrites that genuinely change results are
barriered off (x/sqrt(y) -> x*rsqrt(y); division by n -> reciprocal
multiply). The subpixel interpolation reproduces round-half-even + C-style
modular casts to the input dtype (``agree.cuh:235``) and the
float32-accumulated x grid (``agree.cuh:168``). Expected parity vs the
(non-fma) oracle transcription: equal to within 1-2 ulps of NXCORR, with
identical validity decisions away from exact threshold ties — the
reference's own CPU and CUDA backends differ from each other in the same
way.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

ROW_BATCH = 8
CHUNK = int(_os.environ.get("BICOS_AGREE_CHUNK", "512"))
BLK = 128  # dynamic_gather span
# Subpixel x-values evaluated per fori iteration (see the sweep loop).
SWEEP_UNROLL = int(_os.environ.get("BICOS_SWEEP_UNROLL", "3"))
# MXU engine for the one-hot gather dots. Their contraction is K=WP (the
# padded image width, e.g. 3328) — deep enough for the int8 MXU path's 2x
# rate to materialize (unlike the search kernel's K=128 contractions, where
# int8 pairs nothing along K and measured ~bf16 rate). "i8" stores the
# series matrix as centered bytes (v - 128, exact to undo post-dot because
# each one-hot row has exactly one 1); "bf16" is the original engine.
AGREE_ENGINE = _os.environ.get("BICOS_AGREE_ENGINE", "bf16")
# Gather strategy for the matched right-hand series: "mxu" = one-hot MXU
# contraction (series matrix in VMEM, one (WP, CHUNK) x (128, WP) dot per
# chunk — cost is H*WP^2*128 MACs regardless of n); "shuffle" = hierarchical
# tpu.dynamic_gather per 128-lane block (VPU; cost scales with n and the
# number of gathered sections, so it could in principle win for the
# integer variant where only n of the 128 dot lanes are useful). Measured
# (v5e, n=33 integer variant at 2200x3300, 2026-08-18): mxu 68.7 ms vs
# shuffle 632 ms — the per-block shuffle+select chain is ~9x slower than
# even a 3/4-wasted MXU dot, so "auto" picks mxu whenever the series
# sections fit its 128 lanes; "shuffle" remains for n > 42 and diagnostics.
AGREE_GATHER = _os.environ.get("BICOS_AGREE_GATHER", "auto")

INVALID_I32 = -32768


def _gather_row(load_blk, bi, li, nblk: int):
    """Gather ``row[s, col1[s, j]]`` for one output chunk.

    load_blk(b) must return source block b as (8, BLK) f32 (sliced straight
    off the input ref — Mosaic has no dynamic_slice on values); bi/li:
    (8, CHUNK) block / lane indices. Returns (8, CHUNK) f32.
    """
    chunk = bi.shape[1]
    nsub = chunk // BLK
    outs = []
    for s in range(nsub):
        sl = slice(s * BLK, (s + 1) * BLK)
        bi_s = bi[:, sl]
        li_s = li[:, sl]

        def body(b, acc):
            g = jnp.take_along_axis(load_blk(b), li_s, axis=1)
            return jnp.where(bi_s == b, g, acc)

        acc = jax.lax.fori_loop(
            0, nblk, body, jnp.zeros((ROW_BATCH, BLK), jnp.float32)
        )
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _agree_kernel(
    xs_ref,  # (1, XSPAD) f32 in SMEM — subpixel x grid (unused if empty)
    disp_ref,  # (8, WP) i32
    s0_ref,  # (n, 8, WP) input dtype
    s1_ref,  # (n, 8, WP)
    out_ref,  # (8, WP) f32 — refined disparity, NaN invalid
    corr_ref,  # (8, WP) f32 — NXCORR, NaN where not computed
    bt_scratch,  # (128, WP) bf16 or None — MXU-gather series matrix
    gout_scratch,  # (8, CHUNK, 128) f32 or None — MXU-gather dot outputs
    *,
    n: int,
    w: int,
    wp: int,
    threshold: float,
    minvar: Optional[float],
    xs: tuple,  # () for the integer variant
    in_mod: int,  # modular mask for the input dtype (0xFF / 0xFFFF)
    mxu_gather: bool,
    interpret: bool,
):
    nblk = wp // BLK
    # Guard against XLA's value-changing algebraic rewrites in interpret
    # mode (division by a constant -> reciprocal multiply; x/sqrt(y) ->
    # x*rsqrt(y)). Mosaic lowers ops literally, and optimization_barrier has
    # no TPU-kernel lowering, so on hardware this is the identity.
    B = jax.lax.optimization_barrier if interpret else (lambda x: x)
    fn = B(jnp.float32(n))
    d = disp_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (ROW_BATCH, wp), 1)
    valid = d != INVALID_I32
    col1 = col - d
    inb = (col1 >= 0) & (col1 < w)
    keep = valid & inb
    col1c = jnp.clip(col1, 0, w - 1)
    border = (col1c == 0) | (col1c == w - 1)

    def nxcorr_serial(diff0, var0, series):
        """Serial-order NXCORR accumulation matching the oracle transcription
        (mult-then-add, two roundings per step; an optimization barrier stops
        the compiler from contracting the pattern into a single-rounding fma,
        which shifts results by 1 ulp and can flip threshold decisions).

        diff0: list of n (8, C) f32; series: list of n (8, C) f32.
        """
        m1 = jnp.zeros_like(series[0])
        for t in range(n):
            m1 = m1 + series[t]
        m1 = m1 / fn
        covar = jnp.zeros_like(m1)
        var1 = jnp.zeros_like(m1)
        for t in range(n):
            d1 = series[t] - m1
            # Free to contract into fma: that IS the reference arithmetic
            # (__fma_rn on CUDA, agree.cuh:67-97; gcc fp-contract on CPU).
            covar = diff0[t] * d1 + covar
            var1 = d1 * d1 + var1
        nxc = covar / B(jnp.sqrt(var0 * var1))
        if minvar is not None:
            bad = (var0 < jnp.float32(minvar)) | (var1 < jnp.float32(minvar))
            nxc = jnp.where(bad, jnp.float32(-1.0), nxc)
        return nxc

    # MXU one-hot gather, row-major schedule: the series matrix
    # ``bt_scratch`` depends only on the image row (and byte for u16), so it
    # is filled ONCE per row and reused across all column chunks — the
    # previous chunk-major order refilled it (wp/CHUNK)x per row, ~44 extra
    # (128, WP) fills + lane rotates per grid step.
    if mxu_gather:
        u16 = s1_ref.dtype == jnp.uint16
        i8e = bt_scratch.dtype == jnp.int8
        # Rows [3n, 128) of the series matrix are never written per-row and
        # their dot outputs never read — zero them once per grid step.
        bt_scratch[3 * n:128, :] = jnp.zeros(
            (128 - 3 * n, wp), bt_scratch.dtype)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (wp, CHUNK), 0)

        def cv(v32):
            # i8 engine: centered bytes (exact to undo post-dot); bf16
            # engine: bytes are bf16-exact (< 256).
            if i8e:
                return (v32 - 128).astype(jnp.int8)
            return v32.astype(jnp.float32).astype(jnp.bfloat16)

        for byte in range(2 if u16 else 1):
            for r in range(ROW_BATCH):
                # Series matrix for this image row: rows [0,n) the raw
                # series, [n,2n) shifted right (value at col-1), [2n,3n)
                # shifted left (value at col+1). Wrapped edge lanes only
                # reach border pixels, which take the integer fallback.
                for t in range(n):
                    row32 = s1_ref[t, r:r + 1, :].astype(jnp.int32)
                    if byte == 1:
                        row32 = row32 >> 8
                    elif u16:
                        row32 = row32 & jnp.int32(0xFF)
                    bt_scratch[t:t + 1, :] = cv(row32)
                    if xs:
                        # 32-bit lane rotates (narrow rotates don't
                        # lower); roll needs non-negative shifts:
                        # wp-1 == -1.
                        bt_scratch[n + t:n + t + 1, :] = cv(pltpu.roll(
                            row32, 1, axis=1))
                        bt_scratch[2 * n + t:2 * n + t + 1, :] = cv(
                            pltpu.roll(row32, wp - 1, axis=1))
                for oc in range(wp // CHUNK):
                    cs = slice(oc * CHUNK, (oc + 1) * CHUNK)
                    # One-hot built transposed, (WP, CHUNK): onehot_t[c, j]
                    # = (c == col1[j]) — avoids a (1, CHUNK) -> (CHUNK, 1)
                    # vector relayout. The dot contracts its sublane axis
                    # against the series matrix's lane axis:
                    # (WP, CHUNK) x (128, WP) -> (CHUNK, 128). Exact: each
                    # dot row has a single 1 against byte values (centered
                    # into int8 range for the i8 engine, +128 undone below);
                    # u16 recombines hi/lo contractions as 256*hi + lo.
                    # (The series-major orientation producing (128, CHUNK)
                    # directly measured 25% slower end-to-end: the sweep's
                    # per-shot middle-axis slices relayout worse than one
                    # chunk transpose.)
                    onehot = cidx == col1c[r:r + 1, cs]
                    if i8e:
                        g32 = jax.lax.dot_general(
                            onehot.astype(jnp.int8), bt_scratch[...],
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        g = (g32 + 128).astype(jnp.float32)
                    else:
                        onehot_t = jnp.where(
                            onehot, jnp.float32(1.0), jnp.float32(0.0)
                        ).astype(jnp.bfloat16)
                        g = jax.lax.dot_general(
                            onehot_t, bt_scratch[...],
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    if u16 and byte == 1:
                        gout_scratch[r, cs, :] = (
                            gout_scratch[r, cs, :] + g * jnp.float32(256.0)
                        )
                    else:
                        gout_scratch[r, cs, :] = g

    for oc in range(wp // CHUNK):
        cs = slice(oc * CHUNK, (oc + 1) * CHUNK)
        c1 = col1c[:, cs]
        i1 = c1
        i0 = jnp.maximum(c1 - 1, 0)
        i2 = jnp.minimum(c1 + 1, w - 1)

        # Left series + stats for this chunk (serial reference order).
        # Mosaic has no direct u8/u16 -> f32 cast; hop through int32.
        s0c = [s0_ref[t, :, cs].astype(jnp.int32).astype(jnp.float32)
               for t in range(n)]
        m0 = jnp.zeros((ROW_BATCH, CHUNK), jnp.float32)
        for t in range(n):
            m0 = m0 + s0c[t]
        m0 = m0 / fn
        diff0 = [s0c[t] - m0 for t in range(n)]
        var0 = jnp.zeros((ROW_BATCH, CHUNK), jnp.float32)
        for t in range(n):
            var0 = diff0[t] * diff0[t] + var0

        # Gather the matched right series (and neighbours when sweeping).
        y1 = []
        y0 = []
        y2 = []
        if mxu_gather:
            # (8, CHUNK, 128) -> (128, 8, CHUNK): per-shot full-slab layout
            # for the sweep (lane-major would waste 127/128 VPU lanes).
            tr = jnp.transpose(gout_scratch[:, cs, :], (2, 0, 1))
            y1 = [tr[t] for t in range(n)]
            if xs:
                y0 = [tr[n + t] for t in range(n)]
                y2 = [tr[2 * n + t] for t in range(n)]
        else:
            for t in range(n):
                def load_blk(b, t=t):
                    blk = s1_ref[t, :, pl.ds(b * BLK, BLK)]
                    return blk.astype(jnp.int32).astype(jnp.float32)

                y1.append(_gather_row(load_blk, i1 >> 7, i1 & 127, nblk))
                if xs:
                    y0.append(_gather_row(load_blk, i0 >> 7, i0 & 127, nblk))
                    y2.append(_gather_row(load_blk, i2 >> 7, i2 & 127, nblk))

        nxc_int = nxcorr_serial(diff0, var0, y1)

        if xs:
            pa = [jnp.float32(0.5) * (y0[t] - 2.0 * y1[t] + y2[t])
                  for t in range(n)]
            pb = [jnp.float32(0.5) * (y2[t] - y0[t]) for t in range(n)]
            # fori over the x grid (values streamed from SMEM), SWEEP_UNROLL
            # x-values per iteration: a fully unrolled len(xs) x n sweep
            # makes the Mosaic program too large to compile at n=33,
            # step=0.1, while one-x iterations fence MXU/VPU pipelining at
            # every step. The wrapper pads the grid to a multiple of
            # SWEEP_UNROLL with copies of the last x — re-evaluating an x
            # can never change the result (strict < keeps the first best).
            def sweep(jx, carry):
                best_nxc, best_x = carry
                for u in range(SWEEP_UNROLL):
                    xf = xs_ref[0, jx * SWEEP_UNROLL + u]
                    interp = []
                    for t in range(n):
                        # Evaluation order matches the reference expression
                        # a*x*x + b*x + c left-to-right ((a*x)*x,
                        # agree.hpp:170); a*(x*x) differs in the last ulp
                        # for non-power-of-two x.
                        v = jnp.round(
                            ((pa[t] * xf) * xf + pb[t] * xf) + y1[t])
                        # round-half-even + C-style modular cast
                        # (agree.cuh:235)
                        iv = v.astype(jnp.int32) & jnp.int32(in_mod)
                        interp.append(iv.astype(jnp.float32))
                    nxc = nxcorr_serial(diff0, var0, interp)
                    upd = best_nxc < nxc
                    best_nxc = jnp.where(upd, nxc, best_nxc)
                    best_x = jnp.where(upd, xf, best_x)
                return best_nxc, best_x

            best_nxc, best_x = jax.lax.fori_loop(
                0, len(xs) // SWEEP_UNROLL, sweep,
                (jnp.full((ROW_BATCH, CHUNK), -1.0, jnp.float32),
                 jnp.zeros((ROW_BATCH, CHUNK), jnp.float32)),
            )
            corr_val = jnp.where(border[:, cs], nxc_int, best_nxc)
            ret = jnp.where(
                border[:, cs],
                d[:, cs].astype(jnp.float32),
                d[:, cs].astype(jnp.float32) - best_x,
            )
        else:
            corr_val = nxc_int
            ret = d[:, cs].astype(jnp.float32)

        k = keep[:, cs]
        nan = jnp.float32(jnp.nan)
        corr_ref[:, cs] = jnp.where(k, corr_val, nan)
        final = k & ~(corr_val < jnp.float32(threshold))
        out_ref[:, cs] = jnp.where(final, ret, nan)


def _pad2(x, mult0, mult1, value=0):
    p0 = (-x.shape[-2]) % mult0
    p1 = (-x.shape[-1]) % mult1
    if p0 == 0 and p1 == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, p0), (0, p1)]
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "minvar", "xs", "interpret"),
)
def _agree_call(disp, stack0, stack1, *, threshold, minvar, xs, interpret):
    n, h, w = stack0.shape
    d32 = _pad2(disp.astype(jnp.int32), ROW_BATCH, CHUNK, value=INVALID_I32)
    s0 = _pad2(stack0, ROW_BATCH, CHUNK)
    s1 = _pad2(stack1, ROW_BATCH, CHUNK)
    hp, wp = d32.shape
    in_mod = 0xFFFF if stack0.dtype == jnp.uint16 else 0xFF
    # MXU one-hot gather needs the 3n series sections in 128 bf16-exact
    # byte lanes: n <= 42 (u16 runs two byte-split contractions). Larger
    # stacks use the shuffle fallback; BICOS_AGREE_GATHER=shuffle forces it.
    mxu_gather = bool(3 * n <= 128) and AGREE_GATHER != "shuffle"

    if xs:
        # Pad the grid to a SWEEP_UNROLL multiple with copies of the last x
        # (re-evaluation is a no-op under the strict < best update).
        xs = xs + (xs[-1],) * ((-len(xs)) % SWEEP_UNROLL)
    kernel = functools.partial(
        _agree_kernel,
        n=n, w=w, wp=wp,
        threshold=threshold, minvar=minvar, xs=xs, in_mod=in_mod,
        mxu_gather=mxu_gather,
        interpret=interpret,
    )
    xspad = max(8, len(xs))
    xs_arr = jnp.asarray(
        list(xs) + [0.0] * (xspad - len(xs)), dtype=jnp.float32
    ).reshape(1, xspad)
    out, corr = pl.pallas_call(
        kernel,
        grid=(hp // ROW_BATCH,),
        in_specs=[
            pl.BlockSpec((1, xspad), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BATCH, wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ROW_BATCH, wp), lambda r: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ROW_BATCH, wp), lambda r: (0, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_BATCH, wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BATCH, wp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (128, wp),
                jnp.int8 if AGREE_ENGINE == "i8" else jnp.bfloat16,
            ),
            pltpu.VMEM((ROW_BATCH, wp, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xs_arr, d32, s0, s1)
    return out[:h, :w], corr[:h, :w]


def agree_pallas(
    disp,
    stack0,
    stack1,
    threshold: float,
    step: Optional[float],
    minvar: Optional[float],
    *,
    interpret: bool = False,
):
    """Fused agree: returns (refined f32 disparity with NaN invalid, corrmap).

    ``step=None`` selects the integer variant (the caller converts back to
    int16 semantics); SINGLE precision only — DOUBLE falls back to the XLA
    path in the pipeline.
    """
    from ..agree import subpixel_xgrid

    xs = tuple(subpixel_xgrid(step)) if step is not None else ()
    return _agree_call(
        disp, stack0, stack1,
        threshold=float(threshold),
        minvar=None if minvar is None else float(minvar),
        xs=xs,
        interpret=interpret,
    )
