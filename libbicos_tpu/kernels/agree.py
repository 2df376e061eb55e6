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

Gather strategies (BICOS_AGREE_GATHER):

* ``mxu`` (u8-subpixel default via ``auto``): one full-width one-hot
  contraction ``(WP, CHUNK) x (128, WP)`` per chunk (K = padded image
  width; the 3n series sections ride the 128 output lanes), on the i8
  engine by default since r5 (53.9 vs 59.3 ms standalone chained at n=33
  2200x3300 — the deep K is where i8's K-pairing pays). Under
  ``Config.disparity_range`` the contraction runs COMPILE-TIME per-chunk
  static windows instead of full width (no branches, no bases operand —
  the structure the runtime dynamic window could never reach exactly;
  see BASELINE.md "The dynamic-window artifact"), and ``auto`` then
  prefers this path for the integer and u16 variants too (r5: the
  grouped window gather's extraction cost never shrank with the range).
* ``window`` (u16 and 42 < n <= 192 default): the gather is restructured as a
  *grouped* one-hot contraction. The wrapper pre-builds a windowed series
  matrix ``s1w[h, g, t*lanes + l] = s1[t, h, G*g + l]`` whose row ``g``
  holds, for every shot ``t``, the ``lanes``-wide column window starting at
  group ``g`` (``lanes = 2G`` for the subpixel variant so the window always
  contains ``col1-1..col1+1``; ``lanes = G`` for the integer variant). The
  per-pixel dot then selects one GROUP over a universe of ``W/G`` (instead
  of one column over ``W``), cutting the contraction K by ``G``x while the
  output N grows only to ``n*lanes`` — net MXU-flop reduction ~1.5x
  (subpixel) / ~2.6x (integer) at n=33, G=16. The exact column lands with an
  in-vreg ``take_along_axis`` per 128-lane slice (window lanes never cross a
  slice because ``lanes | 128``).
* ``shuffle``: hierarchical ``tpu.dynamic_gather`` per 128-lane block
  (VPU). Mandatory for n > 42 where 3n no longer fits the mxu path's 128
  lanes; measured 632 ms vs the mxu path's 68.7 ms at n=33, so it is
  otherwise a diagnostics knob.

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
way. All gather strategies produce bit-identical gathered series (each is
an exact selection), so the strategy knob can never change results.
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
# Left-pixel chunk per gather dot. 0 = auto per gather path (measured
# 2026-08-20, one v5e core, n=33 2200x3300): 256 for the full-width mxu
# gather under the dynamic window (72.2 ms vs 88 at 512 full-width — the
# smaller one-hot build/window pays twice), 512 for the window/shuffle
# paths and the full-width dot (768 measured ~11% worse, 1024 exceeds the
# kernel VMEM budget).
CHUNK = int(_os.environ.get("BICOS_AGREE_CHUNK", "0"))
BLK = 128  # dynamic_gather span
# Subpixel x-values evaluated per fori iteration (see the sweep loop).
SWEEP_UNROLL = int(_os.environ.get("BICOS_SWEEP_UNROLL", "3"))
# MXU engine for the one-hot gather dots. Their contraction is K=WP (the
# padded image width, e.g. 3328) — deep enough for the int8 MXU path's
# higher rate to materialize (unlike the search kernel's K=128
# contractions, where int8 pairs nothing along K and measured ~bf16 rate).
# "i8" stores the series matrix as centered bytes (v - 128, exact to undo
# post-dot because each one-hot row has exactly one 1); "bf16" is the
# original engine. "auto" (default since r5): i8 for the full-width /
# static-window mxu gather, bf16 for the window gather (extraction-bound —
# its dots are not the limiter). Measured (r5 chained, n=33 2200x3300
# subpixel): full-width standalone 53.9 i8 vs 59.3 bf16 — NOT the
# envelope's 1.47x because the stage is max(MXU dots, VPU sweep) and the
# sweep (~30 ms of reference-exact per-x rounding + serial-fma nxcorr,
# bit-compat floors) is exposed once the dots shrink.
AGREE_ENGINE = _os.environ.get("BICOS_AGREE_ENGINE", "auto")
# Gather strategy (see the module docstring): "auto" picks window ->
# mxu -> shuffle by eligibility; explicit values force one path.
AGREE_GATHER = _os.environ.get("BICOS_AGREE_GATHER", "auto")
# Column-group width for the windowed gather. K of the gather dot is
# WP/GROUP; the windows are 2*GROUP (subpixel) or GROUP (integer) lanes per
# shot, so GROUP trades dot depth against window lanes AND extraction
# slices. 0 = auto (8: measured best — 62.9 ms vs 72.5 at G=16 for the
# n=33 integer variant at 2200x3300; extraction VPU work scales with the
# window lanes, so the smallest group wins).
AGREE_GROUP = int(_os.environ.get("BICOS_AGREE_GROUP", "0"))
# Lane budget for the windowed series matrix (bounds the per-chunk gather
# scratch: ROW_BATCH * CHUNK * LANE_CAP * 4 bytes = ~25 MB at 1536).
WINDOW_LANE_CAP = 1536
# One-hot FOLD factor for the full-width mxu gather (r5). The gather's
# one-hot encode is O(WP x CHUNK) VPU compares+casts per chunk — ~26 ms a
# frame at 3300x2200, comparable to the dots themselves and imperfectly
# overlapped. Folding pairs F strided column blocks (q, q + WP/F, ...)
# into one one-hot row: the one-hot shrinks to (WP/F, CHUNK) (encode
# divided by F), the series matrix becomes (128*F, WP/F) — F CONTIGUOUS
# lane slices stacked on sublanes, no deinterleave — and the dot keeps an
# IDENTICAL MAC count (K/F by N*F); an (F-1)-select epilogue picks each
# pixel's block from the (CHUNK, 128*F) output. Exact for every engine:
# each folded one-hot row still holds exactly one 1 per pixel. F must
# divide WP (always: WP is a CHUNK multiple); K padding makes F=2 free at
# production widths (1664 = 13x128) while F=4 pads K 832->896 (+8% MXU).
# 0 = auto (F=2 for the full-width path; 1 elsewhere).
AGREE_FOLD = int(_os.environ.get("BICOS_AGREE_FOLD", "0"))
# Dynamic gather window (columns) for the full-width mxu gather: within one
# (row, CHUNK) chunk the matched columns col1 = col - d span at most
# CHUNK + local-disparity-range columns, so the one-hot contraction only
# needs a DYNWIN-column slice of the series matrix — K drops from the
# padded image width (e.g. 3328) to DYNWIN; chunks that don't fit fall
# back to the full-width dot in-kernel (base sentinel -1), bit-identical
# for every input. OFF BY DEFAULT since round 4: the round-3 numbers that
# made it the default (72.2 ms subpixel) came from standalone probes whose
# CONSTANT bases let the compiler fold the fallback branches away — with
# live bases the per-chunk branch structure costs ~31 ms/frame and the
# full-width dots win outright (see resolve_chunk_wcap). Set
# BICOS_AGREE_DYNWIN=640 (any multiple of 128; pairs with CHUNK=256) to
# re-enable; "auto"/0 = off.
_dw = _os.environ.get("BICOS_AGREE_DYNWIN", "auto")
AGREE_DYNWIN = None if _dw == "auto" else int(_dw)
# Where the dynamic-window bases are computed. "kernel": inside
# the Pallas kernel from the disparity block already in VMEM (per-chunk
# keep-masked min/max -> VMEM scratch -> one small DMA to SMEM per grid
# step -> scalar reads); the wrapper's bases operand becomes an inert
# constant. "host": the wrapper precomputes them with _chunk_window_bases
# and feeds them as a fresh SMEM operand — measured 2026-08-20 to add
# ~17 ms/frame to the fused pipeline (chained-probe bisect,
# bench/logs/r3/probe_chained_compose_stale.log: 105.7 ms with a
# loop-invariant bases operand vs 122.6 with the fresh one, while the
# bases arithmetic itself measures ~1 ms standalone — the cost is the
# freshly-produced operand, not the math). Both modes compute the SAME
# base values; results are bit-identical by construction either way.
AGREE_BASES = _os.environ.get("BICOS_AGREE_BASES", "host")
# TIMING-ONLY diagnostics for the dynamic-window cost structure (results
# are GARBAGE at chunks whose window doesn't fit — never enable outside a
# probe). "forcewin": drop the per-chunk pl.when fallback branch, always
# run the windowed dot with base clamped to >= 0 (keeps the runtime scalar
# read + dynamic slice). "staticwin": additionally replace the runtime base
# with the chunk-aligned static offset (no scalar read, no dynamic slice —
# the compiler sees compile-time windows, the configuration every
# constant-bases standalone probe accidentally measured).
AGREE_DIAG = _os.environ.get("BICOS_AGREE_DIAG", "")
# Windowed-gather control structure when the dynamic window is enabled.
# "branch" (default): per-chunk pl.when windowed/full-width pair — the
# best EXACT dynwin structure, though its ~31 ms/frame of lost Mosaic
# pipelining is why dynwin itself is off by default (the r3 "17 ms bases
# stall" was THIS: every constant-bases probe let the compiler fold the
# branches away, so the cost was misattributed to producing the bases
# operand). "deferred": branchless windowed dots + a per-row compacted
# repair loop — also exact, measured WORSE (130.7 vs 123.6: dynamic-bound
# loops serialize the encode/dot streams); kept as the documented design
# point for future static-window work (branch-free lower bounds: 92.6
# runtime-base / 89.4 static — AGREE_DIAG).
AGREE_WINDOW = _os.environ.get("BICOS_AGREE_WINDOW", "branch")

INVALID_I32 = -32768


def _window_layout(n: int, subpixel: bool, gsz: int):
    """(lanes-per-shot, padded lane count) of the windowed series matrix."""
    lanes = (2 * gsz) if subpixel else gsz
    lw = n * lanes
    lp = max(128, ((lw + 127) // 128) * 128)
    return lanes, lp


def _window_ok(n: int, subpixel: bool, gsz: int) -> bool:
    if gsz not in (8, 16, 32, 64):
        return False
    lanes, lp = _window_layout(n, subpixel, gsz)
    # Window lanes must stay inside one 128-lane slice for the in-vreg
    # extraction, and the scratch must fit the budget.
    return lanes <= 128 and 128 % lanes == 0 and lp <= WINDOW_LANE_CAP


def _resolve_gather(n: int, subpixel: bool, u16: bool = False):
    """Gather strategy for a stack size: ('window'|'mxu'|'shuffle', group).

    Measured on one v5e core (n=33, 2200x3300; artifact-free numbers —
    the r3 dynamic-window figures (72.2/56.9) are excluded, see
    resolve_chunk_wcap):

    * u8 subpixel: full-width mxu wins — 88 ms standalone vs window's 103
      at G=8 / 123 at G=16 (the windowed dot is ~1.5x smaller but its
      per-vreg extraction costs more than it saves at 2 * G lanes/shot);
    * u8 integer: the window gather wins at EVERY measured n — 62.9 ms at
      G=8 vs full-width mxu's 70.1 (n=33); n=8: 42.4 vs ~56; n=16: 41.7
      (2026-08-20) — its G lanes/shot extraction is half the subpixel
      cost and the dot is wp/G-deep;
    * u16 subpixel: the full-width mxu kernel FAILS TPU compilation at
      production widths (Mosaic VMEM estimate 215.68M of 128M for the
      byte-split gather scratch, 2026-08-20) — window, whose scratches are
      ~10x smaller, is the default;
    * past the mxu section budget (3n > 128) the window path replaces the
      ~9x-slower shuffle up to its lane cap (n <= 96 subpixel / 192
      integer at G=8).
    """
    group = AGREE_GROUP or 8
    # mxu section budget: subpixel needs the 3n y0/y1/y2 sections in the
    # 128 dot lanes; the integer variant only the n raw-series sections.
    sec_ok = (3 * n <= 128) if subpixel else (n <= 128)
    forced = AGREE_GATHER
    if forced == "shuffle":
        return "shuffle", group
    if forced == "window":
        if not _window_ok(n, subpixel, group):
            raise ValueError(
                f"BICOS_AGREE_GATHER=window unsupported for n={n} "
                f"(group={group})")
        return "window", group
    if forced == "mxu":
        return ("mxu" if sec_ok else "shuffle"), group
    # auto (see the measurements above): u16 always prefers the window
    # gather (its byte-split full-width mxu scratch fails TPU compilation
    # at production widths). Integer u8: since the r5 one-hot fold the
    # full-width mxu gather wins at large n (47.4 vs 57.45 chained at
    # n=33) — its dot cost is n-independent while the window extraction
    # scales with n lanes; the window still wins at small n (n=16: ~35
    # device-class vs mxu's flat ~47), crossover placed at n=24 (no
    # measurement between 16 and 33). Subpixel u8 prefers the window only
    # while its dot fits ONE 128-lane slice (n * lanes <= 128 — measured
    # n=8: 51.7 vs 60.1), then full-width mxu until the section budget.
    if u16 and _window_ok(n, subpixel, group):
        return "window", group
    if not u16 and not subpixel:
        if n > 24 and sec_ok:
            return "mxu", group
        if _window_ok(n, subpixel, group):
            return "window", group
    lanes = (2 * group) if subpixel else group
    if n * lanes <= 128 and _window_ok(n, subpixel, group):
        return "window", group
    if not u16 and sec_ok:
        return "mxu", group
    if _window_ok(n, subpixel, group):
        return "window", group
    return "shuffle", group


def _chunk_window_bases(d32, w: int, wp: int, wcap: int, chunk: int):
    """Per-(row, CHUNK-chunk) aligned dynamic-window base, or -1 sentinel.

    A chunk's window must contain every VALID matched column (col1 clipped
    to the row, exactly as the kernel computes it); invalid pixels gather
    zeros through an all-false one-hot column, which is fine — their NXCORR
    output is masked by ``keep`` before any write. The base is rounded down
    to a 128-lane boundary for the in-kernel dynamic slice and clamped so
    the window stays inside the padded row. Shifted sections (y0/y2) need
    no extra margin: they were rolled on the FULL row before slicing, so
    window lane ``l`` of section o1/o2 already holds the col1-1 / col1+1
    value (image-edge wraps only reach border pixels, which take the
    integer fallback — same as the full-width path)."""
    col = jnp.arange(wp, dtype=jnp.int32)[None, :]
    valid = d32 != INVALID_I32
    col1 = col - d32
    keep = valid & (col1 >= 0) & (col1 < w)
    col1c = jnp.clip(col1, 0, w - 1)
    nc = wp // chunk
    lom = jnp.where(keep, col1c, w - 1)
    him = jnp.where(keep, col1c, 0)
    # Per-chunk reduces as lane-axis slice reductions, NOT a
    # reshape(hp, nc, chunk).min(axis=2): the 3-D minor-axis reduce lowers
    # so badly on TPU that it alone added ~18 ms/frame to the fused
    # pipeline (chained-probe bisect 2026-08-20: 123.7 -> 105.7 ms with
    # this computation replaced by a precomputed operand of the same
    # values; bench/logs/r3/probe_chained_compose_stale2.log). The sliced
    # form emits plain (hp, chunk) lane reductions.
    lo = jnp.concatenate(
        [lom[:, oc * chunk:(oc + 1) * chunk].min(axis=1, keepdims=True)
         for oc in range(nc)], axis=1)
    hi = jnp.concatenate(
        [him[:, oc * chunk:(oc + 1) * chunk].max(axis=1, keepdims=True)
         for oc in range(nc)], axis=1)
    base = jnp.minimum(lo, wp - wcap) & ~jnp.int32(127)
    ok = hi <= base + (wcap - 1)
    return jnp.where(ok, base, jnp.int32(-1))


def _bases_kernel(d_ref, out_ref, *, w: int, wp: int, wcap: int, chunk: int):
    """Tiny Pallas kernel producing `_chunk_window_bases` values.

    Same integer arithmetic as the XLA formulation, but emitted as plain
    VMEM lane reductions: XLA's own lowering of the masked per-chunk
    min/max (lane-axis slice reduces over (H, WP) i32 through S(1)
    buffers) measured ~18 ms/frame inside the fused pipeline — the whole
    compose-probe gap (bench/logs/r3/probe_chained_compose_stale2.log:
    105.7 ms with these values precomputed vs 123.7 computing them in
    XLA). The kernel streams the disparity block once.
    """
    d = d_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (ROW_BATCH, wp), 1)
    valid = d != INVALID_I32
    col1 = col - d
    keep = valid & (col1 >= 0) & (col1 < w)
    col1c = jnp.clip(col1, 0, w - 1)
    for oc in range(wp // chunk):
        cs = slice(oc * chunk, (oc + 1) * chunk)
        kc = keep[:, cs]
        cc = col1c[:, cs]
        lo = jnp.min(jnp.where(kc, cc, w - 1), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(kc, cc, 0), axis=1, keepdims=True)
        bse = jnp.minimum(lo, wp - wcap) & ~jnp.int32(127)
        ok = hi <= bse + (wcap - 1)
        out_ref[:, oc:oc + 1] = jnp.where(ok, bse, jnp.int32(-1))


def _chunk_window_bases_pallas(d32, w: int, wp: int, wcap: int, chunk: int,
                               interpret: bool = False):
    """(hp, ncp) bases via :func:`_bases_kernel` (ncp = nc padded to 128;
    lanes past nc are uninitialized and must not be read)."""
    hp = d32.shape[0]
    nc = wp // chunk
    ncp = ((nc + 127) // 128) * 128
    kernel = functools.partial(
        _bases_kernel, w=w, wp=wp, wcap=wcap, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(hp // ROW_BATCH,),
        in_specs=[pl.BlockSpec((ROW_BATCH, wp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROW_BATCH, ncp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, ncp), jnp.int32),
        interpret=interpret,
    )(d32)


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


def _make_nxcorr(n: int, fn, minvar, B):
    """Serial-order NXCORR accumulation matching the oracle transcription
    (mult-then-add, two roundings per step; an optimization barrier stops
    the compiler from contracting the pattern into a single-rounding fma,
    which shifts results by 1 ulp and can flip threshold decisions).
    """

    def nxcorr_serial(diff0, var0, series):
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

    return nxcorr_serial


def _chunk_tail(
    nxcorr_serial, xs_ref, diff0, var0, y0, y1, y2,
    d_cs, border_cs, keep_cs, out_ref, corr_ref, cs,
    *, n: int, xs: tuple, threshold: float, in_mod: int,
):
    """Shared per-chunk epilogue: integer NXCORR, optional subpixel sweep,
    threshold + invalidation writes. Identical arithmetic for every gather
    strategy (the gathered series are bit-identical selections)."""
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

        shape = nxc_int.shape
        best_nxc, best_x = jax.lax.fori_loop(
            0, len(xs) // SWEEP_UNROLL, sweep,
            (jnp.full(shape, -1.0, jnp.float32),
             jnp.zeros(shape, jnp.float32)),
        )
        corr_val = jnp.where(border_cs, nxc_int, best_nxc)
        ret = jnp.where(
            border_cs,
            d_cs.astype(jnp.float32),
            d_cs.astype(jnp.float32) - best_x,
        )
    else:
        corr_val = nxc_int
        ret = d_cs.astype(jnp.float32)

    nan = jnp.float32(jnp.nan)
    corr_ref[:, cs] = jnp.where(keep_cs, corr_val, nan)
    final = keep_cs & ~(corr_val < jnp.float32(threshold))
    out_ref[:, cs] = jnp.where(final, ret, nan)


def _left_stats(s0_ref, cs, n: int, fn, shape):
    """Left series + NXCORR stats for one chunk (serial reference order).
    Mosaic has no direct u8/u16 -> f32 cast; hop through int32."""
    s0c = [s0_ref[t, :, cs].astype(jnp.int32).astype(jnp.float32)
           for t in range(n)]
    m0 = jnp.zeros(shape, jnp.float32)
    for t in range(n):
        m0 = m0 + s0c[t]
    m0 = m0 / fn
    diff0 = [s0c[t] - m0 for t in range(n)]
    var0 = jnp.zeros(shape, jnp.float32)
    for t in range(n):
        var0 = diff0[t] * diff0[t] + var0
    return diff0, var0


def _agree_kernel(
    xs_ref,  # (1, XSPAD) f32 in SMEM — subpixel x grid (unused if empty)
    bases_ref,  # (8, WP/CHUNK) i32 in SMEM — dynamic-window bases / -1
    disp_ref,  # (8, WP) i32
    s0_ref,  # (n, 8, WP) input dtype
    s1_ref,  # (n, 8, WP)
    out_ref,  # (8, WP) f32 — refined disparity, NaN invalid
    corr_ref,  # (8, WP) f32 — NXCORR, NaN where not computed
    bt_scratch,  # (128, WP) bf16 or None — MXU-gather series matrix
    gout_scratch,  # (8, CHUNK, 128) f32 or None — MXU-gather dot outputs
    bases_vmem=None,  # (8, NCP) i32 VMEM — in-kernel bases staging
    bases_smem=None,  # (8, NCP) i32 SMEM — scalar-readable bases
    bases_sem=None,  # DMA semaphore for the VMEM->SMEM staging copy
    *,
    n: int,
    w: int,
    wp: int,
    wcap: int,  # dynamic-window width (0 = full-width dots only)
    chunk: int,
    threshold: float,
    minvar: Optional[float],
    xs: tuple,  # () for the integer variant
    in_mod: int,  # modular mask for the input dtype (0xFF / 0xFFFF)
    mxu_gather: bool,
    inkernel_bases: bool = False,
    deferred: bool = False,  # branchless windowed dots + deferred repair
    static_bases: tuple = (),  # per-chunk COMPILE-TIME window bases
    fold: int = 1,  # one-hot fold factor (full-width path only)
    interpret: bool = False,
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
    nxcorr_serial = _make_nxcorr(n, fn, minvar, B)

    if mxu_gather and wcap and inkernel_bases:
        # In-kernel dynamic-window bases: exactly _chunk_window_bases'
        # arithmetic, but computed from the keep/col1c blocks already in
        # VMEM (the wrapper's precomputed-operand variant measured +17 ms
        # per frame end-to-end — see AGREE_BASES). The per-chunk keep-masked
        # min/max land in a VMEM staging row, one small DMA per grid step
        # moves them to SMEM, and the chunk loop below reads them back as
        # scalars for the windowed/full-width branch.
        for oc in range(wp // chunk):
            cs = slice(oc * chunk, (oc + 1) * chunk)
            kc = keep[:, cs]
            cc = col1c[:, cs]
            lo = jnp.min(jnp.where(kc, cc, w - 1), axis=1, keepdims=True)
            hi = jnp.max(jnp.where(kc, cc, 0), axis=1, keepdims=True)
            bse = jnp.minimum(lo, wp - wcap) & ~jnp.int32(127)
            ok = hi <= bse + (wcap - 1)
            bases_vmem[:, oc:oc + 1] = jnp.where(ok, bse, jnp.int32(-1))
        stage = pltpu.make_async_copy(bases_vmem, bases_smem, bases_sem)
        stage.start()
        stage.wait()
        bases_rd = bases_smem
    else:
        bases_rd = bases_ref

    # MXU one-hot gather, row-major schedule: the series matrix
    # ``bt_scratch`` depends only on the image row (and byte for u16), so it
    # is filled ONCE per row and reused across all column chunks — the
    # previous chunk-major order refilled it (wp/CHUNK)x per row, ~44 extra
    # (128, WP) fills + lane rotates per grid step.
    if mxu_gather:
        u16 = s1_ref.dtype == jnp.uint16
        # u16 accumulates byte-1 dots INTO gout (store_g), which the
        # deferred overwrite cannot repair; u16's production gather is the
        # window strategy anyway (_resolve_gather), so keep the branch
        # structure there.
        deferred = deferred and not u16
        i8e = bt_scratch.dtype == jnp.int8
        # Section offsets in the series matrix: rows [0,n) the raw series,
        # [o1,o1+n) shifted right (value at col-1), [o2,o2+n) shifted left
        # (value at col+1). Offsets are 8-sublane-aligned when the 128 rows
        # allow it, so the bulk section stores below stay unmasked.
        n8 = ((n + 7) // 8) * 8
        o1, o2 = (n8, 2 * n8) if (xs and 2 * n8 + n <= 128) else (n, 2 * n)
        # Unwritten rows' dot outputs are never read — zero once per step.
        bt_scratch[...] = jnp.zeros(bt_scratch.shape, bt_scratch.dtype)
        assert fold == 1 or (not wcap and not static_bases and not u16)
        wq = wp // fold
        cidx = jax.lax.broadcasted_iota(jnp.int32, (wq, chunk), 0)
        widx = (jax.lax.broadcasted_iota(jnp.int32, (wcap, chunk), 0)
                if wcap else None)
        # Folded-block index per pixel, sublane-major for the output-side
        # select (mirrors the window kernel's transposed col1c).
        col1c_t = jnp.transpose(col1c) if fold > 1 else None  # (WP, RB)

        def gather_dot(onehot_b, rhs):
            # Exact for every engine: each one-hot column holds at most one
            # 1. An all-false column (an out-of-window invalid pixel)
            # yields 0 on the bf16 engine and 128 on the i8 engine (the
            # unconditional +128 centering undo with no selected byte) —
            # both garbage values are masked by ``keep`` downstream.
            if i8e:
                g32 = jax.lax.dot_general(
                    onehot_b.astype(jnp.int8), rhs,
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (g32 + 128).astype(jnp.float32)
            # Direct bool->bf16 cast (exact 1.0/0.0) — one VPU pass instead
            # of the select+cast pair over the (K, CHUNK) mask.
            oh = onehot_b.astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, rhs,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def store_g(r, cs, g, byte):
            if u16 and byte == 1:
                gout_scratch[r, cs, :] = (
                    gout_scratch[r, cs, :] + g * jnp.float32(256.0))
            else:
                gout_scratch[r, cs, :] = g

        def cv(v32):
            # i8 engine: centered bytes (exact to undo post-dot); bf16
            # engine: bytes are bf16-exact (< 256).
            if i8e:
                return (v32 - 128).astype(jnp.int8)
            return v32.astype(jnp.float32).astype(jnp.bfloat16)

        def encode_row(r, byte):
            # Bulk fill: whole (n, WP) section stores instead of the
            # previous per-shot (1, WP) writes (those ran at 1/8th
            # sublane utilization — ~3n narrow casts/rolls/stores per
            # image row). Wrapped edge lanes of the rolls only reach
            # border pixels, which take the integer fallback.
            rows32 = s1_ref[:, r, :].astype(jnp.int32)  # (n, WP)
            if byte == 1:
                rows32 = rows32 >> 8
            elif u16:
                rows32 = rows32 & jnp.int32(0xFF)
            # 32-bit lane rotates (narrow rotates don't lower);
            # roll needs non-negative shifts: wp-1 == -1. Rolls run on the
            # FULL row before any fold slicing, so folded sections still
            # hold the true col-1/col+1 neighbours at block edges.
            secs = [rows32]
            if xs:
                secs += [pltpu.roll(rows32, 1, axis=1),
                         pltpu.roll(rows32, wp - 1, axis=1)]
            offs = [0, o1, o2]
            for f in range(fold):
                ls = slice(f * wq, (f + 1) * wq)
                for sec, off in zip(secs, offs):
                    b0 = 128 * f + off
                    bt_scratch[b0:b0 + n, :] = cv(sec[:, ls])

        for byte in range(2 if u16 else 1):
            for r in range(ROW_BATCH):
                encode_row(r, byte)
                for oc in range(wp // chunk):
                    cs = slice(oc * chunk, (oc + 1) * chunk)
                    # One-hot built transposed, (K, chunk): onehot_t[c, j]
                    # = (c == col1[j]) — avoids a (1, CHUNK) -> (CHUNK, 1)
                    # vector relayout. The dot contracts its sublane axis
                    # against the series matrix's lane axis:
                    # (K, CHUNK) x (128, K) -> (CHUNK, 128), where K is the
                    # padded width or, when this chunk's matched columns fit
                    # a dynamic window (base >= 0), just wcap — ~3x fewer
                    # MXU flops AND a ~3x cheaper one-hot build at
                    # production widths. u16 recombines hi/lo contractions
                    # as 256*hi + lo.
                    # (The series-major orientation producing (128, CHUNK)
                    # directly measured 25% slower end-to-end: the sweep's
                    # per-shot middle-axis slices relayout worse than one
                    # chunk transpose.)
                    if static_bases:
                        # Disparity-range mode (Config.disparity_range):
                        # the window base is a COMPILE-TIME constant
                        # derived from the static range, so the slice and
                        # one-hot offsets are literals — no bases operand,
                        # no scalar reads, no branches (the 89.4 ms class
                        # the runtime dynamic window could never reach;
                        # BASELINE.md "The dynamic-window artifact").
                        # Valid pixels are in-window BY CONSTRUCTION
                        # (search guarantees d in range); invalid pixels
                        # gather garbage through an all-false one-hot,
                        # masked by ``keep`` downstream.
                        bal = static_bases[oc]
                        oh = widx == (col1c[r:r + 1, cs] - bal)
                        g = gather_dot(
                            oh, bt_scratch[:, bal:bal + wcap])
                        store_g(r, cs, g, byte)
                    elif wcap and AGREE_DIAG == "staticwin":
                        # TIMING-ONLY: compile-time window at the chunk's
                        # own aligned offset (see AGREE_DIAG).
                        bal = min(oc * chunk, wp - wcap) & ~127
                        oh = widx == (col1c[r:r + 1, cs] - bal)
                        g = gather_dot(
                            oh, bt_scratch[:, bal:bal + wcap])
                        store_g(r, cs, g, byte)
                    elif wcap and AGREE_DIAG == "forcewin":
                        # TIMING-ONLY: runtime base, no fallback branch.
                        base = jnp.maximum(bases_rd[r, oc], 0)
                        bal = pl.multiple_of(base, 128)
                        oh = widx == (col1c[r:r + 1, cs] - base)
                        g = gather_dot(
                            oh, bt_scratch[:, pl.ds(bal, wcap)])
                        store_g(r, cs, g, byte)
                    elif wcap and deferred:
                        # Branchless windowed dot for EVERY chunk: fallback
                        # chunks (base < 0) run it too at a clamped base —
                        # garbage that the deferred loop below overwrites —
                        # so the MXU pipeline streams all 13 windowed dots
                        # per row with no control-flow fence (the per-chunk
                        # pl.when pair measured ~31 ms/frame of lost
                        # pipelining; see AGREE_WINDOW mode notes).
                        base = jnp.maximum(bases_rd[r, oc], 0)
                        bal = pl.multiple_of(base, 128)
                        oh = widx == (col1c[r:r + 1, cs] - base)
                        g = gather_dot(
                            oh, bt_scratch[:, pl.ds(bal, wcap)])
                        store_g(r, cs, g, byte)
                    elif wcap:
                        base = bases_rd[r, oc]

                        @pl.when(base >= 0)
                        def _(base=base, r=r, cs=cs, byte=byte):
                            bal = pl.multiple_of(base, 128)
                            oh = widx == (col1c[r:r + 1, cs] - base)
                            g = gather_dot(
                                oh, bt_scratch[:, pl.ds(bal, wcap)])
                            store_g(r, cs, g, byte)

                        @pl.when(base < 0)
                        def _(r=r, cs=cs, byte=byte):
                            oh = cidx == col1c[r:r + 1, cs]
                            g = gather_dot(oh, bt_scratch[...])
                            store_g(r, cs, g, byte)
                    elif fold > 1:
                        # Folded full-width gather: one one-hot row indexes
                        # F strided column blocks at once (q = col1 mod-ish
                        # within its block); the dot returns every block's
                        # candidate and the select keeps the pixel's own.
                        c1 = col1c[r:r + 1, cs]
                        blk = (c1 >= wq).astype(jnp.int32)
                        for f in range(2, fold):
                            blk = blk + (c1 >= f * wq).astype(jnp.int32)
                        q = c1 - blk * wq
                        g = gather_dot(cidx == q, bt_scratch[...])
                        c1t = col1c_t[cs, r:r + 1]  # (CHUNK, 1)
                        sel = g[:, 0:128]
                        for f in range(1, fold):
                            inf = ((c1t >= f * wq)
                                   & (c1t < (f + 1) * wq))
                            sel = jnp.where(
                                inf, g[:, 128 * f:128 * (f + 1)], sel)
                        store_g(r, cs, sel, byte)
                    else:
                        oh = cidx == col1c[r:r + 1, cs]
                        g = gather_dot(oh, bt_scratch[...])
                        store_g(r, cs, g, byte)
        if wcap and deferred and not static_bases:
            # Deferred exact repair, AFTER the whole gather phase so the
            # encode (VPU) / dot (MXU) streaming above never meets control
            # flow: one dynamic-bound loop per row walks the COMPACTED
            # fallback-chunk list (wrapper argsorts the bases; lane nc
            # holds the count) and redoes just those chunks full-width,
            # re-encoding the row per iteration (rare — ~8% of chunks).
            # Why this structure: a per-chunk pl.when pair costs
            # ~0.3 ms/frame PER SITE in lost Mosaic pipelining (104 sites
            # = the misattributed r3 "bases stall", e2e 123.6 vs 92.6
            # branch-free), and any control flow BETWEEN row streams
            # serializes encode against dots (measured 130-132).
            for r in range(ROW_BATCH):
                nfv = bases_rd[r, wp // chunk]

                @pl.when(nfv > 0)
                def _(r=r, nfv=nfv):
                    # One re-encode per row with any fallback (the loop
                    # body itself must stay encode-free: bt_scratch is
                    # loop-invariant for a fixed row).
                    encode_row(r, 0)

                    def redo(k, _, r=r):
                        oc = bases_rd[r, (wp // chunk) + 1 + k]
                        c0 = pl.multiple_of(oc * chunk, chunk)
                        d_c = disp_ref[r:r + 1, pl.ds(c0, chunk)]
                        colv = c0 + jax.lax.broadcasted_iota(
                            jnp.int32, (1, chunk), 1)
                        c1v = jnp.clip(colv - d_c, 0, w - 1)
                        oh = cidx == c1v
                        g = gather_dot(oh, bt_scratch[...])
                        gout_scratch[r, pl.ds(c0, chunk), :] = g
                        return 0

                    jax.lax.fori_loop(0, nfv, redo, 0)

    for oc in range(wp // chunk):
        cs = slice(oc * chunk, (oc + 1) * chunk)
        c1 = col1c[:, cs]
        i1 = c1
        i0 = jnp.maximum(c1 - 1, 0)
        i2 = jnp.minimum(c1 + 1, w - 1)

        diff0, var0 = _left_stats(s0_ref, cs, n, fn, (ROW_BATCH, chunk))

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
                y0 = [tr[o1 + t] for t in range(n)]
                y2 = [tr[o2 + t] for t in range(n)]
        else:
            for t in range(n):
                def load_blk(b, t=t):
                    blk = s1_ref[t, :, pl.ds(b * BLK, BLK)]
                    return blk.astype(jnp.int32).astype(jnp.float32)

                y1.append(_gather_row(load_blk, i1 >> 7, i1 & 127, nblk))
                if xs:
                    y0.append(_gather_row(load_blk, i0 >> 7, i0 & 127, nblk))
                    y2.append(_gather_row(load_blk, i2 >> 7, i2 & 127, nblk))

        _chunk_tail(
            nxcorr_serial, xs_ref, diff0, var0, y0, y1, y2,
            d[:, cs], border[:, cs], keep[:, cs], out_ref, corr_ref, cs,
            n=n, xs=xs, threshold=threshold, in_mod=in_mod,
        )


def _agree_window_kernel(
    xs_ref,  # (1, XSPAD) f32 in SMEM — subpixel x grid (unused if empty)
    disp_ref,  # (8, WP) i32
    s0_ref,  # (n, 8, WP) input dtype
    s1w_ref,  # (8, NG, LP) input dtype — windowed right series
    out_ref,  # (8, WP) f32
    corr_ref,  # (8, WP) f32
    bt_scratch,  # (nbytes, 8, NG, LP) bf16/int8 — encoded windowed series
    g_scratch,  # (8, CHUNK, LP) f32 — extracted gathers for ONE chunk
    *,
    n: int,
    w: int,
    wp: int,
    gsz: int,
    lanes: int,
    chunk: int,
    threshold: float,
    minvar: Optional[float],
    xs: tuple,
    in_mod: int,
    i8e: bool,
    grange: tuple = (),  # ((g_lo per chunk...), gw) — static group windows
    interpret: bool,
):
    """Windowed-gather agree kernel (see the module docstring).

    Per chunk and row, ONE grouped one-hot contraction
    ``(CHUNK, NG) @ (NG, LP)`` fetches each pixel's ``lanes``-wide column
    window for all n shots; a single in-vreg ``take_along_axis`` per
    128-lane slice then lands the exact columns
    ``max(col1-1,0) / col1 / min(col1+1,w-1)`` (window offsets q0/q1/q2)
    AND compacts them to global lane ``4t + k`` (``t`` for the integer
    variant), so the per-chunk scratch and its sweep transpose carry no
    window garbage. Reproduces the legacy path's gathered series
    bit-for-bit (both are exact selections of the same elements).
    """
    ng = s1w_ref.shape[1]
    lp = s1w_ref.shape[2]
    # Extraction compaction: slice sl of the dot output holds 128//lanes
    # section windows; the gather writes each section's (y0, y1, y2, pad)
    # as 4 dense lanes, so compacted GLOBAL lane = 4t + k (subpixel) or t
    # (integer) and the per-chunk scratch/transpose shrinks by lanes/4.
    cw = (4 if xs else 1) * (128 // lanes)
    B = jax.lax.optimization_barrier if interpret else (lambda x: x)
    fn = B(jnp.float32(n))
    u16 = s0_ref.dtype == jnp.uint16
    nbytes = 2 if u16 else 1
    logg = gsz.bit_length() - 1
    d = disp_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (ROW_BATCH, wp), 1)
    valid = d != INVALID_I32
    col1 = col - d
    inb = (col1 >= 0) & (col1 < w)
    keep = valid & inb
    col1c = jnp.clip(col1, 0, w - 1)
    border = (col1c == 0) | (col1c == w - 1)
    nxcorr_serial = _make_nxcorr(n, fn, minvar, B)

    def cv(v32):
        if i8e:
            return (v32 - 128).astype(jnp.int8)
        return v32.astype(jnp.float32).astype(jnp.bfloat16)

    # Encode the windowed series matrices for all rows (one bulk cast per
    # row/byte — no per-shot fills or lane rotates).
    for byte in range(nbytes):
        for r in range(ROW_BATCH):
            v32 = s1w_ref[r].astype(jnp.int32)
            if byte == 1:
                v32 = v32 >> 8
            elif u16:
                v32 = v32 & jnp.int32(0xFF)
            bt_scratch[byte, r] = cv(v32)

    # The extraction indexes pixels on SUBLANES (the dot output is
    # (CHUNK, LP)); transpose the clipped match columns once per grid step
    # so the per-chunk window offsets q0/q1/q2 slice out relayout-free.
    col1c_t = jnp.transpose(col1c)  # (WP, ROW_BATCH)

    # Disparity-range mode: per-chunk COMPILE-TIME group windows
    # (Config.disparity_range): in-range pixels' groups g0 = col1 >> logg
    # lie in [g_lo[oc], g_lo[oc] + gw) by construction, so the grouped
    # one-hot contraction only needs a gw-deep slice of the series matrix
    # — 3-4x fewer MXU flops and a 3-4x smaller one-hot build at
    # production widths, with zero branches (offsets are literals).
    # Out-of-window pixels (only ever invalid ones) gather zeros through
    # an all-false one-hot, masked by ``keep`` downstream — the same
    # exactness argument as the full-universe dot.
    if grange:
        g_los, gw = grange
    else:
        g_los, gw = None, ng
    gidx = jax.lax.broadcasted_iota(jnp.int32, (gw, chunk), 0)
    lloc = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
    kq = lloc & 3  # y0/y1/y2/pad position within a compacted quad

    for oc in range(wp // chunk):
        cs = slice(oc * chunk, (oc + 1) * chunk)
        diff0, var0 = _left_stats(s0_ref, cs, n, fn, (ROW_BATCH, chunk))

        for r in range(ROW_BATCH):
            c1r = col1c[r:r + 1, cs]  # (1, CHUNK) — lane-major for one-hot
            if xs:
                # Window base = the y0 column; q1/q2 stay < 2*gsz because
                # base is within gsz-1 of the group start.
                base = jnp.maximum(c1r - 1, 0)
            else:
                base = c1r
            g0 = base >> logg
            g_lo = g_los[oc] if g_los is not None else 0
            onehot = gidx == (g0 - g_lo)  # (GW, CHUNK)
            acc = None
            for byte in range(nbytes):
                bt = bt_scratch[byte, r, g_lo:g_lo + gw, :]
                if i8e:
                    g32 = jax.lax.dot_general(
                        onehot.astype(jnp.int8), bt,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    gg = (g32 + 128).astype(jnp.float32)
                else:
                    # Direct bool->bf16 cast (exact 1.0/0.0), one VPU pass.
                    oh = onehot.astype(jnp.bfloat16)
                    gg = jax.lax.dot_general(
                        oh, bt,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (CHUNK, LP)
                if byte == 1:
                    acc = acc + gg * jnp.float32(256.0)
                else:
                    acc = gg

            # Sublane-major window offsets for this (row, chunk).
            c1t = col1c_t[cs, r:r + 1]  # (CHUNK, 1)
            if xs:
                base_t = jnp.maximum(c1t - 1, 0)
                g0t = base_t >> logg
                gbase = g0t << logg
                q0 = base_t - gbase
                q1 = c1t - gbase
                q2 = jnp.minimum(c1t + 1, w - 1) - gbase
            else:
                g0t = c1t >> logg
                q1 = c1t - (g0t << logg)

            # Land the exact columns AND compact: output lane 4*s_loc + k
            # gathers window lane lanes*s_loc + qk (k = 0/1/2 -> y0/y1/y2;
            # k = 3 pads), so writing the first cw lanes of each slice
            # packs section t's trio at global lane 4t + k — densely, with
            # no garbage riding the later transpose. Window lanes never
            # cross a 128-lane slice (lanes | 128), so the gather is
            # per-vreg.
            if xs:
                qsel = jnp.where(
                    kq == 0, q0, jnp.where(kq == 2, q2, q1))
                idx = ((lloc >> 2) * lanes) + qsel
            else:
                qsel = jnp.broadcast_to(q1, (chunk, 128))
                idx = lloc * lanes + qsel
            idx = jnp.where(lloc < cw, idx, 0)
            for sl in range(lp // 128):
                lsl = slice(sl * 128, (sl + 1) * 128)
                ge = jnp.take_along_axis(acc[:, lsl], idx, axis=1)
                g_scratch[r, :, sl * cw:(sl + 1) * cw] = ge[:, :cw]

        # (8, CHUNK, CLP) -> (CLP, 8, CHUNK): per-shot full-slab layout for
        # the sweep (lane-major would waste 127/128 VPU lanes).
        tr = jnp.transpose(g_scratch[...], (2, 0, 1))
        if xs:
            y0 = [tr[4 * t + 0] for t in range(n)]
            y1 = [tr[4 * t + 1] for t in range(n)]
            y2 = [tr[4 * t + 2] for t in range(n)]
        else:
            y0, y2 = [], []
            y1 = [tr[t] for t in range(n)]

        _chunk_tail(
            nxcorr_serial, xs_ref, diff0, var0, y0, y1, y2,
            d[:, cs], border[:, cs], keep[:, cs], out_ref, corr_ref, cs,
            n=n, xs=xs, threshold=threshold, in_mod=in_mod,
        )


def _pad2(x, mult0, mult1, value=0):
    p0 = (-x.shape[-2]) % mult0
    p1 = (-x.shape[-1]) % mult1
    if p0 == 0 and p1 == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, p0), (0, p1)]
    return jnp.pad(x, widths, constant_values=value)


def _window_series(s1, gsz: int, subpixel: bool, lp: int):
    """(n, H, WP) padded stack -> (H, WP/gsz, lp) windowed series matrix:
    ``out[h, g, t*lanes + l] = s1[t, h, gsz*g + l]`` with ``lanes = 2*gsz``
    windows (two adjacent groups, zero-padded past the last) when
    ``subpixel`` else ``gsz``. Cheap bandwidth-bound XLA transposes."""
    n, h, wp = s1.shape
    ng = wp // gsz
    x = jnp.transpose(s1, (1, 2, 0)).reshape(h, ng, gsz, n)
    xa = jnp.transpose(x, (0, 1, 3, 2))  # (h, ng, n, gsz)
    if subpixel:
        xb = jnp.concatenate(
            [xa[:, 1:], jnp.zeros_like(xa[:, :1])], axis=1)
        xa = jnp.concatenate([xa, xb], axis=-1)  # (h, ng, n, 2*gsz)
    out = xa.reshape(h, ng, xa.shape[2] * xa.shape[3])
    pad = lp - out.shape[-1]
    if pad:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)))
    return out



def _static_group_window(chunk, wp, w, drange, subpixel, gsz, ng):
    """Compile-time per-chunk group windows for the grouped (window)
    gather under a static disparity range, or None when the range is too
    wide to pay off. Returns ``(g_lo_per_chunk, gw)``: every in-range
    matched column's group (plus the subpixel col1-1 neighbour) of chunk
    ``oc`` lies in ``[g_lo[oc], g_lo[oc] + gw)`` (asserted)."""
    dmin, dmax = drange
    logg = gsz.bit_length() - 1
    slack = 1 if subpixel else 0
    bounds = []
    span_max = 0
    for oc in range(wp // chunk):
        lo_col = max(0, oc * chunk - dmax - slack)
        hi_col = max(lo_col, min(w - 1, oc * chunk + chunk - 1
                                 - dmin + slack))
        g_lo = lo_col >> logg
        g_hi = hi_col >> logg
        bounds.append((g_lo, g_hi))
        span_max = max(span_max, g_hi - g_lo + 1)
    # +7 covers the sublane align-down of g_lo below; round gw to 8.
    gw = -(-(span_max + 7) // 8) * 8
    if gw >= ng:
        return None
    g_los = []
    for g_lo, g_hi in bounds:
        b = max(0, min(g_lo & ~7, ng - gw))
        assert b <= g_lo and g_hi <= b + gw - 1, (b, g_lo, g_hi, gw, ng)
        g_los.append(b)
    return tuple(g_los), gw


def resolve_chunk_wcap(gather: str, w: int):
    """(chunk, wcap) for a gather strategy at image width ``w``.

    Default: FULL-WIDTH dots (wcap=0, chunk=512). The dynamic window's
    round-3 advantage (72.2 ms subpixel / 56.9 integer standalone vs 88
    full-width) was a measurement artifact: every standalone agree probe
    fed the kernel CONSTANT bases, which let the compiler fold the
    per-chunk fallback branches away. With live (runtime) bases the
    branch structure costs ~31 ms/frame of lost Mosaic pipelining, and
    every exact branchless repair structure tried measured worse
    (2026-08-20 chained e2e: full-width 121.6 < dynwin-branch 123.6 <
    compact-repair 130.7 < clustered-pl.when 131.9 < post-phase-repair
    163.8; branch-free-but-inexact lower bounds: 92.6 runtime-base /
    89.4 static-base — the prize a future static-window design could
    claim). BICOS_AGREE_DYNWIN=<cols> re-enables the window path.
    Explicit env values win. Single source of truth — the probe logs this
    same resolution.
    """
    def wp_of(c):
        return -(-w // c) * c

    if gather == "mxu" and AGREE_DYNWIN:
        c = CHUNK or 256
        wcap = AGREE_DYNWIN if AGREE_DYNWIN > 0 else 640
        if (wcap > 0 and wcap % 128 == 0 and wcap >= c + 128
                and wp_of(c) > wcap):
            return c, wcap
    return (CHUNK or 512), 0



def _static_window(chunk: int, wp: int, w: int, drange, subpixel: bool):
    """Compile-time per-chunk window (base list, wcap) for a static
    disparity range, or None when the range is too wide to pay off.

    Coverage invariant (asserted): every in-range matched column — plus
    the col1±1 subpixel neighbours, clipped to the row — of every pixel in
    chunk ``oc`` lies in ``[base[oc], base[oc] + wcap)``.
    """
    dmin, dmax = drange
    slack = 1 if subpixel else 0
    wcap = ((chunk + (dmax - dmin) + 2 * slack + 127) // 128) * 128 + 128
    if wcap >= wp:
        return None
    bases = []
    for oc in range(wp // chunk):
        lo = max(0, oc * chunk - dmax - slack)
        b = max(0, min(lo & ~127, wp - wcap))
        hi = min(oc * chunk + chunk - 1 - dmin + slack, w - 1)
        assert b <= lo and hi <= b + wcap - 1, (oc, b, lo, hi, wcap)
        bases.append(b)
    return tuple(bases), wcap


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "minvar", "xs", "interpret", "bases_mode",
                     "window_mode", "drange"),
)
def _agree_call(disp, stack0, stack1, ext_bases=None, *, threshold, minvar,
                xs, interpret, bases_mode="host", window_mode="branch",
                drange=None):
    n, h, w = stack0.shape
    u16_in = stack0.dtype == jnp.uint16
    in_mod = 0xFFFF if u16_in else 0xFF
    gather, group = _resolve_gather(n, bool(xs), u16_in)
    if drange is not None and AGREE_GATHER == "auto" and gather == "window":
        # Ranged upgrade (r5, VERDICT r4 task 4): with a static disparity
        # range the mxu gather runs compile-time per-chunk windows — zero
        # branches, dots ~3x smaller than full width and on the i8 engine
        # — which beats the extraction-bound window gather for the integer
        # and u16 variants too (their per-vreg take_along_axis cost never
        # shrank with the range; BASELINE.md:53's named headroom). Gate on
        # the mxu section budget (3n subpixel / n integer output sections
        # must fit the 128 dot lanes) and on the window actually paying.
        sections_ok = (3 * n <= 128) if xs else (n <= 128)
        chunk_s = CHUNK or 256
        wp_s = w + ((-w) % chunk_s)
        if (sections_ok
                and _static_window(chunk_s, wp_s, w, drange, bool(xs))
                is not None):
            gather = "mxu"
    chunk, wcap = resolve_chunk_wcap(gather, w)
    static_bases = ()
    if drange is not None and gather == "mxu":
        chunk_s = CHUNK or 256  # explicit BICOS_AGREE_CHUNK wins
        wp_s = w + ((-w) % chunk_s)
        sw = _static_window(chunk_s, wp_s, w, drange, bool(xs))
        if sw is not None:
            static_bases, wcap = sw
            chunk = chunk_s
        else:
            wcap = 0  # range too wide: plain full-width dots

    d32 = _pad2(disp.astype(jnp.int32), ROW_BATCH, chunk, value=INVALID_I32)
    s0 = _pad2(stack0, ROW_BATCH, chunk)
    s1 = _pad2(stack1, ROW_BATCH, chunk)
    hp, wp = d32.shape

    if xs:
        # Pad the grid to a SWEEP_UNROLL multiple with copies of the last x
        # (re-evaluation is a no-op under the strict < best update).
        xs = xs + (xs[-1],) * ((-len(xs)) % SWEEP_UNROLL)
    xspad = max(8, len(xs))
    xs_arr = jnp.asarray(
        list(xs) + [0.0] * (xspad - len(xs)), dtype=jnp.float32
    ).reshape(1, xspad)
    i8e = (AGREE_ENGINE == "i8"
           or (AGREE_ENGINE == "auto" and gather == "mxu"))
    b_dtype = jnp.int8 if i8e else jnp.bfloat16

    if gather == "window":
        gsz = group
        lanes, lp = _window_layout(n, bool(xs), gsz)
        ng = wp // gsz
        # Compacted gather-scratch lanes: cw useful lanes per 128-lane dot
        # slice (see _agree_window_kernel).
        cw = (4 if xs else 1) * (128 // lanes)
        clp = max(128, (((lp // 128) * cw + 127) // 128) * 128)
        s1w = _window_series(s1, gsz, bool(xs), lp)
        grange = ()
        if drange is not None:
            sgw = _static_group_window(chunk, wp, w, drange, bool(xs),
                                       gsz, ng)
            if sgw is not None:
                grange = sgw
        kernel = functools.partial(
            _agree_window_kernel,
            n=n, w=w, wp=wp, gsz=gsz, lanes=lanes, chunk=chunk,
            threshold=threshold, minvar=minvar, xs=xs, in_mod=in_mod,
            i8e=i8e, grange=grange, interpret=interpret,
        )
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
                pl.BlockSpec((ROW_BATCH, ng, lp), lambda r: (r, 0, 0),
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
                    (2 if stack0.dtype == jnp.uint16 else 1,
                     ROW_BATCH, ng, lp), b_dtype),
                pltpu.VMEM((ROW_BATCH, chunk, clp), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xs_arr, d32, s0, s1w)
        return out[:h, :w], corr[:h, :w]

    mxu_gather = gather == "mxu"
    nc = wp // chunk
    if static_bases:
        # Compile-time windows: no bases operand at all (inert constant).
        inkernel = False
        bases = jnp.full((hp, nc), -1, jnp.int32)
    elif ext_bases is not None and wcap and mxu_gather:
        # Precomputed by the SEARCH kernel's epilogue
        # (search.search_stack_nodupes_with_bases): same values as
        # _chunk_window_bases, but produced where the packed minima already
        # live — the external computation measured +17 ms/frame (r3
        # chained-probe bisects; see AGREE_BASES).
        if ext_bases.shape != (hp, nc):
            raise ValueError(
                f"ext_bases shape {ext_bases.shape} != {(hp, nc)}")
        inkernel = False
        bases = ext_bases
    elif (inkernel := bool(wcap) and mxu_gather and bases_mode == "kernel"):
        # The operand slot stays (same pallas signature both modes) but
        # becomes an INERT constant: the kernel computes the real bases
        # into scratch. A freshly-produced per-frame bases operand measured
        # +17 ms end-to-end (see AGREE_BASES); a constant is free.
        bases = jnp.full((hp, nc), -1, jnp.int32)
    elif wcap and mxu_gather and bases_mode == "pallas":
        # Same values via the tiny bases kernel — sidesteps XLA's slow
        # lane-reduce emitter for the masked per-chunk min/max (the whole
        # compose-probe gap; see _bases_kernel).
        bases = _chunk_window_bases_pallas(d32, w, wp, wcap, chunk,
                                           interpret=interpret)
    else:
        bases = (_chunk_window_bases(d32, w, wp, wcap, chunk) if wcap
                 else jnp.full((hp, nc), -1, jnp.int32))
    deferred = (window_mode == "deferred" and bool(wcap) and mxu_gather
                and stack0.dtype != jnp.uint16 and not inkernel
                and not static_bases)
    # One-hot fold (full-width dots only — windowed/static paths slice the
    # series matrix in the ORIGINAL column space, and u16 keeps the
    # unfolded layout its byte loop was validated on). Auto ladder 4 -> 2
    # -> off: F=4 measured 107.4 vs F=2's 110.8 chained e2e at the
    # headline shape (r5; its folded K pads 832->896, +8% MXU, but the
    # halved encode wins more), and narrow widths where wp/4 < 256 fall
    # back to F=2 rather than unfolded.
    fold = 1
    if (mxu_gather and not wcap and not static_bases and not u16_in):
        for f in ([AGREE_FOLD] if AGREE_FOLD else [4, 2]):
            if f in (2, 4) and wp % f == 0 and wp // f >= 256:
                fold = f
                break
    if deferred:
        # Augment the bases operand with the compacted fallback-chunk list
        # the in-kernel repair loop walks: lane nc = count, lanes
        # [nc+1, 2nc+1) = fallback chunk indices first (stable argsort on
        # (hp, nc) — trivially-derived glue, not a full-disparity pass).
        fb = bases < 0
        nf = fb.sum(axis=1, dtype=jnp.int32)[:, None]
        order = jnp.argsort(~fb, axis=1, stable=True).astype(jnp.int32)
        bases = jnp.concatenate([bases, nf, order], axis=1)
    kernel = functools.partial(
        _agree_kernel,
        n=n, w=w, wp=wp, wcap=wcap, chunk=chunk,
        threshold=threshold, minvar=minvar, xs=xs, in_mod=in_mod,
        mxu_gather=mxu_gather, inkernel_bases=inkernel,
        deferred=deferred, static_bases=static_bases, fold=fold,
        interpret=interpret,
    )
    ncp = ((nc + 127) // 128) * 128
    scratch = [
        pltpu.VMEM((128 * fold, wp // fold), b_dtype),
        pltpu.VMEM((ROW_BATCH, wp, 128), jnp.float32),
    ]
    if inkernel:
        scratch += [
            pltpu.VMEM((ROW_BATCH, ncp), jnp.int32),
            pltpu.SMEM((ROW_BATCH, ncp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    out, corr = pl.pallas_call(
        kernel,
        grid=(hp // ROW_BATCH,),
        in_specs=[
            pl.BlockSpec((1, xspad), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BATCH, bases.shape[1]), lambda r: (r, 0),
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
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xs_arr, bases, d32, s0, s1)
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
    bases=None,
    drange=None,
):
    """Fused agree: returns (refined f32 disparity with NaN invalid, corrmap).

    ``step=None`` selects the integer variant (the caller converts back to
    int16 semantics); SINGLE precision only — DOUBLE falls back to the XLA
    path in the pipeline. ``bases`` optionally supplies the dynamic-window
    bases precomputed by the search kernel
    (``search.search_stack_nodupes_with_bases``) — shape
    ``(pad(H, 8), pad(W, chunk)/chunk)`` int32, same values as
    ``_chunk_window_bases``; ignored when the mxu dynamic window is not
    active.
    """
    from ..agree import subpixel_xgrid

    xs = tuple(subpixel_xgrid(step)) if step is not None else ()
    return _agree_call(
        disp, stack0, stack1, bases,
        threshold=float(threshold),
        minvar=None if minvar is None else float(minvar),
        xs=xs,
        interpret=interpret,
        bases_mode=AGREE_BASES,
        window_mode=AGREE_WINDOW,
        drange=drange,
    )
