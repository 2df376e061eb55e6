"""NXCORR validation ("agree"), variance prefilter, and subpixel refinement.

Reference semantics:

* ``nxcorr``          — ``agree.hpp:28-51`` (f32 means/variances/covariance;
  with ``min_variance``: return -1 when either variance is below it).
* integer ``agree``   — ``agree.hpp:53-93``: recompute NXCORR at the matched
  column ``col1 = col - d``; invalidate below threshold; out-of-bounds
  matches are invalidated *without* touching the corrmap.
* ``agree_subpixel``  — ``agree.hpp:95-191``: per-shot parabola through the
  three right-stack samples around ``col1``, swept over a float-accumulated
  x grid in [-1, 1]; interpolated samples are rounded half-even back to the
  integer input type (modular, matching C-style int->unsigned conversion)
  before NXCORR; border columns fall back to the integer check.

Quirks preserved on purpose:
* a zero-variance series without ``min_variance`` yields NaN NXCORR, and
  ``NaN < threshold`` is false, so the pixel is *kept* — same as the C++.
* ``min_variance`` arrives here already scaled by n (``cpu.cpp:127``).
* the x sweep's float accumulation drift (``for (x=-1; x<=1; x+=step)``) is
  replicated exactly by accumulating in float32 at trace time.

All ops are vectorized over the (H, W) plane (VPU work under XLA fusion); the
only gathers are ``take_along_axis`` of the right stack at ``col1 +/- 1``.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Precision

INVALID_I16 = jnp.int16(-32768)


def subpixel_xgrid(step: float) -> List[float]:
    """Replicates the reference's f32-accumulated sweep (agree.hpp:168)."""
    xs = []
    x = np.float32(-1.0)
    while x <= np.float32(1.0):
        xs.append(float(x))
        x = np.float32(x + np.float32(step))
    return xs


def _stats(series_f, dtype):
    """Mean/diff/variance of a temporal series (n, H, W) -> ((H,W), (n,H,W), (H,W)).

    Optimization barriers keep XLA from (a) strength-reducing the division
    by n into a reciprocal multiply and (b) contracting the squared-diff
    product into the reduction as an fma — both shift results by 1 ulp vs
    the reference arithmetic.
    """

    n = series_f.shape[0]
    mean = jnp.sum(series_f, axis=0) / jax.lax.optimization_barrier(dtype(n))
    diff = series_f - mean[None]
    var = jnp.sum(jax.lax.optimization_barrier(diff * diff), axis=0)
    return mean, diff, var


def _nxcorr_from(diff0, var0, series1_f, minvar, dtype):
    """NXCORR of cached left stats against a right series (agree.hpp:28-51)."""
    _, diff1, var1 = _stats(series1_f, dtype)
    covar = jnp.sum(jax.lax.optimization_barrier(diff0 * diff1), axis=0)
    # Barrier: XLA may rewrite x/sqrt(y) into x*rsqrt(y)+refinement under
    # --xla_allow_excess_precision, off by 1 ulp (v/sqrt(v*v) != 1).
    nxc = covar / jax.lax.optimization_barrier(jnp.sqrt(var0 * var1))
    if minvar is not None:
        bad = (var0 < dtype(minvar)) | (var1 < dtype(minvar))
        nxc = jnp.where(bad, dtype(-1.0), nxc)
    return nxc


def _compute_dtype(precision: Precision):
    return jnp.float64 if precision == Precision.DOUBLE else jnp.float32


def agree_integer(
    disp,
    stack0,
    stack1,
    threshold: float,
    minvar: Optional[float],
    precision: Precision = Precision.SINGLE,
):
    """Integer-disparity NXCORR validation.

    Args:
      disp: (H, W) int16 raw disparity (INVALID = -32768).
      stack0/stack1: (n, H, W) uint8/uint16.

    Returns (disp int16, corrmap f32 with NaN where not computed).
    """
    dt = _compute_dtype(precision)
    _, h, w = stack0.shape
    w1 = stack1.shape[2]  # right width (== w in the reference; may be wider
    # under W-banded sharding, where stack0 is one column band)
    d = disp.astype(jnp.int32)
    valid = disp != INVALID_I16
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    col1 = col - d
    inb = (col1 >= 0) & (col1 < w1)
    keep = valid & inb
    col1c = jnp.clip(col1, 0, w1 - 1)

    s1sel = jnp.take_along_axis(stack1, col1c[None], axis=2).astype(dt)
    _, diff0, var0 = _stats(stack0.astype(dt), dt)
    nxc = _nxcorr_from(diff0, var0, s1sel, minvar, dt)

    corr = jnp.where(keep, nxc, jnp.nan).astype(jnp.float32)
    # NaN nxc is NOT below threshold (reference keeps such pixels).
    final = keep & ~(nxc < dt(threshold))
    out = jnp.where(final, d, jnp.int32(INVALID_I16)).astype(jnp.int16)
    return out, corr


def agree_subpixel(
    disp,
    stack0,
    stack1,
    threshold: float,
    step: float,
    minvar: Optional[float],
    precision: Precision = Precision.SINGLE,
    col_offset=0,
):
    """Subpixel parabola-sweep NXCORR validation.

    ``col_offset``: global column offset of ``disp``'s band (W-banded
    sharding). The refined output is ``float32(d + col_offset) - best_x``
    computed with the offset applied in EXACT integer arithmetic before the
    single float rounding — adding the offset to the float output after the
    fact rounds twice and lands 1 ulp off the single-chip value whenever
    the x grid is not exactly representable (step 0.1; caught by the
    differential fuzz soak, tools/fuzz_soak.py).

    Returns (disp f32 with NaN invalid, corrmap f32).
    """
    dt = _compute_dtype(precision)
    in_dtype = stack0.dtype
    _, h, w = stack0.shape
    w1 = stack1.shape[2]
    d = disp.astype(jnp.int32)
    valid = disp != INVALID_I16
    col = jnp.arange(w, dtype=jnp.int32)[None, :]
    col1 = col - d
    inb = (col1 >= 0) & (col1 < w1)
    keep = valid & inb
    col1c = jnp.clip(col1, 0, w1 - 1)
    border = (col1c == 0) | (col1c == w1 - 1)

    # Gather the three neighbouring right-stack series (kept in the input
    # dtype; coefficient math is fused per x step to avoid materializing
    # (n, H, W) float intermediates).
    idx = col1c[None]
    y1u = jnp.take_along_axis(stack1, idx, axis=2)
    y0u = jnp.take_along_axis(stack1, jnp.clip(idx - 1, 0, w1 - 1), axis=2)
    y2u = jnp.take_along_axis(stack1, jnp.clip(idx + 1, 0, w1 - 1), axis=2)

    s0f = stack0.astype(dt)
    _, diff0, var0 = _stats(s0f, dt)

    y0 = y0u.astype(jnp.float32)
    y1 = y1u.astype(jnp.float32)
    y2 = y2u.astype(jnp.float32)
    pa = jnp.float32(0.5) * (y0 - jnp.float32(2.0) * y1 + y2)
    pb = jnp.float32(0.5) * (y2 - y0)

    # The x sweep runs as a lax.scan so XLA compiles ONE loop body instead of
    # unrolling ~2/step copies of (n, H, W) temporaries (compile time and
    # peak-memory win; the reference iterates serially per pixel,
    # agree.hpp:168-178).
    xs = jnp.asarray(subpixel_xgrid(step), dtype=jnp.float32)

    def sweep(carry, xf):
        best_nxc, best_x = carry
        # roundeven + modular cast to the input dtype (agree.hpp:170);
        # left-to-right evaluation order (a*x)*x like the reference.
        interp_f = jnp.round(((pa * xf) * xf + pb * xf) + y1)
        interp = interp_f.astype(jnp.int32).astype(in_dtype)
        nxc = _nxcorr_from(diff0, var0, interp.astype(dt), minvar, dt)
        upd = best_nxc < nxc  # strict: earliest x of the max wins
        best_nxc = jnp.where(upd, nxc, best_nxc)
        best_x = jnp.where(upd, xf, best_x)
        return (best_nxc, best_x), None

    init = (jnp.full((h, w), -1.0, dtype=dt), jnp.zeros((h, w), jnp.float32))
    (best_nxc, best_x), _ = jax.lax.scan(sweep, init, xs)

    nxc_border = _nxcorr_from(diff0, var0, y1u.astype(dt), minvar, dt)

    corr_val = jnp.where(border, nxc_border, best_nxc)
    corr = jnp.where(keep, corr_val, jnp.nan).astype(jnp.float32)
    final = keep & ~(corr_val < dt(threshold))
    dg = (d + jnp.int32(col_offset)).astype(jnp.float32)  # exact int add
    ret = jnp.where(border, dg, dg - best_x)
    out = jnp.where(final, ret, jnp.nan).astype(jnp.float32)
    return out, corr
