"""End-to-end BICOS matching pipeline under one ``jax.jit``.

Equivalent of the reference's backend orchestrators (``cpu.cpp:36-159``,
``cuda.cu:56-524``) — but instead of runtime template dispatch over
{u8,u16} x {u32,u64,u128,bitset256}, each (shape, dtype, Config) combination
is a separate XLA specialization; descriptor width is just the static trace
constant B. The CUDA backend's stream choreography (two substreams for the
two transforms, ``cuda.cu:85-161``) is unnecessary: both transforms live in
one jitted program and XLA schedules them.

Output dtype convention follows the CUDA backend (``cuda.cu:457-458``):
int16 disparity unless subpixel refinement is enabled (then float32 with NaN
invalid). (The reference CPU backend instead converts to float32 whenever a
threshold is set, ``cpu.cpp:88-94`` — a documented backend divergence; see
``pybicos_compat.float_disparity`` for the CPU-flavoured surface.)

``min_variance`` is scaled by the stack size before use, preserving the
reference quirk (``cpu.cpp:127``, ``cuda.cu:455``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import agree as _agree
from . import descriptor as _descriptor
from . import search as _search
from .config import Config, Consistency, NoDuplicates, Precision, \
    TransformMode, validate_stack


def _validate_inputs(stack0, stack1):
    if stack0.ndim != 3 or stack1.ndim != 3:
        raise ValueError("stacks must have shape (n, H, W)")
    if stack0.shape != stack1.shape:
        raise ValueError(
            f"stack shapes differ: {stack0.shape} vs {stack1.shape}"
        )
    if stack0.dtype != stack1.dtype:
        raise ValueError("stack dtypes differ")
    if stack0.dtype not in (jnp.uint8, jnp.uint16):
        raise ValueError(
            "bad input depths, only uint8 and uint16 are supported"
        )


def _agree_bases_params(stack0, cfg: Config, backend: str):
    """(chunk, wcap, wp) when the downstream fused-agree call will run the
    mxu dynamic window — i.e. when the search kernel should emit the agree
    bases from its epilogue (the external computation measured +17 ms/frame;
    see kernels/agree.AGREE_BASES). None otherwise. Must mirror
    ``_agree_call``'s own resolution exactly."""
    if backend not in ("pallas", "pallas_interpret"):
        return None
    if cfg.nxcorr_threshold is None or cfg.precision != Precision.SINGLE:
        return None
    from .kernels import agree as _ka

    n, _, w = stack0.shape
    u16 = stack0.dtype == jnp.uint16
    gather, _ = _ka._resolve_gather(n, cfg.subpixel_step is not None, u16)
    if gather != "mxu":
        return None
    chunk, wcap = _ka.resolve_chunk_wcap(gather, w)
    if not wcap:
        return None
    wp = w + ((-w) % chunk)
    return chunk, wcap, wp


def _match_impl(stack0, stack1, cfg: Config, want_corrmap: bool, backend: str):
    n = stack0.shape[0]
    from .config import actual_bits

    nbits = actual_bits(n, cfg.mode)
    search_bases = None
    if _search.fused_stack_search_ok(
            cfg.mode, n, backend, stack0.shape[2]):
        # Fused transform+search kernel: descriptor bits are computed
        # ON-CHIP from compare-coefficient MXU contractions
        # (descriptor.compare_coeffs / kernels/hamming.py) — the separate
        # transform pass and its packed-words HBM round-trip disappear.
        bparams = (_agree_bases_params(stack0, cfg, backend)
                   if (isinstance(cfg.variant, NoDuplicates)
                       and cfg.disparity_range is None) else None)
        if bparams is not None:
            # The search kernel also emits the agree stage's dynamic-window
            # bases from its epilogue (search_bases is None when the kernel
            # configuration cannot, and the agree wrapper computes them).
            disp, search_bases = _search.search_stack_nodupes_with_bases(
                stack0, stack1, cfg.mode,
                chunk=bparams[0], wcap=bparams[1], wp=bparams[2],
                backend=backend,
            )
        else:
            disp = _search.search_stack(
                stack0, stack1, cfg.mode, cfg.variant, backend=backend,
                drange=cfg.disparity_range,
            )
    elif backend in ("pallas", "pallas_interpret") and n < 10:
        # For small stacks XLA's rematerializer slices the transform's
        # temporal planes into (H, W, 1) buffers with a 128x-padded layout
        # (T(8,128) on a unit minor dim) and the fused program OOMs HBM at
        # compile time. The Pallas transform kernel computes the same words
        # with its own layouts and sidesteps the pathology.
        from .kernels.transform import descriptor_words_pallas

        interp = backend == "pallas_interpret"
        words0 = descriptor_words_pallas(stack0, cfg.mode, interpret=interp)
        words1 = descriptor_words_pallas(stack1, cfg.mode, interpret=interp)
        if words0.shape[-1] == 1:
            words0 = jnp.concatenate([words0, jnp.zeros_like(words0)], -1)
            words1 = jnp.concatenate([words1, jnp.zeros_like(words1)], -1)
        disp = _search.search_words(
            words0, words1, nbits, cfg.variant, backend=backend,
            drange=cfg.disparity_range,
        )
    else:
        # Packed-words path: descriptors are OR-ed into uint32 lanes as the
        # comparisons are computed — no (H, W, B) boolean tensors.
        # min_words=2: (H, W, 1) uint32 intermediates provoke the same
        # padded-layout blow-up; an all-zero second word is inert in every
        # consumer.
        words0 = _descriptor.descriptor_words(stack0, cfg.mode, min_words=2)
        words1 = _descriptor.descriptor_words(stack1, cfg.mode, min_words=2)
        disp = _search.search_words(
            words0, words1, nbits, cfg.variant, backend=backend,
            drange=cfg.disparity_range,
        )

    if cfg.nxcorr_threshold is None:
        return disp, None

    minvar = None if cfg.min_variance is None else cfg.min_variance * n
    from .config import Precision

    if backend in ("pallas", "pallas_interpret") and (
        cfg.precision == Precision.SINGLE
    ):
        # Fused VMEM kernel (kernels/agree.py); DOUBLE falls back to XLA
        # (Mosaic has no f64).
        from .kernels.agree import agree_pallas

        # Consistency stores d = (col0 + rc0)//2 - col1 with rc0 within
        # max_lr_diff of col0, so the matched column col0 - d can sit up
        # to ceil(max_lr_diff/2) outside the search range — the agree
        # stage's static windows must widen accordingly.
        agree_dr = cfg.disparity_range
        if agree_dr is not None and isinstance(cfg.variant, Consistency):
            m2 = (cfg.variant.max_lr_diff + 1) // 2
            agree_dr = (agree_dr[0] - m2, agree_dr[1] + m2)
        out_f, corr = agree_pallas(
            disp, stack0, stack1, cfg.nxcorr_threshold,
            cfg.subpixel_step, minvar,
            interpret=(backend == "pallas_interpret"),
            bases=search_bases,
            drange=agree_dr,
        )
        if cfg.subpixel_step is not None:
            out = out_f
        else:
            out = jnp.where(
                jnp.isnan(out_f),
                jnp.int32(-32768),
                jnp.nan_to_num(out_f).astype(jnp.int32),
            ).astype(jnp.int16)
    elif cfg.subpixel_step is not None:
        out, corr = _agree.agree_subpixel(
            disp, stack0, stack1, cfg.nxcorr_threshold, cfg.subpixel_step,
            minvar, cfg.precision,
        )
    else:
        out, corr = _agree.agree_integer(
            disp, stack0, stack1, cfg.nxcorr_threshold, minvar, cfg.precision,
        )
    return out, (corr if want_corrmap else None)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _match_jit(stack0, stack1, cfg: Config, want_corrmap: bool, backend: str):
    return _match_impl(stack0, stack1, cfg, want_corrmap, backend)


def match(
    stack0,
    stack1,
    cfg: Config = Config(),
    *,
    corrmap: bool = False,
    backend: str = "auto",
):
    """Match two multishot stereo stacks (the ``BICOS::match`` equivalent,
    ``match.hpp:31-41``).

    Args:
      stack0/stack1: ``(n, H, W)`` uint8 or uint16 rectified image stacks
        (left, right).
      cfg: matching configuration (library defaults; see :class:`Config`).
      corrmap: also return the NXCORR correlation map (float32, NaN where not
        computed). Requires ``cfg.nxcorr_threshold``.
      backend: 'auto' | 'pallas' | 'xla' | 'pallas_interpret'.

    Returns:
      ``disparity`` — (H, W) int16 (INVALID = -32768), or float32 with NaN
      invalid when ``cfg.subpixel_step`` is set. If ``corrmap`` is True,
      returns ``(disparity, corrmap)``.
    """
    stack0 = jnp.asarray(stack0)
    stack1 = jnp.asarray(stack1)
    _validate_inputs(stack0, stack1)
    validate_stack(stack0.shape[0], cfg.mode)
    if corrmap and cfg.nxcorr_threshold is None:
        raise ValueError("corrmap requires cfg.nxcorr_threshold")
    backend = _search.resolve_backend(backend)
    from .config import Precision

    if cfg.precision == Precision.DOUBLE:
        # f64 NXCORR (common.hpp:60). TPUs have no f64 ALUs — XLA emulates —
        # so this is a correctness surface, not a performance path; SINGLE is
        # the production default (as in the reference).
        import jax

        with jax.enable_x64(True):
            disp, corr = _match_jit(stack0, stack1, cfg, corrmap, backend)
    else:
        disp, corr = _match_jit(stack0, stack1, cfg, corrmap, backend)
    from . import debug as _debug

    if _debug.enabled():
        # BICOS_DEBUG invariant checks (the reference's debug-build traps;
        # see debug.py). Fetches results to the host — debug/CI only.
        _debug.check_match_output(
            disp, corr, stack0.shape[2],
            subpixel=cfg.subpixel_step is not None,
        )
    if corrmap:
        return disp, corr
    return disp


def match_batched(
    stacks0,
    stacks1,
    cfg: Config = Config(),
    *,
    corrmap: bool = False,
    backend: str = "auto",
):
    """Batched matching over ``(batch, n, H, W)`` stacks.

    Capability the reference lacks (its only batching is the caller's loop,
    SURVEY.md section 2). Because every pipeline stage is row-independent
    (epipolar geometry), the batch is folded into the row axis — one big
    kernel launch instead of ``vmap``, which keeps the Pallas search kernel's
    tiles full.
    """
    flat0, flat1, (b, h, w) = _fold_batch(stacks0, stacks1)
    return match_batched_folded(
        flat0, flat1, b, cfg, corrmap=corrmap, backend=backend)


def match_batched_folded(
    flat0,
    flat1,
    batch: int,
    cfg: Config = Config(),
    *,
    corrmap: bool = False,
    backend: str = "auto",
):
    """Batched matching on PRE-FOLDED ``(n, batch*H, W)`` stacks.

    The fold (batch into the row axis) is a real transpose when it runs on
    device: at batch=8 x 33 x 2200 x 3300 the transposed copies alone are
    ~3.8 GB of HBM — the measured RESOURCE_EXHAUSTED ceiling behind
    BASELINE.md's batch=4 limit. Callers that control staging (the serving
    daemon, the bench) can upload rows already folded — appending a pair's
    rows is plain concatenation — and skip that copy entirely; this entry
    trusts the layout and only reshapes the output back to per-pair maps.
    """
    flat0 = jnp.asarray(flat0)
    flat1 = jnp.asarray(flat1)
    if flat0.ndim != 3 or flat0.shape != flat1.shape:
        raise ValueError("folded stacks must share one (n, batch*H, W) shape")
    if batch < 1 or flat0.shape[1] % batch:
        raise ValueError(
            f"row count {flat0.shape[1]} is not a multiple of batch {batch}")
    h = flat0.shape[1] // batch
    w = flat0.shape[2]
    out = match(flat0, flat1, cfg, corrmap=corrmap, backend=backend)
    if corrmap:
        disp, corr = out
        return disp.reshape(batch, h, w), corr.reshape(batch, h, w)
    return out.reshape(batch, h, w)


def _fold_batch(stacks0, stacks1):
    """Fold ``(batch, n, H, W)`` stereo-pair batches into the row axis
    (rows are independent, so one ``(n, batch*H, W)`` launch covers the
    batch). Shapes must match exactly — a coincidental ``batch*H`` product
    match would silently pair rows of different images."""
    stacks0 = jnp.asarray(stacks0)
    stacks1 = jnp.asarray(stacks1)
    if stacks0.ndim != 4 or stacks1.ndim != 4:
        raise ValueError("batched stacks must have shape (batch, n, H, W)")
    if stacks0.shape != stacks1.shape:
        raise ValueError(
            f"batched stacks must have identical shapes, got "
            f"{stacks0.shape} vs {stacks1.shape}")
    b, n, h, w = stacks0.shape
    flat0 = jnp.moveaxis(stacks0, 0, 1).reshape(n, b * h, w)
    flat1 = jnp.moveaxis(stacks1, 0, 1).reshape(n, b * h, w)
    return flat0, flat1, (b, h, w)
