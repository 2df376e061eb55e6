"""Tracing, metrics and observability.

The reference's only observability is wall-clock prints in the CLI
(``cli.cpp:43,177-216``) and Google-Benchmark microbenches. TPU-native
equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` trace capture
  (view in TensorBoard / xprof).
* :func:`stage_timings` — per-stage wall times of the pipeline (transform /
  search / agree), each fenced with ``block_until_ready`` for honest numbers;
  used by the CLI's verbose mode and the bench harness.
* :func:`metrics` — JSON-able throughput/quality metrics (MP/s, stacks/s,
  valid-pixel fraction) the reference never reports.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_timings(stack0, stack1, cfg=None, *, backend: str = "auto") -> Dict:
    """Time each pipeline stage separately (compile excluded via warmup).

    Returns {"transform_ms", "search_ms", "agree_ms", "total_ms"}.
    """
    import jax
    import jax.numpy as jnp

    from . import agree as _agree
    from . import descriptor as _descriptor
    from . import search as _search
    from .config import Config
    from .pipeline import match

    cfg = cfg or Config()
    s0 = jnp.asarray(stack0)
    s1 = jnp.asarray(stack1)
    backend = _search.resolve_backend(backend)

    # Timing protocol: perturb the stack between runs (some runtimes dedupe
    # identical executions) and fetch a scalar to force completion.
    def timed(fn, pert):
        w = jax.tree_util.tree_leaves(fn(s0))[0]  # warm / compile; the
        _ = np.asarray(w[(0,) * w.ndim])  # scalar fetch forces lazy runtimes
        xp = s0 ^ np.uint8(pert).astype(s0.dtype)  # perturb OUTSIDE the
        _ = np.asarray(xp[(0,) * xp.ndim])  # timed region (dedupe guard)
        t0 = time.perf_counter()
        out = fn(xp)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        return (time.perf_counter() - t0) * 1e3

    if _search.fused_stack_search_ok(
            cfg.mode, s0.shape[0], backend, s0.shape[2]):
        # Production path: the transform rides inside the fused search
        # kernel, so there is no separate transform stage to time.
        t_transform = 0.0
        sf = jax.jit(lambda a: _search.search_stack(
            a, s1, cfg.mode, cfg.variant, backend=backend))
        t_search = timed(sf, 2)
    else:
        # Time the PRODUCTION transform (packed-words single pass, as
        # pipeline._match_impl runs it) — not the debug bit-plane surface:
        # descriptor_bits + pack_bits materializes (H, W, B) bool and
        # (H, W, nw, 32) uint32 intermediates (multi-GB at headline sizes)
        # that the real pipeline never allocates, so timing it would report
        # a code path production doesn't execute and can OOM where the
        # pipeline fits.
        from .config import actual_bits

        nbits = actual_bits(s0.shape[0], cfg.mode)
        tf = jax.jit(lambda s: _descriptor.descriptor_words(
            s, cfg.mode, min_words=2))
        words1 = jax.block_until_ready(tf(s1))
        t_transform = 2 * timed(tf, 1)

        sf = jax.jit(lambda a: _search.search_words(
            tf(a), words1, nbits, cfg.variant, backend=backend))
        t_search = timed(sf, 2) - t_transform / 2
    disp = jax.block_until_ready(sf(s0))

    t_agree = 0.0
    if cfg.nxcorr_threshold is not None:
        from .config import Precision

        minvar = (None if cfg.min_variance is None
                  else cfg.min_variance * s0.shape[0])
        if (backend in ("pallas", "pallas_interpret")
                and cfg.precision == Precision.SINGLE):
            from .kernels.agree import agree_pallas

            af = jax.jit(lambda a: agree_pallas(
                disp, a, s1, cfg.nxcorr_threshold, cfg.subpixel_step,
                minvar, interpret=(backend == "pallas_interpret")))
        elif cfg.subpixel_step is not None:
            af = jax.jit(lambda a: _agree.agree_subpixel(
                disp, a, s1, cfg.nxcorr_threshold, cfg.subpixel_step, minvar,
                cfg.precision))
        else:
            af = jax.jit(lambda a: _agree.agree_integer(
                disp, a, s1, cfg.nxcorr_threshold, minvar, cfg.precision))
        t_agree = timed(af, 3)

    mf = lambda a: match(a, s1, cfg, backend=backend)
    t_total = timed(mf, 4)

    return {
        "transform_ms": round(t_transform, 3),
        "search_ms": round(max(t_search, 0.0), 3),
        "agree_ms": round(t_agree, 3),
        "total_ms": round(t_total, 3),
    }


def metrics(disparity, elapsed_ms: Optional[float] = None) -> Dict:
    """Quality/throughput metrics for a disparity result."""
    disp = np.asarray(disparity)
    h, w = disp.shape[-2:]
    if np.issubdtype(disp.dtype, np.floating):
        valid = np.isfinite(disp)
    else:
        valid = disp != np.int16(-32768)
    out = {
        "height": int(h),
        "width": int(w),
        "megapixels": round(h * w / 1e6, 3),
        "valid_fraction": round(float(valid.mean()), 4),
    }
    if elapsed_ms is not None:
        out["latency_ms"] = round(elapsed_ms, 3)
        out["mp_per_s"] = round(h * w / 1e6 / (elapsed_ms / 1e3), 2)
    return out


def device_memory(device=None) -> Dict:
    """On-device memory stats (bytes). The reference headline quotes
    ~1.6 GB VRAM (README.md:90); this is the HBM-side equivalent.
    Returns {} on backends without allocator stats (e.g. CPU)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except (NotImplementedError, RuntimeError, AttributeError):
        return {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key] = int(stats[key])
    return out


def emit(d: Dict) -> str:
    """One-line JSON for log scraping."""
    s = json.dumps(d)
    print(s)
    return s
