#!/usr/bin/env python
"""Per-stage + integration benchmark suite.

Mirrors the reference's Google-Benchmark suite (``/root/reference/bench/
cuda.cu``): descriptor-transform, Hamming-scan and agree microbenches at the
synthetic 3300x2200 resolution (bench/cuda.cu:44), plus ``bench_integration``
over n in {6, 8, 12, 16} x subpixel step in {0, .25, .20, .15, .10}
(bench/cuda.cu:297-323,397-401) on synthetic projected-pattern stacks (the
real dataset is not vendored upstream). Seed 0x600DF00D preserved
(bench/cuda.cu:39).

Measurement protocol (this environment): executions with identical inputs
can be deduped by the runtime, so every timed iteration perturbs its input
and fetches a result scalar.

Output: one JSON object per line on stdout. Run everything:
    python bench/suite.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def _fetch(out):
    import jax

    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * leaf.ndim
    return float(np.asarray(leaf[idx]).reshape(()))


def timeit(fn, make_args, reps):
    """min-of-reps ms; make_args(k) must return fresh (perturbed) inputs."""
    fn(*make_args(0))  # compile
    _fetch(fn(*make_args(1)))
    ts = []
    for k in range(reps):
        args = make_args(k + 2)
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


ONLY = None  # --only substring filter


def want(name: str) -> bool:
    return ONLY is None or ONLY in name


def emit(name, ms, extra=None):
    rec = {"bench": name, "ms": round(ms, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def bench(name, fn, make_args, reps, mp):
    """Gate on --only, then time and emit one row."""
    if not want(name):
        return
    ms = timeit(fn, make_args, reps)
    emit(name, ms, {"mp_per_s": round(mp / (ms / 1e3), 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CI smoke)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--only", default=None,
                    help="Run only benches whose name contains this "
                    "substring (resume/focus filter).")
    ap.add_argument("--platform", default=None,
                    help="Pin the jax platform (e.g. 'cpu'); --quick "
                    "defaults to cpu so smoke runs never contend for the "
                    "TPU tunnel (site hooks override JAX_PLATFORMS, so the "
                    "pin must happen via jax.config before backend init).")
    args = ap.parse_args()
    global ONLY
    ONLY = args.only

    import jax

    platform = args.platform or ("cpu" if args.quick else None)
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu import agree as A
    from libbicos_tpu import descriptor as D
    from libbicos_tpu import search as S
    from libbicos_tpu.config import Precision, TransformMode
    from libbicos_tpu.io import synthetic_stack_pair

    h = args.height or (128 if args.quick else 2200)
    w = args.width or (256 if args.quick else 3300)
    reps = args.reps
    backend = S.resolve_backend("auto")
    print(f"# device={jax.devices()[0]} backend={backend} {w}x{h}",
          file=sys.stderr)

    mp = h * w / 1e6

    # --- descriptor transform (bench/cuda.cu:258-295 analogue) ----------
    for n, mode in [(10, TransformMode.LIMITED), (33, TransformMode.LIMITED),
                    (10, TransformMode.FULL)]:
        s0, _, _ = synthetic_stack_pair(n, h, w)
        d0 = jnp.asarray(s0)
        tf = jax.jit(lambda s, m=mode: D.descriptor_words(s, m))
        bench(f"transform_{mode.name.lower()}_n{n}", tf,
              lambda k: (d0 ^ np.uint8(k),), reps, mp)
        if backend == "pallas":
            from libbicos_tpu.kernels.transform import descriptor_words_pallas

            tfk = lambda s, m=mode: descriptor_words_pallas(s, m)
            bench(f"transform_kernel_{mode.name.lower()}_n{n}", tfk,
                  lambda k: (d0 ^ np.uint8(k),), reps, mp)

    # --- Hamming scan (bench/cuda.cu:192-256 analogue) -------------------
    # Production path: fused transform+search straight from raw stacks
    # (kernels/hamming.py); the transform rides inside the kernel, so these
    # rows are comparable to the reference's transform+bicos kernel pair.
    from libbicos_tpu.config import actual_bits

    for n, mode in [(10, TransformMode.LIMITED), (33, TransformMode.LIMITED),
                    (16, TransformMode.FULL)]:
        s0, s1, _ = synthetic_stack_pair(n, h, w)
        d0, d1 = jnp.asarray(s0), jnp.asarray(s1)
        nbits = actual_bits(n, mode)

        def pert(k):
            return (jax.block_until_ready(d0 ^ np.uint8(k)), d1)

        nd = jax.jit(lambda a, b, m=mode: S.search_stack(
            a, b, m, bicos.NoDuplicates(), backend=backend))
        bench(f"search_nodupes_{mode.name.lower()}_n{n}_b{nbits}", nd,
              pert, reps, mp)
        cons = jax.jit(lambda a, b, m=mode: S.search_stack(
            a, b, m, bicos.Consistency(max_lr_diff=1, no_dupes=False),
            backend=backend))
        bench(f"search_consistency_{mode.name.lower()}_n{n}_b{nbits}",
              cons, pert, reps, mp)

    # --- agree (bench/cuda.cu:99-180 analogue) ---------------------------
    n = 10
    s0, s1, _ = synthetic_stack_pair(n, h, w)
    d0, d1 = jnp.asarray(s0), jnp.asarray(s1)
    tf = jax.jit(lambda s: D.descriptor_bits(s, TransformMode.LIMITED))
    srch = jax.jit(lambda a, b: S.search(a, b, bicos.NoDuplicates(),
                                         backend=backend))
    disp = jax.block_until_ready(srch(tf(d0), tf(d1)))
    if backend == "pallas":
        from libbicos_tpu.kernels.agree import agree_pallas

        ai = lambda d, a, b: agree_pallas(d, a, b, 0.9, None, 2.0 * n)
        asp = lambda d, a, b: agree_pallas(d, a, b, 0.9, 0.25, 2.0 * n)
    else:
        ai = jax.jit(lambda d, a, b: A.agree_integer(
            d, a, b, 0.9, 2.0 * n, Precision.SINGLE))
        asp = jax.jit(lambda d, a, b: A.agree_subpixel(
            d, a, b, 0.9, 0.25, 2.0 * n, Precision.SINGLE))
    bench(f"agree_integer_n{n}", ai,
          lambda k: (disp, jax.block_until_ready(d0 ^ np.uint8(k)), d1),
          reps, mp)
    bench(f"agree_subpixel_n{n}_step0.25", asp,
          lambda k: (disp, jax.block_until_ready(d0 ^ np.uint8(k)), d1),
          reps, mp)

    # --- agree u16 (bench/cuda.cu:99-180 runs TInput in {u8, u16}) --------
    s0w, s1w, _ = synthetic_stack_pair(n, h, w, dtype=np.uint16)
    d0w, d1w = jnp.asarray(s0w), jnp.asarray(s1w)
    dispw = jax.block_until_ready(
        srch(tf(jnp.asarray((np.asarray(s0w) >> 8).astype(np.uint8))),
             tf(jnp.asarray((np.asarray(s1w) >> 8).astype(np.uint8)))))
    if backend == "pallas":
        aiw = lambda d, a, b: agree_pallas(d, a, b, 0.9, None, 2.0 * n)
        aspw = lambda d, a, b: agree_pallas(d, a, b, 0.9, 0.25, 2.0 * n)
    else:
        aiw = jax.jit(lambda d, a, b: A.agree_integer(
            d, a, b, 0.9, 2.0 * n, Precision.SINGLE))
        aspw = jax.jit(lambda d, a, b: A.agree_subpixel(
            d, a, b, 0.9, 0.25, 2.0 * n, Precision.SINGLE))
    bench(f"agree_integer_u16_n{n}", aiw,
          lambda k: (dispw, jax.block_until_ready(d0w ^ np.uint16(k)), d1w),
          reps, mp)
    bench(f"agree_subpixel_u16_n{n}_step0.25", aspw,
          lambda k: (dispw, jax.block_until_ready(d0w ^ np.uint16(k)), d1w),
          reps, mp)

    # --- nxcorr subroutine (bench/cuda.cu:46-77 analogue) -----------------
    # The reference times a single nxcorr evaluation over an n=50 series in
    # f32/f64 x {PLAIN, MINVAR}; here the equivalent is the vectorized
    # nxcorr over a full image of series (per-element cost is what matters).
    from libbicos_tpu.agree import _compute_dtype, _nxcorr_from, _stats

    def nxcorr_image(a, b, minvar, precision):
        dt = _compute_dtype(precision)
        af = a.astype(dt)
        _, diff0, var0 = _stats(af, dt)
        return _nxcorr_from(diff0, var0, b.astype(dt), minvar, dt)

    nn = 50
    sa = jnp.asarray(
        np.random.default_rng(0x600DF00D).integers(
            0, 256, size=(nn, h, w), dtype=np.uint8))
    sb = jnp.asarray(
        np.random.default_rng(0xBADC0DE).integers(
            0, 256, size=(nn, h, w), dtype=np.uint8))
    import contextlib

    for prec, tag in ((Precision.SINGLE, "f32"), (Precision.DOUBLE, "f64")):
        for minvar, vtag in ((None, "plain"), (2.0 * nn, "minvar")):
            if not want(f"nxcorr_{tag}_{vtag}_n{nn}"):
                continue
            ctx = (jax.enable_x64(True) if prec == Precision.DOUBLE
                   else contextlib.nullcontext())
            with ctx:
                fnx = jax.jit(lambda a, b, mv=minvar, p=prec: nxcorr_image(
                    a, b, mv, p))
                try:
                    ms = timeit(
                        fnx,
                        lambda k: (jax.block_until_ready(sa ^ np.uint8(k)),
                                   sb),
                        reps)
                except Exception as e:  # pragma: no cover - f64 on TPU
                    print(f"# nxcorr_{tag}_{vtag} skipped: {e}",
                          file=sys.stderr)
                    continue
            emit(f"nxcorr_{tag}_{vtag}_n{nn}", ms,
                 {"mp_per_s": round(mp / (ms / 1e3), 1)})

    # --- integration (bench/cuda.cu:297-323 analogue) --------------------
    steps = [0] if args.quick else [0, 0.25, 0.10]
    for n in ([6] if args.quick else [6, 8, 12, 16]):
        s0, s1, _ = synthetic_stack_pair(n, h, w)
        d0, d1 = jnp.asarray(s0), jnp.asarray(s1)
        for step in steps:
            cfg = bicos.Config(
                nxcorr_threshold=0.9,
                subpixel_step=step or None,
                mode=TransformMode.FULL,
            )
            fn = lambda a, b, c=cfg: bicos.match(a, b, c, backend=backend)
            bench(f"integration_n{n}_step{step}", fn,
                  lambda k: (jax.block_until_ready(d0 ^ np.uint8(k)), d1),
                  reps, mp)

    # --- u16 integration (VERDICT r4 task 6: the u16 path is validated
    # bit-identical on hardware but had no production-scale latency row;
    # reference microbenches cover u16, bench/cuda.cu:99-180). Headline
    # LIMITED n=33 and a FULL n=12 row.
    for n, mode, step in ([(6, TransformMode.FULL, 0)] if args.quick else
                          [(33, TransformMode.LIMITED, 0.1),
                           (33, TransformMode.LIMITED, 0),
                           (12, TransformMode.FULL, 0)]):
        name = (f"integration_u16_n{n}_"
                f"{'limited' if mode == TransformMode.LIMITED else 'full'}"
                f"_step{step}")
        if not want(name):
            continue
        s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=np.uint16)
        d0, d1 = jnp.asarray(s0), jnp.asarray(s1)
        cfg = bicos.Config(
            nxcorr_threshold=0.96 if n == 33 else 0.9,
            subpixel_step=step or None,
            min_variance=2.0 if n == 33 else None,
            mode=mode,
        )
        fn = lambda a, b, c=cfg: bicos.match(a, b, c, backend=backend)
        bench(name, fn,
              lambda k: (jax.block_until_ready(d0 ^ np.uint16(k)), d1),
              reps, mp)


if __name__ == "__main__":
    main()
