#!/usr/bin/env python
"""Device-only headline latency via chained in-program executions.

The per-call headline numbers (bench.py, probe_shard_latency.py) include a
fixed per-call cost that the shard-latency curve measures at ~29-30 ms —
dominated by the dev tunnel's dispatch+fetch RPC, which a local host does
not pay (the reference's bench loop is in-process on local hardware and
pays microseconds). This probe isolates pure device time: one program runs
the FULL headline pipeline R times in a `fori_loop` (R is a runtime
scalar, so R=1 and R=9 execute the SAME compiled program), each iteration
on a freshly perturbed left stack (the runtime dedupes identical
executions; XLA cannot hoist the pipeline either — the stacks enter
opaque Pallas kernels whose inputs change every iteration). Then

    device_ms_per_iter = (t(R=9) - t(R=1)) / 8

subtracts every fixed cost (RPC, dispatch, cache lookups) by
construction.

Env: BICOS_PROBE_H (2200), BICOS_PROBE_N/W, BICOS_PROBE_REPS (5),
BICOS_PROBE_R1/R2 (1/9), BICOS_PROBE_STAGE (e2e | search | agree —
stage-only chains give the device-only STAGE split: the per-call stage
numbers in BASELINE.md each absorb a different share of the exposed RPC
intercept, which is why they do not sum to the per-call E2E).
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(os.environ.get("BICOS_PROBE_N", "33"))
    h = int(os.environ.get("BICOS_PROBE_H", "2200"))
    w = int(os.environ.get("BICOS_PROBE_W", "3300"))
    reps = int(os.environ.get("BICOS_PROBE_REPS", "5"))
    r1 = int(os.environ.get("BICOS_PROBE_R1", "1"))
    r2 = int(os.environ.get("BICOS_PROBE_R2", "9"))

    import jax
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform} H={h}", file=sys.stderr)

    # BICOS_PROBE_VARIANT: nodupes (default) | consistency | cons_nodupes
    vname = os.environ.get("BICOS_PROBE_VARIANT", "nodupes")
    variant = {
        "nodupes": bicos.NoDuplicates(),
        "consistency": bicos.Consistency(max_lr_diff=1, no_dupes=False),
        "cons_nodupes": bicos.Consistency(max_lr_diff=1, no_dupes=True),
    }[vname]
    # BICOS_PROBE_DRANGE: "MIN:MAX" -> Config.disparity_range
    dr_env = os.environ.get("BICOS_PROBE_DRANGE", "")
    drange = None
    if dr_env:
        lo, _, hi = dr_env.partition(":")
        drange = (int(lo), int(hi))
    # BICOS_PROBE_STEP: subpixel step ("none" -> integer variant)
    step_env = os.environ.get("BICOS_PROBE_STEP", "0.1")
    step = None if step_env == "none" else float(step_env)
    cfg = bicos.Config(
        nxcorr_threshold=0.96,
        subpixel_step=step,
        min_variance=2.0,
        mode=bicos.TransformMode.LIMITED,
        variant=variant,
        disparity_range=drange,
    )

    # BICOS_PROBE_DTYPE: u8 (default) | u16
    dt = np.uint16 if os.environ.get("BICOS_PROBE_DTYPE") == "u16" else \
        np.uint8
    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=dt)
    d0 = jnp.asarray(s0)
    d1 = jnp.asarray(s1)
    jax.block_until_ready((d0, d1))

    stage = os.environ.get("BICOS_PROBE_STAGE", "e2e")
    if stage == "search":
        from libbicos_tpu import search as S

        bk = S.resolve_backend("auto")

        def step_fn(ax, b):
            disp = S.search_stack(ax, b, cfg.mode, bicos.NoDuplicates(),
                                  backend=bk)
            return jnp.where(
                disp == -32768, 0, disp)[0, :128].astype(jnp.float32).sum()
    elif stage == "agree":
        from libbicos_tpu.kernels.agree import agree_pallas

        # Fixed disparity input (the real one for this pair), perturbed
        # series: the gather windows/bases stay production-shaped while
        # every iteration's execution differs.
        from libbicos_tpu import search as S

        disp_fixed = jax.block_until_ready(S.search_stack(
            d0, d1, cfg.mode, bicos.NoDuplicates(),
            backend=S.resolve_backend("auto")))

        def step_fn(ax, b):
            # step comes from BICOS_PROBE_STEP (None = integer variant).
            # Until r5 this hard-coded 0.1 — every "integer" stage=agree
            # row before 2026-08-21 actually measured the SUBPIXEL kernel
            # (the metric name's _int tag came from cfg, not from what
            # ran); see the results_v5e.jsonl correction row.
            out, _ = agree_pallas(disp_fixed, ax, b, 0.96, step, 66.0)
            return jnp.nan_to_num(out[0, :128]).sum()
    elif stage == "bases":
        # Just the disp-dependent pre-kernel glue of the agree wrapper:
        # int16->i32, pad, per-chunk window-base computation. Isolates the
        # compose_fixed-vs-e2e gap's prime suspect.
        from libbicos_tpu import search as S
        from libbicos_tpu.kernels import agree as KA

        bk = S.resolve_backend("auto")
        disp_fixed = jax.block_until_ready(
            S.search_stack(d0, d1, cfg.mode, bicos.NoDuplicates(),
                           backend=bk))
        chunk, wcap = KA.resolve_chunk_wcap("mxu", w)

        def step_fn(ax, b):
            dd = disp_fixed ^ ax[0, 0, :1].astype(jnp.int16)  # perturb
            d32 = KA._pad2(dd.astype(jnp.int32), KA.ROW_BATCH, chunk,
                           value=KA.INVALID_I32)
            bases = KA._chunk_window_bases(
                d32, w, d32.shape[1], wcap, chunk)
            # Consume EVERY row: summing only row 0 lets XLA prune the
            # computation to one row block (a first probe run measured ~0).
            return bases.astype(jnp.float32).sum()
    elif stage == "compose":
        # Direct composition of the two stage calls — IDENTICAL work to
        # bicos.match (fresh disp, fresh bases) minus the match()/nested-jit
        # wrapper. Distinguishes wrapper overhead from stage cost.
        from libbicos_tpu import search as S
        from libbicos_tpu.kernels.agree import agree_pallas

        bk = S.resolve_backend("auto")

        def step_fn(ax, b):
            disp = S.search_stack(ax, b, cfg.mode, bicos.NoDuplicates(),
                                  backend=bk)
            out, _ = agree_pallas(disp, ax, b, 0.96, 0.1, 66.0)
            return jnp.nan_to_num(out[0, :128]).sum()
    elif stage == "compose_stale2":
        # TIMING-ONLY: the bases OPERAND is data-dependent (not constant-
        # foldable) but its VALUES equal the precomputed real bases and its
        # computation is one broadcast add — distinguishes "non-constant
        # SMEM operand costs 17 ms" from "the reduce computation does".
        from libbicos_tpu import search as S
        from libbicos_tpu.kernels import agree as KA

        bk = S.resolve_backend("auto")
        disp_fixed = jax.block_until_ready(
            S.search_stack(d0, d1, cfg.mode, bicos.NoDuplicates(),
                           backend=bk))
        chunk, wcap = KA.resolve_chunk_wcap("mxu", w)
        d32f = KA._pad2(disp_fixed.astype(jnp.int32), KA.ROW_BATCH, chunk,
                        value=KA.INVALID_I32)
        bases_fixed = jax.block_until_ready(KA._chunk_window_bases(
            d32f, w, d32f.shape[1], wcap, chunk))
        KA._chunk_window_bases = (
            lambda d32, *a, **k: bases_fixed + (d32[0, 0] & 0))

        def step_fn(ax, b):
            disp = S.search_stack(ax, b, cfg.mode, bicos.NoDuplicates(),
                                  backend=bk)
            out, _ = KA.agree_pallas(disp, ax, b, 0.96, 0.1, 66.0)
            return jnp.nan_to_num(out[0, :128]).sum()
    elif stage == "compose_stale":
        # TIMING-ONLY bisect (results are garbage): fresh disparities flow
        # into the agree kernel, but _chunk_window_bases is monkeypatched
        # to a loop-invariant constant — isolates "fresh bases/SMEM input"
        # from "fresh disp input" as the compose_fixed-vs-e2e gap's cause.
        from libbicos_tpu import search as S
        from libbicos_tpu.kernels import agree as KA

        bk = S.resolve_backend("auto")
        disp_fixed = jax.block_until_ready(
            S.search_stack(d0, d1, cfg.mode, bicos.NoDuplicates(),
                           backend=bk))
        chunk, wcap = KA.resolve_chunk_wcap("mxu", w)
        d32f = KA._pad2(disp_fixed.astype(jnp.int32), KA.ROW_BATCH, chunk,
                        value=KA.INVALID_I32)
        bases_fixed = jax.block_until_ready(KA._chunk_window_bases(
            d32f, w, d32f.shape[1], wcap, chunk))
        KA._chunk_window_bases = (
            lambda *a, **k: bases_fixed)  # timing-only patch

        def step_fn(ax, b):
            disp = S.search_stack(ax, b, cfg.mode, bicos.NoDuplicates(),
                                  backend=bk)
            out, _ = KA.agree_pallas(disp, ax, b, 0.96, 0.1, 66.0)
            return jnp.nan_to_num(out[0, :128]).sum()
    elif stage == "compose_fixed":
        # Both kernels per iteration, but agree consumes a LOOP-INVARIANT
        # disparity (the search output is kept alive through the carry, so
        # it cannot be dead-code-eliminated): isolates the cost of the
        # disp-dependent glue between the stages (pad + window bases +
        # int16->i32 + SMEM staging) from the kernels themselves.
        from libbicos_tpu import search as S
        from libbicos_tpu.kernels.agree import agree_pallas

        bk = S.resolve_backend("auto")
        disp_fixed = jax.block_until_ready(
            S.search_stack(d0, d1, cfg.mode, bicos.NoDuplicates(),
                           backend=bk))

        def step_fn(ax, b):
            disp = S.search_stack(ax, b, cfg.mode, bicos.NoDuplicates(),
                                  backend=bk)
            s_live = jnp.where(
                disp == -32768, 0, disp)[0, :128].astype(jnp.float32).sum()
            out, _ = agree_pallas(disp_fixed, ax, b, 0.96, 0.1, 66.0)
            return s_live + jnp.nan_to_num(out[0, :128]).sum()
    else:
        def step_fn(ax, b):
            out = bicos.match(ax, b, cfg)
            return jnp.nan_to_num(out[0, :128]).sum()

    # Perturbation side: XORing only the LEFT stack (the bench.py protocol)
    # degrades left-right matching — disparities scatter, more pixels go
    # invalid, and dynamic-window chunks fall back to full-width dots — so
    # it measures a HARDER workload than a real matched pair. PERTBOTH=1
    # XORs both stacks with the same value, which preserves the match
    # structure (equal temporal series stay equal) while still making every
    # execution distinct for the dedupe.
    pert_both = os.environ.get("BICOS_PROBE_PERTBOTH") == "1"

    @jax.jit
    def chained(a, b, r):
        def body(k, acc):
            kv = (k & 0xFF).astype(a.dtype)
            ax = a ^ kv
            bx = b ^ kv if pert_both else b
            return acc + step_fn(ax, bx)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(chained(d0, d1, r1))
    print(f"compile+first (R={r1}): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    perts = {}

    def pert(k):
        if k not in perts:
            # base perturbation is OUTSIDE the loop's k range (k < r2)
            perts[k] = jax.block_until_ready(d0 ^ dt(128 + k))
        return perts[k]

    def run(r):
        # untimed warm call on a perturbed base OUTSIDE the timed 1..reps
        # range (lazy-runtime setup): warming with pert(reps) would be
        # byte-identical to the k=reps timed call and the runtime dedupes
        # identical executions — the last rep would measure a cache hit.
        _ = float(chained(pert(reps + 1), d1, r))
        times = []
        for k in range(1, reps + 1):
            t0 = time.perf_counter()
            _ = float(chained(pert(k), d1, r))
            times.append((time.perf_counter() - t0) * 1e3)
        print(f"R={r} times ms: {[f'{t:.1f}' for t in times]}",
              file=sys.stderr, flush=True)
        return times

    ts_r1 = run(r1)
    ts_r2 = run(r2)
    t_r1, t_r2 = float(np.median(ts_r1)), float(np.median(ts_r2))
    per_iter = (t_r2 - t_r1) / (r2 - r1)
    overhead = t_r1 - per_iter * r1
    # Propagated endpoint spread (BASELINE.md "uncertainty band"): deltas
    # within this band are rep noise, not engine changes.
    spread = (float(np.ptp(ts_r1)) + float(np.ptp(ts_r2))) / (r2 - r1)
    vtag = "" if vname == "nodupes" else f"_{vname}"
    if drange is not None:
        vtag += f"_dr{drange[0]}_{drange[1]}"
    if step is None:
        vtag += "_int"
    print(json.dumps({
        "metric": (f"{stage}{vtag}_headline_device_only_H{h}_n{n}_w{w}"
                   + ("_u16" if dt == np.uint16 else "") + "_ms"),
        "value": round(per_iter, 2),
        "fixed_call_overhead_ms": round(overhead, 2),
        "t_r1_ms": round(t_r1, 2), "t_r2_ms": round(t_r2, 2),
        "r1": r1, "r2": r2, "slope_spread_ms": round(spread, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
