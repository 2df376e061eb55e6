#!/usr/bin/env python
"""End-to-end benchmark for the TPU-native BICOS engine.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": ...}

Primary metric: end-to-end ``match`` latency for the reference README's
headline configuration (README.md:90 — two 33-image stacks, LIMITED mode,
``--threshold 0.96 --variance 2.0 --step 0.1``) at the reference *bench*
suite's synthetic resolution 3300x2200 (bench/cuda.cu:44; the real dataset is
not vendored, data/.MISSING_LARGE_BLOBS). Baseline: ~44 ms on an RTX 4090.
``vs_baseline`` > 1 means faster than the reference.

Extra per-stage numbers go to stderr; the stdout contract stays one line.

Robustness (round-2 lesson, BENCH_r02.json rc=124): the process is an
ORCHESTRATOR that runs the actual measurement in a child under a wall-clock
budget (BICOS_BENCH_BUDGET, default 560 s). A cold remote-compile of the
fused headline pipeline can exceed any fixed driver timeout; if the headline
child does not deliver its JSON inside its slice of the budget, the
orchestrator kills it and falls back to the cheaper honest fused
transform+search metric (one Pallas program instead of three), so ONE JSON
line is emitted either way. Set BICOS_BENCH_CHILD=1 to run a measurement
directly (no watchdog), which is what the orchestrator's children do.

Env overrides: BICOS_BENCH_N, BICOS_BENCH_H, BICOS_BENCH_W,
BICOS_BENCH_REPS, BICOS_BENCH_BACKEND,
BICOS_BENCH_MODE (headline|search|batched),
BICOS_BENCH_BUDGET (orchestrator wall-clock budget, seconds),
BICOS_BENCH_PLATFORM (e.g. "cpu" — pins jax_platforms before backend init;
the JAX_PLATFORMS env var alone is overridden by site hooks here).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_E2E_MS = 44.0  # README.md:90 (RTX 4090)
BASELINE_SEARCH_MP_S = 770.0  # u32 bicos_kernel_smem, BASELINE.md


def _timeit(fn, reps):
    """fn(k) -> output for perturbation index k (axon dedupes identical
    executions, so every rep must see distinct inputs); a scalar fetch
    inside the timed region forces execution (block_until_ready alone can
    return before the lazy runtime has actually run the program)."""
    import jax

    # One untimed warm rep on a PERTURBED input first: the very first
    # execution on a fresh buffer pays one-off lazy-runtime setup (~1 s
    # observed) that the compile warm-up on the original buffer does not
    # absorb.
    out = fn(reps + 1)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf[(0,) * leaf.ndim])
    times = []
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(k)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf[(0,) * leaf.ndim])
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), times


def _spawn(mode, timeout_s, extra_env=None):
    """Run one measurement child; return its stdout JSON line or None.

    The child gets its own process group so a timeout kill cannot leave a
    grandchild holding the TPU tunnel. stderr passes straight through.
    """
    env = dict(os.environ)
    env["BICOS_BENCH_CHILD"] = "1"
    env["BICOS_BENCH_MODE"] = mode
    env.update(extra_env or {})
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, start_new_session=True,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"bench: {mode} child exceeded {timeout_s:.0f}s budget; "
              "killing process group", file=sys.stderr, flush=True)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
        return None
    if proc.returncode != 0:
        print(f"bench: {mode} child exited rc={proc.returncode}",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(out.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return line
    return None


def orchestrate():
    """Budgeted driver entry: headline first, honest fallbacks after.

    Every tier's timeout is clamped to the REMAINING budget (a tier only
    runs with >50 s left) — unclamped per-tier floors could overrun a
    small BICOS_BENCH_BUDGET and reproduce the very driver-timeout-with-
    no-artifact failure this orchestrator exists to prevent.
    """
    budget = float(os.environ.get("BICOS_BENCH_BUDGET", "560"))
    mode = os.environ.get("BICOS_BENCH_MODE", "headline")
    t0 = time.monotonic()

    def remaining():
        return budget - (time.monotonic() - t0)

    # Reserve part of the budget for the fallback tiers' own backend
    # init + (smaller) compiles; the headline gets the rest. Explicit
    # non-headline modes get the whole budget and no fallback.
    reserve = min(200.0, budget * 0.4) if mode == "headline" else 0.0
    # Clamp tier 1 to the budget itself: a 45 s floor alone would overrun
    # a BICOS_BENCH_BUDGET smaller than 45 s (kill at t=45 > budget) —
    # the no-artifact-within-budget failure this orchestrator prevents.
    # The outer max(1, ...) only guards budgets below ~3 s (a former 10 s
    # inner floor could itself overrun such budgets).
    line = _spawn(mode, max(1.0, min(max(45.0, budget - reserve),
                                     budget - 2.0)))
    if line is None and mode == "headline" and remaining() > 50.0:
        print(f"bench: falling back to search mode "
              f"({remaining():.0f}s left)", file=sys.stderr, flush=True)
        line = _spawn("search", max(45.0, remaining() - 70.0))
    if line is None and mode == "headline" and remaining() > 50.0:
        # Last tier: the XLA-backend headline. No Mosaic kernels, so the
        # compile is tens of seconds even fully cold; the runtime is the
        # honest (much slower) XLA number.
        print(f"bench: falling back to XLA backend "
              f"({remaining():.0f}s left)", file=sys.stderr, flush=True)
        line = _spawn(
            "headline", max(45.0, remaining() - 5.0),
            {"BICOS_BENCH_BACKEND": "xla", "BICOS_BENCH_REPS": "2"})
    if line is None:
        # Still emit the one-line contract so the driver records an
        # honest failure instead of a timeout with no artifact.
        line = json.dumps({
            "metric": f"bench_{mode}_failed_within_budget",
            "value": 0.0, "unit": "ms", "vs_baseline": 0.0,
        })
        print(line, flush=True)
        sys.exit(4)
    print(line, flush=True)


def main():
    n = int(os.environ.get("BICOS_BENCH_N", "33"))
    h = int(os.environ.get("BICOS_BENCH_H", "2200"))
    w = int(os.environ.get("BICOS_BENCH_W", "3300"))
    reps = int(os.environ.get("BICOS_BENCH_REPS", "5"))
    backend = os.environ.get("BICOS_BENCH_BACKEND", "auto")
    mode = os.environ.get("BICOS_BENCH_MODE", "headline")

    import jax

    platform = os.environ.get("BICOS_BENCH_PLATFORM")
    if platform:
        # Must precede any backend use; site hooks override JAX_PLATFORMS.
        jax.config.update("jax_platforms", platform)

    # Backend-init watchdog: when the TPU remote-compile tunnel is down,
    # the first device query hangs indefinitely (observed 2026-08-18) —
    # fail loudly instead so the caller sees an error, not a stuck process.
    import threading

    init_timeout = float(os.environ.get("BICOS_BENCH_INIT_TIMEOUT", "300"))

    def _die():
        print("bench: backend initialization timed out "
              f"after {init_timeout:.0f}s (TPU tunnel down?)",
              file=sys.stderr, flush=True)
        os._exit(3)

    watchdog = threading.Timer(init_timeout, _die)
    watchdog.daemon = True
    watchdog.start()

    # Persistent compilation cache: repeat bench runs skip the multi-minute
    # first compile (harmless where the backend ignores it).
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair

    dev = jax.devices()[0]
    watchdog.cancel()  # backend is up; compiles may take as long as needed
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=np.uint8)
    d0 = jnp.asarray(s0)
    d1 = jnp.asarray(s1)
    jax.block_until_ready((d0, d1))

    # Distinct left stacks per timed rep (axon dedupes identical
    # executions); XORing low bits preserves the workload's character.
    _pc = {0: d0}

    def pert(k):
        if k not in _pc:
            _pc[k] = jax.block_until_ready(d0 ^ np.uint8(k))
        return _pc[k]

    if mode == "search":
        # Hamming-scan production path (vs 770 MP/s RTX 4090 anchor):
        # fused transform+search straight from the raw stacks.
        from libbicos_tpu import search as S

        cfg = bicos.Config(mode=bicos.TransformMode.LIMITED)
        bk = S.resolve_backend(backend)
        fn = jax.jit(
            lambda a, b: S.search_stack(
                a, b, cfg.mode, bicos.NoDuplicates(), backend=bk)
        )
        jax.block_until_ready(fn(d0, d1))  # compile
        for k in range(1, reps + 1):
            pert(k)
        med, times = _timeit(lambda k: fn(pert(k), d1), reps)
        mps = h * w / 1e6 / (med / 1e3)
        print(f"search times ms: {[f'{t:.1f}' for t in times]}",
              file=sys.stderr)
        print(json.dumps({
            "metric": f"bicos_search_n{n}_{w}x{h}_mps",
            "value": round(mps, 2),
            "unit": "MP/s",
            "vs_baseline": round(mps / BASELINE_SEARCH_MP_S, 4),
        }))
        return

    if mode == "batched":
        # Throughput mode: capability the reference lacks (batch folded into
        # the row axis). Reports stacks/s. Staging uploads PRE-FOLDED
        # (n, batch*H, W) rows — the serving layout — so the device never
        # pays the ~GB-scale transposed input copies that capped the batch
        # at 4 (see pipeline.match_batched_folded).
        batch = int(os.environ.get("BICOS_BENCH_BATCH", "8"))
        # BICOS_BENCH_DRANGE="MIN:MAX" measures the bounded-range
        # production contract (Config.disparity_range) — the range shrinks
        # both the search sweep and the agree windows, so ranged batching
        # is the capacity configuration (docs/DEPLOYMENT.md).
        dr_env = os.environ.get("BICOS_BENCH_DRANGE", "")
        drange = None
        if dr_env:
            lo_s, _, hi_s = dr_env.partition(":")
            drange = (int(lo_s), int(hi_s))
        cfg = bicos.Config(nxcorr_threshold=0.9, min_variance=2.0,
                           mode=bicos.TransformMode.LIMITED,
                           disparity_range=drange)
        b0 = jnp.asarray(np.concatenate([s0] * batch, axis=1))
        b1 = jnp.asarray(np.concatenate([s1] * batch, axis=1))
        jax.block_until_ready(
            bicos.match_batched_folded(b0, b1, batch, cfg, backend=backend))

        # One rotating perturbed buffer: caching reps+1 distinct perturbed
        # copies (1.9 GB each at batch=8) OOMed the 16 GB HBM from the
        # HARNESS side (measured RESOURCE_EXHAUSTED 2026-08-20). The XOR
        # runs OUTSIDE the timed region; dropping the previous buffer
        # before the next rep keeps exactly one copy live.
        def run_once(k):
            xb = jax.block_until_ready(b0 ^ np.uint8(k))
            t0 = time.perf_counter()
            out = bicos.match_batched_folded(
                xb, b1, batch, cfg, backend=backend)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(leaf[(0,) * leaf.ndim])
            dt = (time.perf_counter() - t0) * 1e3
            del out, xb
            return dt

        run_once(reps + 1)  # untimed warm rep (lazy-runtime setup)
        times = [run_once(k) for k in range(1, reps + 1)]
        med = float(np.median(times))
        sps = batch / (med / 1e3)
        print(f"batched times ms: {[f'{t:.1f}' for t in times]}",
              file=sys.stderr)
        drtag = f"_dr{drange[0]}_{drange[1]}" if drange else ""
        print(json.dumps({
            "metric": f"batched{batch}_match_n{n}_{w}x{h}{drtag}"
                      "_stacks_per_s",
            "value": round(sps, 2),
            "unit": "stacks/s",
            "vs_baseline": round(sps / 23.0, 4),  # ~23 stacks/s RTX 4090
        }))
        return

    cfg = bicos.Config(
        nxcorr_threshold=0.96,
        subpixel_step=0.1,
        min_variance=2.0,
        mode=bicos.TransformMode.LIMITED,
    )

    # Time ONE dispatch per rep: the full match plus an on-device scalar
    # reduce in a single jitted program, so the per-call number pays one
    # tunnel round trip instead of two (a separate indexed fetch is its
    # own dispatch; the dev tunnel's RTT drifts 5-15 ms per session and
    # was double-counted by the old two-dispatch loop).
    def _headline(a, b):
        disp = bicos.match(a, b, cfg, backend=backend)
        scalar = jnp.nan_to_num(disp[0, :128]).astype(jnp.float32).sum()
        valid = jnp.isfinite(disp).mean()
        return scalar, valid

    fn = jax.jit(_headline)
    t0 = time.perf_counter()
    first = jax.block_until_ready(fn(d0, d1))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # PRIMARY metric: device-only latency via the chained-executions slope
    # (bench/probe_chained.py protocol): one program runs the pipeline R
    # times on per-iteration-perturbed inputs; (t(R2) - t(R1)) / (R2 - R1)
    # cancels every fixed per-call cost by construction. This is the
    # matched comparison against the RTX 4090's 44 ms (an in-process local
    # measurement): the per-call number through the dev tunnel additionally
    # pays a 10-30 ms dispatch+fetch RTT that DRIFTS per session (r3
    # recorded 132.8 per-call at ~10 ms RTT; the same engine measured
    # 148.6 at ~28 ms the next day) — an environment constant, not engine
    # latency. The per-call median is still reported alongside.
    def _chain(a, b, r):
        def body(k, acc):
            kv = (k & 0xFF).astype(jnp.uint8)
            return acc + _headline(a ^ kv, b)[0]

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    cfn = jax.jit(_chain)
    t0 = time.perf_counter()
    _ = float(cfn(d0, d1, 2))
    print(f"chained compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    def run_chain(r):
        _ = float(cfn(pert(reps + 1), d1, r))  # warm on an off-range pert
        ts = []
        for k in range(1, reps + 1):
            t0 = time.perf_counter()
            _ = float(cfn(pert(k), d1, r))
            ts.append((time.perf_counter() - t0) * 1e3)
        return ts

    for k in range(1, reps + 2):
        pert(k)
    ts_r1, ts_r2 = run_chain(2), run_chain(8)
    t_r1, t_r2 = float(np.median(ts_r1)), float(np.median(ts_r2))
    device_ms = (t_r2 - t_r1) / 6.0
    # Endpoint stability: the slope is only as trustworthy as its two
    # endpoint medians. Propagated worst-case uncertainty = the sum of the
    # endpoints' rep spreads over (R2 - R1); round-over-round deltas inside
    # this band are noise, not wins (BASELINE.md "uncertainty band").
    slope_spread = (float(np.ptp(ts_r1)) + float(np.ptp(ts_r2))) / 6.0

    med, times = _timeit(lambda k: fn(pert(k), d1), reps)
    valid = float(first[1])
    print(f"device-only (chained slope): {device_ms:.2f} ms "
          f"(endpoint spread +-{slope_spread:.2f}); per-call "
          f"times ms: {[f'{t:.1f}' for t in times]}; "
          f"valid-pixel fraction: {valid:.3f}", file=sys.stderr)
    from libbicos_tpu.profiling import device_memory

    mem = device_memory(dev)
    if mem:  # reference anchor: ~1.6 GB VRAM (README.md:90)
        peak_gb = mem.get("peak_bytes_in_use", 0) / 2**30
        print(f"device memory: peak {peak_gb:.2f} GiB "
              f"({mem})", file=sys.stderr)

    print(json.dumps({
        "metric": f"e2e_match_n{n}_{w}x{h}_device_ms",
        "value": round(device_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_E2E_MS / device_ms, 4),
        "per_call_tunnel_ms": round(med, 2),
        "slope_spread_ms": round(slope_spread, 2),
        "slope_endpoints_ms": {"r1": round(t_r1, 2), "r2": round(t_r2, 2)},
    }))


if __name__ == "__main__":
    if os.environ.get("BICOS_BENCH_CHILD"):
        main()
    else:
        orchestrate()
