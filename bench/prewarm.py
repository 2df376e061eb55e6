#!/usr/bin/env python
"""Prewarm manifest: compile every shipped program, in order, one command.

Cold remote compiles of the full pipeline are the single biggest
operational risk on this backend (measured: the headline program compiled
in 174 s at 10:24 and failed to finish in 1500 s at 10:31 the same day;
the ranged Consistency program measured 437 s cold — BASELINE.md,
CLAUDE.md item 3). The compile cache is keyed on the exact program bytes
(source-location metadata included), so the ONLY reliable mitigation is
to compile the exact final source once, ahead of need, for every shipped
configuration. This module is that discipline as a command:

    python -m bench.prewarm                 # warm everything, in order
    python -m bench.prewarm --list          # show the manifest
    python -m bench.prewarm --only headline_driver,ranged_consistency
    python -m bench.prewarm --timeout 1800  # per-entry ceiling (seconds)

Each entry runs in its own child process (a hung compile is killed at the
per-entry timeout and reported; later entries still run) and prints one
JSON line ``{"prewarm": name, "ok": ..., "seconds": ...}``. The parent
exits non-zero if any entry failed. Entries warm BOTH caches that matter:
the axon server-side cache (persists across processes and days; hit by
the driver's ``python bench.py`` and by ``serve``) and the local
persistent jax cache (``.jax_cache``, effective on non-tunnel backends).

Manifest order = risk order: the driver's own bench program first, then
the 437 s ranged-Consistency program, then the remaining shipped configs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (description, default per-entry timeout seconds)
MANIFEST = [
    ("headline_driver",
     "python bench.py headline mode — the EXACT driver-protocol programs "
     "(outer-jit match+reduce and the chained fori program)", 900),
    ("ranged_consistency",
     "library match(): Consistency(max_lr_diff=1, no_dupes=True) + "
     "disparity_range (0, 511), subpixel 0.1 — the 437 s cold-compile "
     "program", 1200),
    ("headline_lib",
     "library match(): NoDuplicates full scan, subpixel 0.1 (the "
     "CLI/serve per-call program)", 900),
    ("ranged_nodupes",
     "library match(): NoDuplicates + disparity_range (0, 511), "
     "subpixel 0.1", 600),
    ("batched",
     "match_batched_folded batch=8, threshold 0.9, integer agree (the "
     "throughput/serving program)", 900),
    ("batched_ranged",
     "match_batched_folded batch=8 + disparity_range (0, 511)", 900),
    ("u16",
     "library match(): u16 inputs, NoDuplicates full scan, subpixel 0.1",
     900),
]


def _child_env():
    env = dict(os.environ)
    env.setdefault("BICOS_PREWARM_N", env.get("BICOS_BENCH_N", "33"))
    env.setdefault("BICOS_PREWARM_H", env.get("BICOS_BENCH_H", "2200"))
    env.setdefault("BICOS_PREWARM_W", env.get("BICOS_BENCH_W", "3300"))
    return env


def run_entry(name: str) -> None:
    """Child body: build + compile one manifest entry's program."""
    n = int(os.environ.get("BICOS_PREWARM_N", "33"))
    h = int(os.environ.get("BICOS_PREWARM_H", "2200"))
    w = int(os.environ.get("BICOS_PREWARM_W", "3300"))

    import jax

    platform = os.environ.get("BICOS_PREWARM_PLATFORM")
    if platform:
        # Must precede any backend use; site hooks override JAX_PLATFORMS.
        jax.config.update("jax_platforms", platform)

    try:  # persistent local cache (harmless where the backend ignores it)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair

    dt = np.uint16 if name == "u16" else np.uint8
    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=dt)
    d0, d1 = jnp.asarray(s0), jnp.asarray(s1)
    jax.block_until_ready((d0, d1))

    def headline_cfg(**kw):
        return bicos.Config(
            nxcorr_threshold=0.96, subpixel_step=0.1, min_variance=2.0,
            mode=bicos.TransformMode.LIMITED, **kw)

    if name == "ranged_consistency":
        cfg = headline_cfg(
            variant=bicos.Consistency(max_lr_diff=1, no_dupes=True),
            disparity_range=(0, 511))
        out = bicos.match(d0, d1, cfg)
    elif name == "headline_lib" or name == "u16":
        out = bicos.match(d0, d1, headline_cfg())
    elif name == "ranged_nodupes":
        out = bicos.match(d0, d1, headline_cfg(disparity_range=(0, 511)))
    elif name in ("batched", "batched_ranged"):
        batch = int(os.environ.get("BICOS_PREWARM_BATCH", "8"))
        cfg = bicos.Config(
            nxcorr_threshold=0.9, min_variance=2.0,
            mode=bicos.TransformMode.LIMITED,
            disparity_range=(0, 511) if name == "batched_ranged" else None)
        b0 = jnp.asarray(np.concatenate([s0] * batch, axis=1))
        b1 = jnp.asarray(np.concatenate([s1] * batch, axis=1))
        out = bicos.match_batched_folded(b0, b1, batch, cfg)
    else:
        raise SystemExit(f"unknown prewarm entry {name!r}")
    jax.block_until_ready(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m bench.prewarm", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--list", action="store_true",
                    help="print the manifest and exit")
    ap.add_argument("--only", default="",
                    help="comma-separated entry names (default: all)")
    ap.add_argument("--timeout", type=float, default=0.0,
                    help="override per-entry timeout (seconds)")
    ap.add_argument("--child", default="", help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child:
        run_entry(args.child)
        return 0

    names = {e[0] for e in MANIFEST}
    if args.list:
        for name, desc, tmo in MANIFEST:
            print(f"{name:20s} [{tmo:4.0f}s] {desc}")
        return 0
    only = [s for s in args.only.split(",") if s]
    for s in only:
        if s not in names:
            ap.error(f"unknown entry {s!r} (see --list)")

    failures = 0
    for name, desc, tmo in MANIFEST:
        if only and name not in only:
            continue
        tmo = args.timeout or tmo
        t0 = time.time()
        if name == "headline_driver":
            cmd = [sys.executable, os.path.join(_REPO, "bench.py")]
            env = dict(_child_env(), BICOS_BENCH_REPS="2",
                       BICOS_BENCH_BUDGET=str(tmo - 5.0))
        else:
            cmd = [sys.executable, "-m", "bench.prewarm", "--child", name]
            env = _child_env()
        proc = subprocess.Popen(cmd, env=env, cwd=_REPO,
                                start_new_session=True)
        try:
            rc = proc.wait(timeout=tmo)
        except subprocess.TimeoutExpired:
            import signal

            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            rc = -9
        dt_s = time.time() - t0
        ok = rc == 0
        failures += 0 if ok else 1
        print(json.dumps({"prewarm": name, "ok": ok, "rc": rc,
                          "seconds": round(dt_s, 1)}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
