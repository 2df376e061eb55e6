#!/usr/bin/env python
"""Measured anchor for the 8-chip H-band extrapolation.

The multi-chip claim in BASELINE.md/README divides the one-chip headline
latency by the chip count, justified by the H-band sharding being a pure
map (zero collectives, `sharding.match_sharded`). This probe replaces the
pure division with a measurement: it runs the EXACT headline program at the
per-shard row counts an 8/4/2-chip host would give each chip
(H = 2200/8 = 275, 2200/4 = 550, 2200/2 = 1100) plus the full H = 2200,
on the one real chip. Under zero-collective row sharding, every chip of an
N-chip host runs the H/N program concurrently, so the measured H/N latency
IS the host latency (plus nothing — there is no cross-chip traffic until
the host gathers the output).

Prints one JSON line per height. Env: BICOS_PROBE_HEIGHTS (comma list,
default "275,550,1100,2200"), BICOS_PROBE_N/W/REPS. Timing protocol per
CLAUDE.md: perturbed inputs per rep + scalar fetch inside the timed region
(the axon runtime dedupes identical executions and executes lazily).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(os.environ.get("BICOS_PROBE_N", "33"))
    w = int(os.environ.get("BICOS_PROBE_W", "3300"))
    reps = int(os.environ.get("BICOS_PROBE_REPS", "5"))
    heights = [int(x) for x in os.environ.get(
        "BICOS_PROBE_HEIGHTS", "275,550,1100,2200").split(",")]

    import jax
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    cfg = bicos.Config(
        nxcorr_threshold=0.96,
        subpixel_step=0.1,
        min_variance=2.0,
        mode=bicos.TransformMode.LIMITED,
    )

    # One full-height synthetic pair; each height measures on its TOP slice
    # (a real shard would hold exactly such a contiguous row band).
    s0, s1, _ = synthetic_stack_pair(n, max(heights), w, dtype=np.uint8)

    for h in heights:
        d0 = jnp.asarray(s0[:, :h])
        d1 = jnp.asarray(s1[:, :h])
        jax.block_until_ready((d0, d1))

        t0 = time.perf_counter()
        out = bicos.match(d0, d1, cfg)
        jax.block_until_ready(out)
        print(f"H={h}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

        perts = {}

        def pert(k):
            if k not in perts:
                perts[k] = jax.block_until_ready(d0 ^ np.uint8(k))
            return perts[k]

        for k in range(1, reps + 1):
            pert(k)
        # Untimed warm rep on a perturbed buffer OUTSIDE the timed 1..reps
        # range (the runtime dedupes identical executions; warming with
        # pert(reps) would turn the last timed rep into a cache hit).
        o = bicos.match(pert(reps + 1), d1, cfg)
        _ = float(np.asarray(o[0, :8]).sum())
        times = []
        for k in range(1, reps + 1):
            t0 = time.perf_counter()
            o = bicos.match(pert(k), d1, cfg)
            _ = float(np.asarray(o[0, :8]).sum())
            times.append((time.perf_counter() - t0) * 1e3)
        med = float(np.median(times))
        print(f"H={h} times ms: {[f'{t:.1f}' for t in times]}",
              file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": f"e2e_headline_H{h}_n{n}_w{w}_ms",
            "value": round(med, 2),
            "chips_equiv": max(heights) // h,
        }), flush=True)
        del perts, d0, d1, out, o


if __name__ == "__main__":
    main()
