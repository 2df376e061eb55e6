#!/usr/bin/env python
"""Standalone agree-kernel probe for gather-strategy A/B on hardware.

One configuration per process (the kernel jit cache keys on shapes, not on
the BICOS_AGREE_* env knobs). Prints one JSON line with the median ms.

Env: BICOS_PROBE_N/H/W (33/2200/3300), BICOS_PROBE_STEP (0.1; "none" for
the integer variant), BICOS_PROBE_REPS (5), plus the BICOS_AGREE_* knobs
under test. Timing protocol per CLAUDE.md: perturbed inputs per rep +
scalar fetch (the axon runtime dedupes identical executions).
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
    step_s = os.environ.get("BICOS_PROBE_STEP", "0.1")
    step = None if step_s == "none" else float(step_s)
    dt_s = os.environ.get("BICOS_PROBE_DTYPE", "u8")
    dt = np.uint16 if dt_s == "u16" else np.uint8

    import jax
    import jax.numpy as jnp

    from libbicos_tpu.kernels import agree as kagree
    from libbicos_tpu.kernels.agree import agree_pallas

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform} "
          f"gather={kagree.AGREE_GATHER} group={kagree.AGREE_GROUP} "
          f"engine={kagree.AGREE_ENGINE} step={step}", file=sys.stderr)

    rng = np.random.default_rng(0x600DF00D)
    hi = int(np.iinfo(dt).max) + 1
    s0 = rng.integers(0, hi, size=(n, h, w), dtype=dt)
    s1 = rng.integers(0, hi, size=(n, h, w), dtype=dt)
    disp = rng.integers(0, 256, size=(h, w)).astype(np.int16)
    disp[rng.random((h, w)) < 0.05] = -32768
    d0 = jnp.asarray(s0)
    d1 = jnp.asarray(s1)
    dd = jnp.asarray(disp)
    jax.block_until_ready((d0, d1, dd))

    t0 = time.perf_counter()
    out = agree_pallas(dd, d0, d1, 0.96, step, 66.0)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    perts = {}

    def pert(k):
        if k not in perts:
            perts[k] = jax.block_until_ready(d0 ^ dt(k))
        return perts[k]

    for k in range(1, reps + 1):
        pert(k)
    times = []
    # Untimed warm rep on a perturbed buffer (one-off lazy-runtime setup).
    o = agree_pallas(dd, pert(reps), d1, 0.96, step, 66.0)
    _ = float(np.asarray(o[0][0, :8]).sum())
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        o = agree_pallas(dd, pert(k), d1, 0.96, step, 66.0)
        _ = float(np.asarray(o[0][0, :8]).sum())
        times.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(times))
    print(f"times ms: {[f'{t:.1f}' for t in times]}", file=sys.stderr)
    gather, _ = kagree._resolve_gather(
        n, step is not None, dt == np.uint16)
    chunk, wcap = kagree.resolve_chunk_wcap(gather, w)
    print(json.dumps({
        "probe": "agree_kernel",
        "gather": gather,
        "group": kagree.AGREE_GROUP,
        "engine": kagree.AGREE_ENGINE,
        "n": n, "h": h, "w": w,
        "step": step_s, "dtype": dt_s,
        "dynwin": wcap,  # RESOLVED window (0 = full-width dots)
        "chunk": chunk,  # RESOLVED chunk
        "ms": round(med, 2),
    }))


if __name__ == "__main__":
    main()
