#!/usr/bin/env python
"""Standalone fused-search probe (NoDuplicates or Consistency) on hardware.

One configuration per process. Prints one JSON line with the median ms.
Env: BICOS_PROBE_N/H/W (33/2200/3300), BICOS_PROBE_VARIANT
(nodupes|consistency|consistency_nodupes), BICOS_PROBE_MODE (limited|full),
BICOS_PROBE_REPS (5). Timing protocol per CLAUDE.md (perturbed inputs +
scalar fetch).
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
    var_s = os.environ.get("BICOS_PROBE_VARIANT", "consistency")
    mode_s = os.environ.get("BICOS_PROBE_MODE", "limited")

    import jax
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu import search as S

    mode = (bicos.TransformMode.LIMITED if mode_s == "limited"
            else bicos.TransformMode.FULL)
    variant = {
        "nodupes": bicos.NoDuplicates(),
        "consistency": bicos.Consistency(max_lr_diff=1, no_dupes=False),
        "consistency_nodupes": bicos.Consistency(max_lr_diff=1,
                                                 no_dupes=True),
    }[var_s]

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform} variant={var_s} "
          f"mode={mode_s}", file=sys.stderr)

    rng = np.random.default_rng(0x600DF00D)
    s0 = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    d0 = jnp.asarray(s0)
    d1 = jnp.asarray(s1)
    jax.block_until_ready((d0, d1))

    backend = S.resolve_backend("auto")
    fn = jax.jit(lambda a, b: S.search_stack(a, b, mode, variant,
                                             backend=backend))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(d0, d1))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    perts = {}

    def pert(k):
        if k not in perts:
            perts[k] = jax.block_until_ready(d0 ^ np.uint8(k))
        return perts[k]

    for k in range(1, reps + 2):
        pert(k)
    o = fn(pert(reps + 1), d1)
    _ = int(np.asarray(o[0, :8]).sum())
    times = []
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        o = fn(pert(k), d1)
        _ = int(np.asarray(o[0, :8]).sum())
        times.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(times))
    print(f"times ms: {[f'{t:.1f}' for t in times]}", file=sys.stderr)
    print(json.dumps({
        "probe": "fused_search", "variant": var_s, "mode": mode_s,
        "n": n, "h": h, "w": w, "ms": round(med, 2),
    }))


if __name__ == "__main__":
    main()
