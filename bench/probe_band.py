#!/usr/bin/env python
"""Single-chip band-kernel timing: fused stack ring engine vs words ring
engine, one full-width visit (H x W left band against a W-wide right band,
w1_total = W — the per-visit work one ring step does at ndev=1 scale).

Chained protocol (see probe_chained.py): R calls in one fori_loop on
perturbed inputs; slope cancels fixed costs. Env: BICOS_PROBE_ENGINE
(stack|words), BICOS_PROBE_H/N/W, BICOS_PROBE_R1/R2, BICOS_PROBE_REPS.
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
    engine = os.environ.get("BICOS_PROBE_ENGINE", "stack")

    import jax
    import jax.numpy as jnp

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair
    from libbicos_tpu import descriptor as D
    from libbicos_tpu.config import actual_bits
    from libbicos_tpu.kernels.hamming import (
        row_minima_stack_band, row_minima_words_band)

    dev = jax.devices()[0]
    print(f"device: {dev} engine={engine} H={h}", file=sys.stderr)
    mode = bicos.TransformMode.LIMITED
    nbits = actual_bits(n, mode)
    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=np.uint8)
    d0 = jnp.asarray(s0)
    d1 = jnp.asarray(s1)
    jax.block_until_ready((d0, d1))

    if engine == "stack":
        def step_fn(ax, b):
            mf, ml = row_minima_stack_band(
                ax, b, 0, mode=mode, w1_total=w, need_last=True)
            return mf[0, :128].sum() + ml[0, :128].sum()
    else:
        def step_fn(ax, b):
            wa = D.descriptor_words(ax, mode, min_words=2)
            wb = D.descriptor_words(b, mode, min_words=2)
            mf, ml = row_minima_words_band(
                wa, wb, 0, nbits=nbits, w1_total=w, need_last=True)
            return mf[0, :128].sum() + ml[0, :128].sum()

    @jax.jit
    def chained(a, b, r):
        def body(k, acc):
            kv = (k & 0xFF).astype(jnp.uint8)
            return acc + step_fn(a ^ kv, b)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(chained(d0, d1, r1))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    perts = {}

    def pert(k):
        if k not in perts:
            perts[k] = jax.block_until_ready(d0 ^ np.uint8(128 + k))
        return perts[k]

    def run(r):
        _ = float(chained(pert(reps + 1), d1, r))
        ts = []
        for k in range(1, reps + 1):
            t0 = time.perf_counter()
            _ = float(chained(pert(k), d1, r))
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"R={r}: {[f'{t:.1f}' for t in ts]}", file=sys.stderr,
              flush=True)
        return float(np.median(ts))

    t_r1, t_r2 = run(r1), run(r2)
    per = (t_r2 - t_r1) / (r2 - r1)
    print(json.dumps({
        "metric": f"band_{engine}_device_only_H{h}_n{n}_w{w}_ms",
        "value": round(per, 2), "t_r1_ms": round(t_r1, 2),
        "t_r2_ms": round(t_r2, 2), "r1": r1, "r2": r2,
    }), flush=True)


if __name__ == "__main__":
    main()
