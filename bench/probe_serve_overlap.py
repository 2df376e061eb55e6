"""Serving-throughput probe: staging/device overlap in serve.Engine.

``Engine.match`` folds batched (batch, n, H, W) requests into the row axis
OUTSIDE the device lock, so concurrent request threads overlap their host
staging (GB-scale strided copies) and result download with the device step.
This probe measures the steady-state Engine-level throughput of that design
on hardware and compares it against the device-only floor from
``BICOS_BENCH_MODE=batched`` (batch=4: 9.86 stacks/s, batch=8: 10.12 —
bench/results_v5e.jsonl 2026-08-20).

Protocol (CLAUDE.md sharp edges): every request carries a DISTINCT left
stack (the axon runtime dedupes identical executions); requests are
prebuilt before the clock starts (in real serving the body arrives over
the network — building it is not the server's work); the Engine fetches
results to numpy per request, which forces execution on lazy runtimes.

Run: ``python bench/probe_serve_overlap.py`` (env: PROBE_BATCH,
PROBE_THREADS, PROBE_REQUESTS, PROBE_N/H/W).
"""

import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "4"))
THREADS = int(os.environ.get("PROBE_THREADS", "3"))
REQUESTS = int(os.environ.get("PROBE_REQUESTS", "8"))


def main():
    import jax

    import libbicos_tpu as bicos
    from libbicos_tpu.io import synthetic_stack_pair
    from libbicos_tpu.serve import Engine

    n = int(os.environ.get("PROBE_N", "33"))
    h = int(os.environ.get("PROBE_H", "2200"))
    w = int(os.environ.get("PROBE_W", "3300"))
    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=np.uint8)
    # Same Config as the bench batched mode so the warm compile hits the
    # already-banked server-side cache for the batch program.
    cfg = bicos.Config(nxcorr_threshold=0.9, min_variance=2.0,
                      mode=bicos.TransformMode.LIMITED)
    eng = Engine(cfg, backend="auto")
    print("device:", jax.devices()[0], flush=True)

    b1 = np.stack([s1] * BATCH)
    t0 = time.perf_counter()
    eng.match(np.stack([s0] * BATCH), b1)
    print(f"warm/compile: {time.perf_counter() - t0:.1f}s", flush=True)

    reqs = [
        np.stack([s0 ^ np.uint8(k * BATCH + j + 1) for j in range(BATCH)])
        for k in range(REQUESTS)
    ]
    q = queue.Queue()
    for r in reqs:
        q.put(r)
    errors = []

    def worker():
        while True:
            try:
                r = q.get_nowait()
            except queue.Empty:
                return
            try:
                out = eng.match(r, b1)
                assert out.shape == (BATCH, h, w)
            except Exception as e:  # pragma: no cover - hardware probe
                errors.append(e)
                return

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        print(f"FAILED: {errors[0]!r}", flush=True)
        sys.exit(1)
    sps = REQUESTS * BATCH / dt
    print(
        f"serving throughput: {REQUESTS} requests x batch={BATCH} in "
        f"{dt:.2f}s = {sps:.2f} stacks/s (threads={THREADS})",
        flush=True,
    )


if __name__ == "__main__":
    main()
