"""Driver contract for bench.py: exactly one JSON line on stdout with the
metric/value/unit/vs_baseline keys, in every mode, on tiny CPU shapes."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench(mode):
    env = dict(os.environ)
    env.update({
        "BICOS_BENCH_PLATFORM": "cpu",
        "BICOS_BENCH_MODE": mode,
        "BICOS_BENCH_N": "5",
        "BICOS_BENCH_H": "16",
        "BICOS_BENCH_W": "32",
        "BICOS_BENCH_REPS": "2",
        "BICOS_BENCH_BACKEND": "xla",
        "BICOS_BENCH_BATCH": "2",
    })
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO), env.get("PYTHONPATH")) if p
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout, proc.stderr


@pytest.mark.parametrize("mode", ["headline", "search", "batched"])
def test_bench_prints_one_json_line(mode):
    out, err = _run_bench(mode)
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {out!r}"
    rec = json.loads(lines[0])
    # The driver contract requires metric/value/unit/vs_baseline; extra
    # diagnostic fields (per_call_tunnel_ms) are allowed.
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec), rec
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
