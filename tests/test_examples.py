"""The shipped examples must stay runnable — run each as a real subprocess
on the virtual CPU mesh and check its self-reported invariants.

(The reference ships runnable-but-unasserted scripts, ``test_.py:1-31``; here
the examples double as integration tests.)
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script, *args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO), env.get("PYTHONPATH")) if p
    )
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    return proc.stdout


def test_quickstart(tmp_path):
    out = _run("quickstart.py", str(tmp_path))
    assert "valid:" in out
    for artifact in ("disparity.png", "disparity.tiff", "corrmap.png",
                     "cloud.xyz"):
        assert (tmp_path / artifact).exists(), (artifact, out)
    # The synthetic scene has known ground truth; the example reports the
    # max abs error on the valid interior — exact integer+subpixel match
    # tolerance is asserted loosely here (the example prints e.g. 0.25).
    err = float(out.split("max |err| on valid interior:")[1].split()[0])
    assert err <= 1.0, out


def test_scale_out():
    out = _run("scale_out.py")
    assert "sharded == single-device: True" in out
    assert "pair0 matches: True" in out
    assert "batched+sharded matches batched: True" in out


def test_serving():
    out = _run("serving.py")
    assert "daemon ready" in out
    assert "ground-truth agreement" in out
    agree = float(out.split("ground-truth agreement ")[1].split("%")[0])
    # NXCORR-thresholded synthetic scene: a small fraction of
    # pattern-ambiguous pixels legitimately mismatch ground truth.
    assert agree >= 97.0, out
