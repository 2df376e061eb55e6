"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run anywhere (SURVEY.md section 4's multi-host simulation strategy)."""

import os

# Must be set before jax is imported anywhere. Force CPU even when the
# environment preselects a TPU platform (e.g. JAX_PLATFORMS=axon): the suite
# needs the 8-device virtual mesh, and per-shape remote TPU compiles make it
# crawl. Set BICOS_TEST_PLATFORM to override (e.g. to run on real TPU).
os.environ["JAX_PLATFORMS"] = os.environ.get("BICOS_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Strict f32 on the CPU backend: with excess precision enabled (the terminal
# environment's default), XLA CPU evaluates fused f32 regions in wider
# registers, so NXCORR values drift ulps away from the reference arithmetic
# (TPU hardware is strict f32 and unaffected).
import re as _re

# Strip ANY prior spelling (bare flag, =1, =true) — the exact-string
# replace this used to do let a bare `--xla_allow_excess_precision`
# survive and then suppressed the =false append.
flags = _re.sub(r"--xla_allow_excess_precision(=\S*)?", "", flags)
flags = (flags + " --xla_allow_excess_precision=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax

if os.environ["JAX_PLATFORMS"] == "cpu":
    # The env var can be overridden by site hooks that force-register a TPU
    # plugin (e.g. axon's sitecustomize sets jax_platforms="axon,cpu"), so
    # pin the config directly; must run before the backend initializes.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:  # pragma: no cover - older jax without the option
        pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x600DF00D)  # reference bench seed


def make_stack_pair(rng, n, h, w, dtype=np.uint8, max_disp=None):
    """Synthetic rectified projected-pattern stack pair with known disparity.

    The right stack is a column-shift of the left by a per-test disparity, so
    ground truth is known where the shift stays in-bounds.
    """
    if max_disp is None:
        max_disp = max(2, w // 8)
    hi = np.iinfo(dtype).max
    wide = w + max_disp
    pattern = rng.integers(0, hi + 1, size=(n, h, wide)).astype(dtype)
    disp = int(rng.integers(1, max_disp + 1))
    # Left sees pattern columns [disp, disp+w), right sees [0, w): a pixel at
    # left col c matches right col c+disp... i.e. disparity col0-col1 = -disp?
    # BICOS convention: d = col0 - col1, and left content at col0 equals
    # right content at col1 = col0 + disp here; flip so disparity is positive:
    left = pattern[:, :, disp : disp + w]
    right = pattern[:, :, 0:w]
    # left[c] == right[c + disp] -> col1 = col0 + disp -> d = -disp.
    # Swap to make d = +disp (left content shifted the other way):
    return np.ascontiguousarray(right), np.ascontiguousarray(left), disp


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound compile-cache memory across the suite.

    Every fresh (shape, config) jit is a new CPU executable; by the last
    modules the accumulated LLVM/XLA state reached the point where one
    more big compile SEGFAULTED the process (observed twice at the same
    suite position, 2026-08-21 — test_sharding passes in isolation). The
    open-ended fuzz soak clears caches every 50 trials for the same
    reason (tools/fuzz_soak.py); do it per test module here.
    """
    yield
    import jax

    jax.clear_caches()
