"""All BICOS_AGREE_BASES implementations must be bit-identical.

The dynamic-window base arithmetic exists in three places (the XLA
formulation `_chunk_window_bases`, the standalone `_bases_kernel`, and the
in-kernel block in `_agree_kernel`) whose equivalence is an exactness
invariant of docs/TUNING.md's `BICOS_AGREE_BASES` knob — and only the
default "host" mode runs anywhere else in CI. This pins all three against
each other at a production width with a mixed in-window/fallback base
field, so a future edit to one copy cannot silently desynchronize the
others (kernel docstrings cite the measured A/B:
bench/logs/r3/probe_chained_compose_*.log).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from libbicos_tpu.kernels import agree as KA


@pytest.fixture(scope="module")
def field():
    n, h, w = 5, 16, 1408  # production width: auto dynwin engages (256/640)
    rng = np.random.default_rng(3)
    s0 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    d = (20 + 30 * np.sin(np.linspace(0, 6, w))[None, :]
         * np.ones((h, 1))).astype(np.int16)
    d[:, ::97] = 1200  # scattered pixels -> some chunks must fall back
    d[rng.random((h, w)) < 0.05] = -32768
    return d, s0, s1, w


def _bases_mix(d, w):
    chunk, wcap = KA.resolve_chunk_wcap("mxu", w)
    assert wcap, "dynwin must engage at this width"
    d32 = KA._pad2(jnp.asarray(d).astype(jnp.int32), KA.ROW_BATCH, chunk,
                   value=KA.INVALID_I32)
    bases = np.asarray(
        KA._chunk_window_bases(d32, w, d32.shape[1], wcap, chunk))
    assert (bases >= 0).any() and (bases < 0).any(), \
        "need both windowed and fallback chunks"
    return d32, chunk, wcap, bases


def test_bases_kernel_values_match_xla(field):
    d, _, _, w = field
    d32, chunk, wcap, want = _bases_mix(d, w)
    nc = d32.shape[1] // chunk
    got = np.asarray(KA._chunk_window_bases_pallas(
        d32, w, d32.shape[1], wcap, chunk, interpret=True))[:, :nc]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("step", [0.25, None])
def test_agree_output_identical_across_bases_modes(field, step, monkeypatch):
    d, s0, s1, w = field
    _bases_mix(d, w)  # asserts the field exercises both branches
    # Force the mxu gather: at this fixture's n=5 the auto resolution picks
    # 'window' (no dynamic-window bases at all), which made this test
    # vacuous — all three modes trivially ran the same window kernel.
    # 3n=15 <= 128 so the forced mxu engine engages and the bases paths
    # actually execute.
    monkeypatch.setattr(KA, "AGREE_GATHER", "mxu")
    assert KA._resolve_gather(5, bool(step), False)[0] == "mxu", \
        "forced-mxu resolution changed; bases modes would go untested again"
    outs = {}
    for mode in ("host", "pallas", "kernel"):
        monkeypatch.setattr(KA, "AGREE_BASES", mode)
        o, c = KA.agree_pallas(
            jnp.asarray(d), jnp.asarray(s0), jnp.asarray(s1),
            0.6, step, 2.0, interpret=True)
        outs[mode] = (np.asarray(o), np.asarray(c))
    for mode in ("pallas", "kernel"):
        np.testing.assert_array_equal(
            outs["host"][0], outs[mode][0], err_msg=f"disp {mode}")
        np.testing.assert_array_equal(
            outs["host"][1], outs[mode][1], err_msg=f"corr {mode}")
