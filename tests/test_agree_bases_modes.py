"""Dynamic-window (BICOS_AGREE_DYNWIN opt-in) exactness invariants.

Since round 4 the dynamic window is OFF by default (its round-3 advantage
was a constant-bases measurement artifact; see
``kernels/agree.resolve_chunk_wcap``), but the machinery remains an opt-in
and every implementation of the base arithmetic must stay bit-identical:
the XLA formulation ``_chunk_window_bases``, the standalone
``_bases_kernel``, the in-kernel block in ``_agree_kernel``
(``BICOS_AGREE_BASES``), AND the search-kernel epilogue emission
(``search.search_stack_nodupes_with_bases``). The window control
structures (``BICOS_AGREE_WINDOW`` branch/deferred) must likewise agree
bit-for-bit. This pins all of them against each other at a production
width with a mixed in-window/fallback base field.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from libbicos_tpu.kernels import agree as KA


@pytest.fixture(scope="module")
def field():
    n, h, w = 5, 16, 1408  # production width: dynwin 256/640 engages
    rng = np.random.default_rng(3)
    s0 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    d = (20 + 30 * np.sin(np.linspace(0, 6, w))[None, :]
         * np.ones((h, 1))).astype(np.int16)
    d[:, ::97] = 1200  # scattered pixels -> some chunks must fall back
    d[rng.random((h, w)) < 0.05] = -32768
    return d, s0, s1, w


@pytest.fixture(autouse=True)
def dynwin_on(monkeypatch):
    """Opt into the dynamic window (off by default since r4)."""
    monkeypatch.setattr(KA, "AGREE_DYNWIN", 640)


def _bases_mix(d, w):
    chunk, wcap = KA.resolve_chunk_wcap("mxu", w)
    assert wcap, "dynwin must engage under the opt-in"
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


def test_search_kernel_bases_match_xla(field):
    """The fused search kernel's epilogue emission
    (search.search_stack_nodupes_with_bases) must produce the exact
    _chunk_window_bases values for ITS OWN disparity output — the
    NoDuplicates keep mask is first==last and a kept pixel's matched
    column is the first argmin, so the two formulations are algebraically
    identical; this pins them against drift."""
    import libbicos_tpu as bicos
    from libbicos_tpu import search as S
    from libbicos_tpu.io import synthetic_stack_pair

    n, h, w = 12, 16, 1408
    s0, s1, _ = synthetic_stack_pair(n, h, w, dtype=np.uint8)
    chunk, wcap = KA.resolve_chunk_wcap("mxu", w)
    wp = w + ((-w) % chunk)
    disp, bases = S.search_stack_nodupes_with_bases(
        jnp.asarray(s0), jnp.asarray(s1), bicos.TransformMode.LIMITED,
        chunk=chunk, wcap=wcap, wp=wp, backend="pallas_interpret")
    assert bases is not None
    want_disp = S.search_stack(
        jnp.asarray(s0), jnp.asarray(s1), bicos.TransformMode.LIMITED,
        bicos.NoDuplicates(), backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(disp), np.asarray(want_disp))
    d32 = KA._pad2(jnp.asarray(disp).astype(jnp.int32), KA.ROW_BATCH,
                   chunk, value=KA.INVALID_I32)
    want = np.asarray(KA._chunk_window_bases(d32, w, wp, wcap, chunk))
    np.testing.assert_array_equal(np.asarray(bases), want)


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


@pytest.mark.parametrize("step", [0.25, None])
def test_agree_output_identical_across_window_modes(field, step, monkeypatch):
    """branch (default) vs deferred window control structures: bit-equal
    on a mixed windowed/fallback field (the deferred repair loop must redo
    exactly the base<0 chunks)."""
    d, s0, s1, w = field
    _bases_mix(d, w)
    monkeypatch.setattr(KA, "AGREE_GATHER", "mxu")
    outs = {}
    for mode in ("branch", "deferred"):
        monkeypatch.setattr(KA, "AGREE_WINDOW", mode)
        o, c = KA.agree_pallas(
            jnp.asarray(d), jnp.asarray(s0), jnp.asarray(s1),
            0.6, step, 2.0, interpret=True)
        outs[mode] = (np.asarray(o), np.asarray(c))
    np.testing.assert_array_equal(outs["branch"][0], outs["deferred"][0])
    np.testing.assert_array_equal(outs["branch"][1], outs["deferred"][1])


@pytest.mark.parametrize("step", [0.25, None])
def test_agree_ext_bases_identical(field, step, monkeypatch):
    """Passing precomputed (search-kernel-style) bases through
    agree_pallas(bases=...) must be bit-identical to the wrapper computing
    them itself."""
    d, s0, s1, w = field
    d32, chunk, wcap, bases = _bases_mix(d, w)
    monkeypatch.setattr(KA, "AGREE_GATHER", "mxu")
    want = KA.agree_pallas(
        jnp.asarray(d), jnp.asarray(s0), jnp.asarray(s1),
        0.6, step, 2.0, interpret=True)
    got = KA.agree_pallas(
        jnp.asarray(d), jnp.asarray(s0), jnp.asarray(s1),
        0.6, step, 2.0, interpret=True, bases=jnp.asarray(bases))
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))
