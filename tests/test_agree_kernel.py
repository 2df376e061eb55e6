"""Fused Pallas agree kernel: parity with the oracle / XLA path.

Correlation values are compared to within a few ulps: the kernel contracts
multiply-add chains into fmas exactly like the reference's CUDA backend
(``__fma_rn``, agree.cuh:67-97), while the oracle transcription rounds the
product separately — the reference's own CPU and CUDA backends differ from
each other the same way. Validity decisions and disparities must match
exactly (threshold ties at 1-ulp resolution don't occur on the seeded data).
"""

import numpy as np
import pytest

from libbicos_tpu import NoDuplicates, TransformMode
from libbicos_tpu import _oracle as oracle
from libbicos_tpu import agree as xagree
from libbicos_tpu.kernels.agree import agree_pallas

CORR_TOL = dict(rtol=4e-6, atol=4e-6)


def _assert_corr_close(got, want):
    got = np.asarray(got)
    want = np.asarray(want)
    assert ((np.isnan(got)) == (np.isnan(want))).all()
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], **CORR_TOL)


def _disp_for(rng, n, h, w, dtype=np.uint8):
    from conftest import make_stack_pair

    s0, s1, _ = make_stack_pair(rng, n, h, w, dtype)
    from libbicos_tpu import descriptor, search

    b0 = descriptor.descriptor_bits(s0, TransformMode.LIMITED)
    b1 = descriptor.descriptor_bits(s1, TransformMode.LIMITED)
    disp = np.asarray(search.search(b0, b1, NoDuplicates(), backend="xla"))
    return s0, s1, disp


@pytest.mark.parametrize("minvar", [None, 20.0])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_agree_kernel_integer(rng, minvar, dtype):
    s0, s1, disp = _disp_for(rng, 7, 5, 40, dtype)
    out, corr = agree_pallas(disp, s0, s1, 0.5, None, minvar, interpret=True)
    want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, minvar)
    out = np.asarray(out)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)
    _assert_corr_close(corr, want_c)


@pytest.mark.parametrize("step", [0.5, 0.25])
def test_agree_kernel_subpixel(rng, step):
    s0, s1, disp = _disp_for(rng, 6, 4, 40)
    out, corr = agree_pallas(disp, s0, s1, 0.5, step, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, 0.5, step, None, np.uint8
    )
    out = np.asarray(out)
    assert (np.isnan(out) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(out[m], want_d[m])
    _assert_corr_close(corr, want_c)


def test_agree_kernel_subpixel_minvar_u16(rng):
    s0, s1, disp = _disp_for(rng, 5, 3, 36, np.uint16)
    mv = 50.0 * 5
    out, corr = agree_pallas(disp, s0, s1, 0.7, 0.5, mv, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, 0.7, 0.5, mv, np.uint16
    )
    out = np.asarray(out)
    assert (np.isnan(out) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(out[m], want_d[m])
    _assert_corr_close(corr, want_c)


def test_agree_kernel_matches_xla_path(rng):
    """Cross-check against the XLA agree (already oracle-pinned)."""
    s0, s1, disp = _disp_for(rng, 8, 6, 48)
    out, corr = agree_pallas(disp, s0, s1, 0.6, 0.5, 2.0 * 8, interpret=True)
    want_out, want_corr = xagree.agree_subpixel(
        disp, s0, s1, 0.6, 0.5, 2.0 * 8
    )
    out = np.asarray(out)
    want_out = np.asarray(want_out)
    assert (np.isnan(out) == np.isnan(want_out)).all()
    m = ~np.isnan(want_out)
    np.testing.assert_array_equal(out[m], want_out[m])
    _assert_corr_close(corr, want_corr)


def test_pipeline_pallas_agree_integration(rng):
    """match() with backend=pallas_interpret (search + agree kernels fused)
    must agree with the XLA backend: identical validity, disparities exact,
    corr within fma tolerance."""
    from conftest import make_stack_pair

    import libbicos_tpu as bicos

    s0, s1, _ = make_stack_pair(rng, 6, 4, 40)
    for cfg in (
        bicos.Config(nxcorr_threshold=0.5, min_variance=1.0),
        bicos.Config(nxcorr_threshold=0.6, subpixel_step=0.25),
        bicos.Config(nxcorr_threshold=0.5,
                     variant=bicos.Consistency(max_lr_diff=1, no_dupes=True)),
    ):
        want_d, want_c = bicos.match(s0, s1, cfg, corrmap=True, backend="xla")
        got_d, got_c = bicos.match(s0, s1, cfg, corrmap=True,
                                   backend="pallas_interpret")
        want_d = np.asarray(want_d)
        got_d = np.asarray(got_d)
        if want_d.dtype == np.int16:
            np.testing.assert_array_equal(got_d, want_d)
        else:
            assert (np.isnan(got_d) == np.isnan(want_d)).all()
            m = ~np.isnan(want_d)
            np.testing.assert_array_equal(got_d[m], want_d[m])
        _assert_corr_close(got_c, want_c)


def test_agree_kernel_window_large_n_auto(rng):
    """u16 integer lands on the windowed gather at every n (its byte-split
    mxu scratch fails TPU compilation at production FULL widths); since r5
    the u8 integer auto path goes mxu above n=24, so the window parity at
    large n is exercised through u16 here."""
    from libbicos_tpu.kernels.agree import _resolve_gather

    assert _resolve_gather(44, False, u16=True)[0] == "window"
    s0, s1, disp = _disp_for(rng, 44, 3, 24, dtype=np.uint16)
    out, corr = agree_pallas(disp, s0, s1, 0.5, None, None, interpret=True)
    want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, None)
    out = np.asarray(out)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)
    _assert_corr_close(corr, want_c)


def test_agree_kernel_integer_mxu_large_n(rng):
    """u8 integer at n=44 (> the r5 n=24 crossover, beyond the old 3n<=128
    subpixel budget) resolves to the folded mxu gather; parity must hold
    with 44 section rows in the 128 dot lanes."""
    from libbicos_tpu.kernels.agree import _resolve_gather

    assert _resolve_gather(44, False)[0] == "mxu"
    s0, s1, disp = _disp_for(rng, 44, 3, 24)
    out, corr = agree_pallas(disp, s0, s1, 0.5, None, None, interpret=True)
    want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, None)
    out = np.asarray(out)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)
    _assert_corr_close(corr, want_c)


def test_agree_kernel_shuffle_fallback_large_n(rng, monkeypatch):
    """Very large n exceeds the windowed lane budget too and takes the
    shuffle-gather path; parity must hold there (forced here — the lane cap
    makes auto reach shuffle only past n=96)."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", "shuffle")
    s0, s1, disp = _disp_for(rng, 44, 3, 20)
    out, corr = agree_pallas(disp, s0, s1, 0.5, None, None, interpret=True)
    want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, None)
    out = np.asarray(out)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)
    _assert_corr_close(corr, want_c)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_agree_kernel_i8_engine(rng, monkeypatch, dtype):
    """The int8 gather engine (BICOS_AGREE_ENGINE=i8) must be bit-exact:
    centered bytes (v - 128) are undone post-dot because every one-hot row
    has exactly one 1 (kernels/agree.py). Verified bit-identical on TPU
    hardware 2026-08-17; this locks the interpret path in CI."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_ENGINE", "i8")
    # Distinct shape from the other tests: _agree_call's jit cache keys on
    # shapes, not on the module global the scratch dtype is read from.
    s0, s1, disp = _disp_for(rng, 6, 5, 44, dtype)
    out, corr = agree_pallas(disp, s0, s1, 0.5, 0.25, 15.0, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, 0.5, 0.25, 15.0, dtype
    )
    got_d = np.asarray(out)
    assert (np.isnan(got_d) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


@pytest.mark.parametrize("step", [None, 0.25])
@pytest.mark.parametrize("gather", ["window", "mxu"])
def test_agree_kernel_gather_modes(rng, monkeypatch, step, gather):
    """Forced gather strategies must be bit-identical: 'window' (grouped
    one-hot + in-vreg extraction, the auto default) and 'mxu' (full-width
    one-hot) both select exactly the same series elements."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", gather)
    # Distinct shapes per mode: _agree_call's jit cache keys on shapes,
    # not on the module global the gather mode is derived from.
    w = {"window": 52, "mxu": 56}[gather] + (4 if step else 0)
    s0, s1, disp = _disp_for(rng, 9, 4, w)
    out, corr = agree_pallas(disp, s0, s1, 0.5, step, None, interpret=True)
    if step is None:
        want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, None)
        out = np.asarray(out)
        got_i16 = np.where(np.isnan(out), np.int16(-32768),
                           np.nan_to_num(out).astype(np.int16))
        np.testing.assert_array_equal(got_i16, want_d)
    else:
        want_d, want_c = oracle.agree_subpixel(
            disp.copy(), s0, s1, 0.5, step, None, np.uint8)
        got_d = np.asarray(out)
        assert (np.isnan(got_d) == np.isnan(want_d)).all()
        m = ~np.isnan(want_d)
        np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


@pytest.mark.parametrize("step", [None, 0.25])
def test_agree_kernel_window_i8_engine(rng, monkeypatch, step):
    """The int8 gather engine must stay bit-exact through the windowed
    path too (centered bytes undone post-dot; each one-hot row selects
    exactly one window)."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", "window")
    monkeypatch.setattr(kagree, "AGREE_ENGINE", "i8")
    w = 72 if step else 76  # distinct shapes per config (jit cache)
    s0, s1, disp = _disp_for(rng, 6, 4, w)
    out, corr = agree_pallas(disp, s0, s1, 0.5, step, 8.0, interpret=True)
    if step is None:
        want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, 8.0)
        out = np.asarray(out)
        got_i16 = np.where(np.isnan(out), np.int16(-32768),
                           np.nan_to_num(out).astype(np.int16))
        np.testing.assert_array_equal(got_i16, want_d)
    else:
        want_d, want_c = oracle.agree_subpixel(
            disp.copy(), s0, s1, 0.5, step, 8.0, np.uint8)
        got_d = np.asarray(out)
        assert (np.isnan(got_d) == np.isnan(want_d)).all()
        m = ~np.isnan(want_d)
        np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


@pytest.mark.parametrize("gsz", [8, 32])
def test_agree_kernel_window_group_sizes(rng, monkeypatch, gsz):
    """The windowed gather must be exact for every supported group width
    (the default is 16; 8/32 re-tile K vs window lanes)."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", "window")
    monkeypatch.setattr(kagree, "AGREE_GROUP", gsz)
    s0, s1, disp = _disp_for(rng, 6, 3, 60 + gsz)
    out, corr = agree_pallas(disp, s0, s1, 0.5, 0.5, 4.0, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, 0.5, 0.5, 4.0, np.uint8)
    got_d = np.asarray(out)
    assert (np.isnan(got_d) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


def test_agree_kernel_window_border_columns(rng):
    """Pixels matched at the row edges (col1 = 0 / w-1) exercise the window
    clamping (q0/q2 clamp to the row bounds exactly like the legacy path's
    max/min indices); forced disparities place matches on both edges."""
    s0, s1, _ = _disp_for(rng, 7, 4, 48)
    h, w = 4, 48
    disp = np.full((h, w), -32768, np.int16)
    disp[:, 0] = 0      # col1 = 0 border
    disp[:, w - 1] = 0  # col1 = w-1 border
    disp[:, 5] = 5      # col1 = 0 via positive disparity
    disp[:, 10] = -37   # col1 = 47 = w-1
    disp[:, 20] = 3     # interior
    out, corr = agree_pallas(disp, s0, s1, -1.0, 0.25, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, -1.0, 0.25, None, np.uint8)
    got_d = np.asarray(out)
    assert (np.isnan(got_d) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


def test_agree_kernel_window_u16_subpixel(rng, monkeypatch):
    """u16 inputs take two byte-split window contractions recombined as
    256*hi + lo; must stay exact through the windowed path."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", "window")
    s0, s1, disp = _disp_for(rng, 5, 3, 68, np.uint16)
    out, corr = agree_pallas(disp, s0, s1, 0.6, 0.5, 10.0, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        disp.copy(), s0, s1, 0.6, 0.5, 10.0, np.uint16)
    got_d = np.asarray(out)
    assert (np.isnan(got_d) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)


def test_agree_gather_resolution():
    """auto is variant-aware (measured, artifact-free r4 numbers): u8
    subpixel takes the full-width mxu gather once the window needs
    multiple slices; the integer variant and u16 prefer the window gather
    at every n it supports; shuffle past every budget."""
    from libbicos_tpu.kernels.agree import _resolve_gather

    assert _resolve_gather(33, True)[0] == "mxu"
    # integer: the window gather wins at small n (42.4 vs ~56 at n=8,
    # 2026-08-20) but since r5 the folded-i8 mxu gather edges it at large n
    # (TRUE integer kernel 30.2 vs 31.2 chained at n=33; e2e-neutral) —
    # crossover at n=24.
    assert _resolve_gather(33, False)[0] == "mxu"
    assert _resolve_gather(25, False)[0] == "mxu"
    assert _resolve_gather(24, False)[0] == "window"
    assert _resolve_gather(16, False)[0] == "window"
    assert _resolve_gather(8, False)[0] == "window"
    assert _resolve_gather(8, True)[0] == "window"  # 8*16 lanes = 1 slice
    assert _resolve_gather(16, True)[0] == "mxu"  # 2 slices -> mxu
    # u16 subpixel avoids the full-width mxu kernel entirely: its byte-split
    # gather scratch exceeds the Mosaic VMEM budget at production widths
    # (compile-time OOM, measured 2026-08-20).
    assert _resolve_gather(33, True, u16=True)[0] == "window"
    assert _resolve_gather(33, False, u16=True)[0] == "window"
    # Past the mxu section budget (n > 42) the windowed gather still fits
    # its lane cap for a while — far cheaper than the shuffle fallback.
    assert _resolve_gather(44, True)[0] == "window"
    # integer u8 n <= 128 now fits the mxu section budget (only the n raw
    # sections ride the 128 dot lanes); past it the window takes over.
    assert _resolve_gather(44, False)[0] == "mxu"
    assert _resolve_gather(90, False)[0] == "mxu"
    assert _resolve_gather(140, False)[0] == "window"
    assert _resolve_gather(44, False, u16=True)[0] == "window"
    assert _resolve_gather(90, False, u16=True)[0] == "window"
    # Far past every budget: shuffle (subpixel window caps at n=96 for G=8).
    assert _resolve_gather(120, True)[0] == "shuffle"


@pytest.mark.parametrize("step", [None, 0.25])
def test_agree_kernel_forced_shuffle_small_n(rng, monkeypatch, step):
    """BICOS_AGREE_GATHER=shuffle forces the dynamic-gather path even where
    the MXU one-hot would normally run (3n <= 128); parity must hold for
    both variants. (Kept as a diagnostics knob: measured 632 vs 68.7 ms at
    n=33 2200x3300 on v5e — MXU stays the default.)"""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_GATHER", "shuffle")
    # Distinct shape: _agree_call's jit cache keys on shapes, not on the
    # module global mxu_gather is derived from.
    s0, s1, disp = _disp_for(rng, 7, 4, 36)
    out, corr = agree_pallas(disp, s0, s1, 0.5, step, None, interpret=True)
    if step is None:
        want_d, want_c = oracle.agree(disp.copy(), s0, s1, 0.5, None)
        out = np.asarray(out)
        got_i16 = np.where(np.isnan(out), np.int16(-32768),
                           np.nan_to_num(out).astype(np.int16))
        np.testing.assert_array_equal(got_i16, want_d)
    else:
        want_d, want_c = oracle.agree_subpixel(
            disp.copy(), s0, s1, 0.5, step, None, np.uint8)
        got_d = np.asarray(out)
        assert (np.isnan(got_d) == np.isnan(want_d)).all()
        m = ~np.isnan(want_d)
        np.testing.assert_array_equal(got_d[m], want_d[m])
    _assert_corr_close(corr, want_c)
