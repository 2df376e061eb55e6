"""Production-width kernel coverage (interpret mode, W >= 1408).

Round-2 lesson (VERDICT.md): every agree-kernel test ran at W <= 76, which
pads to wp = 512, so width-gated logic — the dynamic gather window
(BICOS_AGREE_DYNWIN is only live when wp > the window), many-chunk loops,
peeled tails — was never exercised in CI, and an unvalidated default-on
kernel path slipped into the driver bench. These tests run the Pallas
kernels at widths where those branches are live, in interpret mode, against
the NumPy oracle (reference semantics: agree.cuh:110-259).

Each configuration uses a distinct image width: ``_agree_call``'s jit cache
keys on shapes, not on the monkeypatched module globals.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from libbicos_tpu import _oracle as oracle
from libbicos_tpu.kernels import agree as kagree
from libbicos_tpu.kernels.agree import (
    INVALID_I32,
    _chunk_window_bases,
    _pad2,
    agree_pallas,
)

H = 8  # one ROW_BATCH grid step keeps interpret mode fast


def _wide_disp(h, w, rng):
    """Disparity field that drives every dynamic-window code path.

    Rows 0-3: per-chunk-smooth field (every chunk's matched columns fit a
    1024-column window). Rows 4-7: a >1024-column disparity jump inside one
    chunk (forces the in-kernel full-width fallback, base sentinel -1),
    plus border matches (col1 = 0 and col1 = w-1) and invalid pixels.
    """
    col = np.arange(w)
    d = np.zeros((h, w), np.int16)
    # Smooth: disparity ramps 0..120 across the row (col1 stays in bounds
    # and each 512-column chunk spans < 640 matched columns).
    ramp = (col * 120 // max(1, w - 1)).astype(np.int16)
    d[0:4] = np.minimum(ramp[None, :], col[None, :]).astype(np.int16)
    # Wild rows: huge jump inside chunk 1 (cols 512..1023): col1 goes from
    # ~600 down to ~-? keep in bounds: d=0 for first half, d=1200 at cols
    # >= 1200 (col1 = col-1200 in [0, w-1201]) -> chunk containing cols
    # 1200.. spans col1 {0..} while its low cols (1024..1199, d=0) have
    # col1 ~1024..1199: spread > 1024 -> fallback.
    d[4:8] = 0
    d[4:8, 1200:] = 1200
    # Borders: col1 = 0 via d = col, col1 = w-1 via d = 0 at the last col.
    d[:, 5] = 5
    d[:, w - 1] = 0
    # Scattered invalids.
    d[rng.integers(0, h, 40), rng.integers(0, w, 40)] = -32768
    return d


def _expect_mixed_bases(d, w, wcap, chunk):
    d32 = _pad2(jnp.asarray(d, jnp.int32), 8, chunk, value=INVALID_I32)
    wp = d32.shape[1]
    bases = np.asarray(_chunk_window_bases(d32, w, wp, wcap, chunk))
    assert (bases >= 0).any(), "no in-window chunk — test field is wrong"
    assert (bases < 0).any(), "no fallback chunk — test field is wrong"
    return bases


def _check_subpixel(got_d, got_c, want_d, want_c):
    got_d = np.asarray(got_d)
    assert (np.isnan(got_d) == np.isnan(want_d)).all()
    m = ~np.isnan(want_d)
    np.testing.assert_array_equal(got_d[m], want_d[m])
    got_c = np.asarray(got_c)
    want_c = np.asarray(want_c)
    assert (np.isnan(got_c) == np.isnan(want_c)).all()
    mc = ~np.isnan(want_c)
    np.testing.assert_allclose(got_c[mc], want_c[mc], rtol=4e-6, atol=4e-6)


def test_chunk_window_bases_unit():
    """Pure-function contract: a chunk's base covers every valid matched
    column, is 128-aligned, stays inside the padded row, and misfit chunks
    get the -1 sentinel."""
    w, wcap, chunk = 1408, 1024, 512
    rng = np.random.default_rng(7)
    d = _wide_disp(H, w, rng)
    bases = _expect_mixed_bases(d, w, wcap, chunk)
    d32 = np.asarray(_pad2(jnp.asarray(d, jnp.int32), 8, chunk,
                           value=INVALID_I32))
    wp = d32.shape[1]
    col = np.arange(wp)
    for r in range(bases.shape[0]):
        col1 = col - d32[r]
        keep = (d32[r] != INVALID_I32) & (col1 >= 0) & (col1 < w)
        for oc in range(bases.shape[1]):
            b = bases[r, oc]
            sl = slice(oc * chunk, (oc + 1) * chunk)
            kept = keep[sl]
            c1 = np.clip(col1[sl], 0, w - 1)[kept]
            if b < 0:
                continue
            assert b % 128 == 0 and b + wcap <= wp
            if kept.any():
                assert c1.min() >= b and c1.max() <= b + wcap - 1


@pytest.mark.parametrize(
    "wcap,chunk,w", [(1024, 512, 1408), (640, 256, 1412)])
def test_dynwin_subpixel_parity(rng, monkeypatch, wcap, chunk, w):
    """Dynamic-window subpixel agree at production width must be
    bit-identical to the oracle with BOTH in-window and fallback chunks
    live (256/640 is the auto default; 512/1024 is the legacy explicit
    combination)."""
    monkeypatch.setattr(kagree, "AGREE_GATHER", "mxu")
    monkeypatch.setattr(kagree, "AGREE_DYNWIN", wcap)
    monkeypatch.setattr(kagree, "CHUNK", chunk)
    from conftest import make_stack_pair

    s0, s1, _ = make_stack_pair(rng, 5, H, w)
    d = _wide_disp(H, w, rng)
    _expect_mixed_bases(d, w, wcap, chunk)
    got_d, got_c = agree_pallas(d, s0, s1, 0.3, 0.5, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        d.copy(), s0, s1, 0.3, 0.5, None, np.uint8)
    _check_subpixel(got_d, got_c, want_d, want_c)


def test_dynwin_integer_minvar_parity(rng, monkeypatch):
    """Integer variant through the full-width mxu gather with the dynamic
    window live, plus a minimum-variance gate."""
    monkeypatch.setattr(kagree, "AGREE_GATHER", "mxu")
    monkeypatch.setattr(kagree, "AGREE_DYNWIN", 1024)
    monkeypatch.setattr(kagree, "CHUNK", 512)
    from conftest import make_stack_pair

    w = 1416
    s0, s1, _ = make_stack_pair(rng, 5, H, w)
    d = _wide_disp(H, w, rng)
    _expect_mixed_bases(d, w, 1024, 512)
    got_d, got_c = agree_pallas(d, s0, s1, 0.3, None, 10.0, interpret=True)
    want_d, want_c = oracle.agree(d.copy(), s0, s1, 0.3, 10.0)
    out = np.asarray(got_d)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)
    got_c = np.asarray(got_c)
    mc = ~np.isnan(want_c)
    assert (np.isnan(got_c) == np.isnan(want_c)).all()
    np.testing.assert_allclose(got_c[mc], want_c[mc], rtol=4e-6, atol=4e-6)


def test_dynwin_u16_subpixel_parity(rng, monkeypatch):
    """u16 byte-split gather (two contractions recombined as 256*hi + lo)
    with the dynamic window live."""
    monkeypatch.setattr(kagree, "AGREE_GATHER", "mxu")
    monkeypatch.setattr(kagree, "AGREE_DYNWIN", 1024)
    monkeypatch.setattr(kagree, "CHUNK", 512)
    from conftest import make_stack_pair

    w = 1408
    s0, s1, _ = make_stack_pair(rng, 5, H, w, np.uint16)
    d = _wide_disp(H, w, rng)
    _expect_mixed_bases(d, w, 1024, 512)
    got_d, got_c = agree_pallas(d, s0, s1, 0.3, 0.5, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        d.copy(), s0, s1, 0.3, 0.5, None, np.uint16)
    _check_subpixel(got_d, got_c, want_d, want_c)


def test_dynwin_i8_engine_parity(rng, monkeypatch):
    """int8 gather engine under the dynamic window: centered bytes are
    undone post-dot; an out-of-window all-false one-hot column yields 128
    (+128 correction with no selected byte), masked by ``keep``."""
    monkeypatch.setattr(kagree, "AGREE_GATHER", "mxu")
    monkeypatch.setattr(kagree, "AGREE_DYNWIN", 1024)
    monkeypatch.setattr(kagree, "CHUNK", 512)
    monkeypatch.setattr(kagree, "AGREE_ENGINE", "i8")
    from conftest import make_stack_pair

    w = 1420
    s0, s1, _ = make_stack_pair(rng, 5, H, w)
    d = _wide_disp(H, w, rng)
    _expect_mixed_bases(d, w, 1024, 512)
    got_d, got_c = agree_pallas(d, s0, s1, 0.3, 0.5, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        d.copy(), s0, s1, 0.3, 0.5, None, np.uint8)
    _check_subpixel(got_d, got_c, want_d, want_c)


def test_window_gather_production_width(rng):
    """The default integer path (windowed gather, G=8) across many chunks
    at production width."""
    from conftest import make_stack_pair

    w = 1424
    s0, s1, _ = make_stack_pair(rng, 5, H, w)
    d = _wide_disp(H, w, rng)
    got_d, _ = agree_pallas(d, s0, s1, 0.3, None, None, interpret=True)
    want_d, _ = oracle.agree(d.copy(), s0, s1, 0.3, None)
    out = np.asarray(got_d)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)


def test_integer_mxu_fold_production_width(rng):
    """The r5 large-n integer default (full-width mxu gather, i8 engine,
    one-hot fold F=2) across many chunks at production width — n=26 > the
    n=24 window/mxu crossover, so auto resolves to the folded mxu path."""
    from conftest import make_stack_pair
    from libbicos_tpu.kernels import agree as kagree

    assert kagree._resolve_gather(26, False, False)[0] == "mxu"
    w = 1424
    s0, s1, _ = make_stack_pair(rng, 26, H, w)
    d = _wide_disp(H, w, rng)
    got_d, _ = agree_pallas(d, s0, s1, 0.3, None, None, interpret=True)
    want_d, _ = oracle.agree(d.copy(), s0, s1, 0.3, None)
    out = np.asarray(got_d)
    got_i16 = np.where(np.isnan(out), np.int16(-32768),
                       np.nan_to_num(out).astype(np.int16))
    np.testing.assert_array_equal(got_i16, want_d)


def test_subpixel_fold4_production_width(rng, monkeypatch):
    """BICOS_AGREE_FOLD=4 (the +8%-MXU bracketing point) must stay
    bit-exact at a width whose quarter pads the folded K (1424/4 = 356 ->
    padded)."""
    from libbicos_tpu.kernels import agree as kagree

    monkeypatch.setattr(kagree, "AGREE_FOLD", 4)
    from conftest import make_stack_pair

    w = 1424
    s0, s1, _ = make_stack_pair(rng, 5, H, w)
    d = _wide_disp(H, w, rng)
    got_d, got_c = agree_pallas(d, s0, s1, 0.3, 0.5, None, interpret=True)
    want_d, want_c = oracle.agree_subpixel(
        d.copy(), s0, s1, 0.3, 0.5, None, np.uint8)
    _check_subpixel(got_d, got_c, want_d, want_c)


def test_fused_search_production_width(rng):
    """Fused transform+search (Pallas, interpret) at W=1408 — many column
    chunks plus the peeled masked tail — against the oracle-pinned XLA
    search (bicos.cuh:77-140 semantics)."""
    from conftest import make_stack_pair

    from libbicos_tpu import NoDuplicates, TransformMode, descriptor, search

    s0, s1, _ = make_stack_pair(rng, 5, H, 1408)
    mode = TransformMode.LIMITED
    b0 = descriptor.descriptor_bits(s0, mode)
    b1 = descriptor.descriptor_bits(s1, mode)
    want = np.asarray(search.search(b0, b1, NoDuplicates(), backend="xla"))
    got = np.asarray(search.search_stack(
        s0, s1, mode, NoDuplicates(), backend="pallas_interpret"))
    np.testing.assert_array_equal(got, want)


def test_xla_search_unbounded_width(rng):
    """W1 > 32768 takes the widened-packing, column-chunked XLA scan
    (capability parity with the reference's any-width CPU loop,
    bicos.hpp:54); exact vs a direct NumPy popcount argmin."""
    from libbicos_tpu.search import row_minima_xla_words

    h, w0, w1, nw = 2, 24, 33000, 2
    words0 = rng.integers(0, 2**32, size=(h, w0, nw), dtype=np.uint32)
    words1 = rng.integers(0, 2**32, size=(h, w1, nw), dtype=np.uint32)
    cost, first, last = row_minima_xla_words(
        jnp.asarray(words0), jnp.asarray(words1), True)
    # NumPy oracle: popcount via uint8 view + lookup table.
    lut = np.array([bin(i).count("1") for i in range(256)], np.int32)
    c = np.zeros((h, w0, w1), np.int32)
    for k in range(nw):
        x = (words0[:, :, None, k] ^ words1[:, None, :, k])
        c += lut[x.view(np.uint8).reshape(h, w0, w1, 4)].sum(-1)
    want_cost = c.min(axis=2)
    want_first = c.argmin(axis=2)
    want_last = w1 - 1 - c[:, :, ::-1].argmin(axis=2)
    np.testing.assert_array_equal(np.asarray(cost), want_cost)
    np.testing.assert_array_equal(np.asarray(first), want_first)
    np.testing.assert_array_equal(np.asarray(last), want_last)
