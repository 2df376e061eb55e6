"""Pallas Hamming-scan kernel: exact parity with the XLA fallback (and hence
with the per-pixel oracle, which test_search.py pins to row_minima_xla)."""

import numpy as np
import pytest

from libbicos_tpu import Consistency, NoDuplicates, TransformMode
from libbicos_tpu import descriptor, search
from libbicos_tpu.kernels.hamming import row_minima_pallas


@pytest.mark.parametrize("h,w,b", [(3, 40, 26), (2, 300, 126), (4, 130, 256)])
@pytest.mark.parametrize("need_last", [True, False])
@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_row_minima_pallas_matches_xla(rng, h, w, b, need_last, engine):
    bits0 = rng.random((h, w, b)) < 0.5
    bits1 = rng.random((h, w, b)) < 0.5
    bits1[:, 17] = bits1[:, 5]  # exact duplicates to exercise first/last
    c0, f0, l0 = search.row_minima_xla(bits0, bits1, need_last)
    c1, f1, l1 = row_minima_pallas(
        bits0, bits1, need_last, interpret=True, engine=engine
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    if need_last:
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_row_minima_pallas_small_tiles(rng):
    """Non-default tile sizes (multi-chunk + masked-tail paths) stay exact."""
    bits0 = rng.random((2, 700, 126)) < 0.5
    bits1 = rng.random((2, 700, 126)) < 0.5
    c0, f0, l0 = search.row_minima_xla(bits0, bits1, True)
    c1, f1, l1 = row_minima_pallas(
        bits0, bits1, True, interpret=True, tile_i=128, tile_j=128
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_search_backend_pallas_interpret(rng):
    """Full search() through the Pallas backend (interpret mode) matches the
    XLA backend for both variants."""
    from conftest import make_stack_pair

    s0, s1, _ = make_stack_pair(rng, 6, 4, 40)
    b0 = descriptor.descriptor_bits(s0, TransformMode.LIMITED)
    b1 = descriptor.descriptor_bits(s1, TransformMode.LIMITED)
    for variant in (NoDuplicates(), Consistency(1, True), Consistency(2)):
        want = np.asarray(search.search(b0, b1, variant, backend="xla"))
        got = np.asarray(
            search.search(b0, b1, variant, backend="pallas_interpret")
        )
        np.testing.assert_array_equal(got, want)


def test_row_minima_pallas_nonuniform_widths(rng):
    """W0 != W1 (asymmetric query/database rows) must decode correctly."""
    bits0 = rng.random((2, 37, 30)) < 0.5
    bits1 = rng.random((2, 61, 30)) < 0.5
    c0, f0, l0 = search.row_minima_xla(bits0, bits1, True)
    c1, f1, l1 = row_minima_pallas(bits0, bits1, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


@pytest.mark.parametrize("no_dupes", [True, False])
@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_consistency_fused_matches_two_pass(rng, no_dupes, engine):
    """The fused forward+reverse kernel must equal two plain passes."""
    from libbicos_tpu.kernels.hamming import row_minima_consistency_pallas

    bits0 = rng.random((3, 300, 126)) < 0.5
    bits1 = rng.random((3, 300, 126)) < 0.5
    bits1[:, 200] = bits1[:, 10]  # ties in the right row
    bits0[:, 150] = bits0[:, 20]  # ties in the left row
    (c0, f0, l0), (c1, f1, l1) = row_minima_consistency_pallas(
        bits0, bits1, no_dupes, interpret=True, engine=engine
    )
    wc0, wf0, wl0 = search.row_minima_xla(bits0, bits1, no_dupes)
    wc1, wf1, wl1 = search.row_minima_xla(bits1, bits0, no_dupes)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(wc0))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(wf0))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(wc1))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(wf1))
    if no_dupes:
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(wl0))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(wl1))


def test_consistency_fused_through_search(rng):
    from conftest import make_stack_pair

    s0, s1, _ = make_stack_pair(rng, 6, 4, 40)
    b0 = descriptor.descriptor_bits(s0, TransformMode.LIMITED)
    b1 = descriptor.descriptor_bits(s1, TransformMode.LIMITED)
    for variant in (Consistency(1, True), Consistency(2, False),
                    Consistency(0, True)):
        want = np.asarray(search.search(b0, b1, variant, backend="xla"))
        got = np.asarray(
            search.search(b0, b1, variant, backend="pallas_interpret")
        )
        np.testing.assert_array_equal(got, want)
