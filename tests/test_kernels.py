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
    """The fused forward+reverse kernel must equal two plain passes; the
    reverse side comes back pre-gathered at the forward argmin column."""
    import jax.numpy as jnp

    from libbicos_tpu.kernels.hamming import row_minima_consistency_pallas

    bits0 = rng.random((3, 300, 126)) < 0.5
    bits1 = rng.random((3, 300, 126)) < 0.5
    bits1[:, 200] = bits1[:, 10]  # ties in the right row
    bits0[:, 150] = bits0[:, 20]  # ties in the left row
    (c0, f0, l0), (_, rc0, rc0_last) = row_minima_consistency_pallas(
        bits0, bits1, no_dupes, interpret=True, engine=engine
    )
    wc0, wf0, wl0 = search.row_minima_xla(bits0, bits1, no_dupes)
    wc1, wf1, wl1 = search.row_minima_xla(bits1, bits0, no_dupes)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(wc0))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(wf0))
    want_rc0 = np.asarray(
        jnp.take_along_axis(wf1, jnp.asarray(np.asarray(f0)), axis=1))
    np.testing.assert_array_equal(np.asarray(rc0), want_rc0)
    if no_dupes:
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(wl0))
        want_rcl = np.asarray(
            jnp.take_along_axis(wl1, jnp.asarray(np.asarray(f0)), axis=1))
        np.testing.assert_array_equal(np.asarray(rc0_last), want_rcl)


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


@pytest.mark.parametrize("mode", [TransformMode.LIMITED, TransformMode.FULL])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_fused_stack_minima_matches_words(rng, mode, dtype, engine):
    """Fused transform+search (raw stacks in, on-chip descriptor bits via
    compare-coefficient contractions) is bit-identical to transform-then-
    search on packed words."""
    from libbicos_tpu.config import actual_bits
    from libbicos_tpu.kernels.hamming import (
        row_minima_pallas_words, row_minima_stack,
    )

    n = 6 if mode == TransformMode.FULL else 10
    from conftest import make_stack_pair

    s0, s1, _ = make_stack_pair(rng, n, 3, 150, dtype=dtype)
    nbits = actual_bits(n, mode)
    w0 = descriptor.descriptor_words(s0, mode)
    w1 = descriptor.descriptor_words(s1, mode)
    _, f_ref, l_ref = row_minima_pallas_words(
        w0, w1, nbits=nbits, need_last=True, interpret=True, engine=engine
    )
    _, f, l = row_minima_stack(
        s0, s1, mode=mode, need_last=True, interpret=True, engine=engine
    )
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l_ref))


@pytest.mark.parametrize("no_dupes", [True, False])
@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_fused_stack_consistency_matches_words(rng, no_dupes, engine):
    from libbicos_tpu.config import actual_bits
    from libbicos_tpu.kernels.hamming import (
        row_minima_consistency_stack, row_minima_consistency_words,
    )
    from conftest import make_stack_pair

    n, mode = 8, TransformMode.LIMITED
    s0, s1, _ = make_stack_pair(rng, n, 3, 120)
    nbits = actual_bits(n, mode)
    w0 = descriptor.descriptor_words(s0, mode)
    w1 = descriptor.descriptor_words(s1, mode)
    ref = row_minima_consistency_words(
        w0, w1, nbits=nbits, no_dupes=no_dupes, interpret=True, engine=engine
    )
    got = row_minima_consistency_stack(
        s0, s1, mode=mode, no_dupes=no_dupes, interpret=True, engine=engine
    )
    for (rg, rr) in zip(got, ref):
        for g, r in zip(rg[1:], rr[1:]):  # skip cost (None on fused path)
            if r is None:
                assert g is None
            else:
                np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_search_stack_matches_search_words(rng):
    """search_stack == transform+search_words for every variant, including
    the LIMITED n<4 fallback (constant descriptor bit)."""
    from libbicos_tpu.config import actual_bits
    from conftest import make_stack_pair

    for n, mode in [(3, TransformMode.LIMITED), (7, TransformMode.LIMITED),
                    (5, TransformMode.FULL)]:
        s0, s1, _ = make_stack_pair(rng, n, 3, 90)
        nbits = actual_bits(n, mode)
        w0 = descriptor.descriptor_words(s0, mode)
        w1 = descriptor.descriptor_words(s1, mode)
        for variant in (NoDuplicates(), Consistency(1, True), Consistency(2)):
            want = np.asarray(search.search_words(
                w0, w1, nbits, variant, backend="pallas_interpret"))
            got = np.asarray(search.search_stack(
                s0, s1, mode, variant, backend="pallas_interpret"))
            np.testing.assert_array_equal(got, want)


def test_fused_stack_reduce_variant(rng):
    """The lane-group-reduced accumulator strategy stays exact."""
    from conftest import make_stack_pair
    from libbicos_tpu.kernels.hamming import row_minima_stack

    s0, s1, _ = make_stack_pair(rng, 10, 2, 200)
    mode = TransformMode.LIMITED
    _, f0, l0 = row_minima_stack(
        s0, s1, mode=mode, need_last=True, interpret=True, reduce=False
    )
    _, f1, l1 = row_minima_stack(
        s0, s1, mode=mode, need_last=True, interpret=True, reduce=True
    )
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


@pytest.mark.parametrize("rows", [3, 8])
def test_fused_stack_multirow_parity(rng, rows):
    """Multi-row grid batching (SEARCH_ROWS/CONS_ROWS) must be exact,
    including when H is not a rows multiple (row padding) and when rows
    exceeds H (clamping). Measured optimum on v5e: rows=8 for the minima
    kernel (105.6 -> 89.4 ms at 33x2200x3300)."""
    from libbicos_tpu.kernels.hamming import (
        row_minima_consistency_stack,
        row_minima_stack,
    )

    n, h, w = 6, 7, 40
    s0 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    base = row_minima_stack(
        s0, s1, mode=TransformMode.LIMITED, need_last=True,
        interpret=True, rows=1,
    )
    multi = row_minima_stack(
        s0, s1, mode=TransformMode.LIMITED, need_last=True,
        interpret=True, rows=rows,
    )
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(multi[1]))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(multi[2]))

    cbase = row_minima_consistency_stack(
        s0, s1, mode=TransformMode.LIMITED, no_dupes=True,
        interpret=True, rows=1,
    )
    cmulti = row_minima_consistency_stack(
        s0, s1, mode=TransformMode.LIMITED, no_dupes=True,
        interpret=True, rows=rows,
    )
    for bt, mt in zip(cbase, cmulti):
        for a, b in zip(bt, mt):
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_words_multirow_parity(rng, engine):
    """Multi-row batching on the packed-words kernels (the W-band ring /
    transform-once surface) must be exact for both engines, including row
    padding (H not a rows multiple) and rows > H."""
    from libbicos_tpu.kernels.hamming import (
        row_minima_consistency_words,
        row_minima_pallas_words,
    )

    h, w, nbits, nw = 7, 40, 50, 2
    packmask = np.zeros(nw, np.uint32)
    for b in range(nbits):
        packmask[b // 32] |= np.uint32(1 << (b % 32))
    w0 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask
    w1 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask

    base = row_minima_pallas_words(
        w0, w1, nbits=nbits, need_last=True, interpret=True,
        engine=engine, rows=1,
    )
    for rows in (3, 16):
        multi = row_minima_pallas_words(
            w0, w1, nbits=nbits, need_last=True, interpret=True,
            engine=engine, rows=rows,
        )
        for a, b in zip(base, multi):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cbase = row_minima_consistency_words(
        w0, w1, nbits=nbits, no_dupes=True, interpret=True,
        engine=engine, rows=1,
    )
    cmulti = row_minima_consistency_words(
        w0, w1, nbits=nbits, no_dupes=True, interpret=True,
        engine=engine, rows=3,
    )
    for bt, mt in zip(cbase, cmulti):
        for a, b in zip(bt, mt):
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_row_minima_words_ultrawide_16k_packing(rng, engine):
    """Rows in [8192, 16384) switch the words kernel to the 16384 packing;
    minima must equal the XLA scan exactly (col>>8 stays bf16-exact and
    every packed value an exact f32 integer — see the PACK_S note)."""
    from libbicos_tpu import search
    from libbicos_tpu.kernels.hamming import row_minima_pallas_words

    h, w, nbits, nw = 2, 8200, 40, 2
    packmask = np.uint32((1 << 8) - 1)  # keep popcounts small-ish
    w0 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask
    w1 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask
    c, f, l = row_minima_pallas_words(
        w0, w1, nbits=nbits, need_last=True, interpret=True, engine=engine,
    )
    cr, fr, lr = search.row_minima_xla_words(w0, w1, True, row_chunk=1)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(cr))
    np.testing.assert_array_equal(np.asarray(f), np.asarray(fr))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(lr))


@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_consistency_words_ultrawide_16k_packing(rng, engine):
    """Fused consistency kernel at ultra-wide rows: forward minima and the
    in-kernel reverse lookup must match the two-pass XLA decode. Both MXU
    engines — the i8 path's (radd << shift) / pack_s-1 complements / lookup
    mask were all touched for the 16384 packing."""
    from libbicos_tpu import search
    from libbicos_tpu.config import Consistency
    from libbicos_tpu.kernels.hamming import row_minima_consistency_words

    h, w, nbits, nw = 2, 8200, 40, 2
    packmask = np.uint32((1 << 8) - 1)
    w0 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask
    w1 = rng.integers(0, 2**32, (h, w, nw), dtype=np.uint32) & packmask
    variant = Consistency(max_lr_diff=2, no_dupes=True)
    (c0, f0, l0), (_, rc0, rc0l) = row_minima_consistency_words(
        w0, w1, nbits=nbits, no_dupes=True, interpret=True, engine=engine,
    )
    # Reference: two XLA passes + gather decode.
    _, f0r, l0r = search.row_minima_xla_words(w0, w1, True, row_chunk=1)
    _, f1r, l1r = search.row_minima_xla_words(w1, w0, True, row_chunk=1)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f0r))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l0r))
    import jax.numpy as jnp
    rc_ref = np.take_along_axis(np.asarray(f1r), np.asarray(f0r), axis=1)
    rcl_ref = np.take_along_axis(np.asarray(l1r), np.asarray(f0r), axis=1)
    np.testing.assert_array_equal(np.asarray(rc0), rc_ref)
    np.testing.assert_array_equal(np.asarray(rc0l), rcl_ref)


@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_fused_stack_ultrawide_matches_words(rng, engine):
    """Fused transform+search at ultra-wide rows (16384 packing) must match
    the (xla-verified) wide words kernel bit for bit, on both MXU engines."""
    from libbicos_tpu.config import actual_bits
    from libbicos_tpu.descriptor import descriptor_words
    from libbicos_tpu.kernels.hamming import (
        row_minima_pallas_words, row_minima_stack,
    )

    n, h, w = 5, 2, 8200
    mode = TransformMode.LIMITED
    s0 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    nbits = actual_bits(n, mode)
    w0 = np.asarray(descriptor_words(s0, mode, min_words=2))
    w1 = np.asarray(descriptor_words(s1, mode, min_words=2))
    _, fw, lw = row_minima_pallas_words(
        w0, w1, nbits=nbits, need_last=True, interpret=True, engine=engine)
    _, fs, ls = row_minima_stack(
        s0, s1, mode=mode, need_last=True, interpret=True, engine=engine)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fw))
    np.testing.assert_array_equal(np.asarray(ls), np.asarray(lw))


@pytest.mark.parametrize("engine", ["i8", "bf16"])
def test_fused_stack_consistency_ultrawide_matches_words(rng, engine):
    from libbicos_tpu.config import actual_bits
    from libbicos_tpu.descriptor import descriptor_words
    from libbicos_tpu.kernels.hamming import (
        row_minima_consistency_stack, row_minima_consistency_words,
    )

    n, h, w = 5, 2, 8200
    mode = TransformMode.LIMITED
    s0 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    s1 = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    nbits = actual_bits(n, mode)
    w0 = np.asarray(descriptor_words(s0, mode, min_words=2))
    w1 = np.asarray(descriptor_words(s1, mode, min_words=2))
    (_, fw, lw), (_, rw, rwl) = row_minima_consistency_words(
        w0, w1, nbits=nbits, no_dupes=True, interpret=True, engine=engine)
    (_, fs, ls), (_, rs, rsl) = row_minima_consistency_stack(
        s0, s1, mode=mode, no_dupes=True, interpret=True, engine=engine)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fw))
    np.testing.assert_array_equal(np.asarray(ls), np.asarray(lw))
    np.testing.assert_array_equal(np.asarray(rs), np.asarray(rw))
    np.testing.assert_array_equal(np.asarray(rsl), np.asarray(rwl))
