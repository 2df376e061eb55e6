"""Descriptor transform: bit-exact parity with the per-pixel oracle."""

import numpy as np
import pytest

from libbicos_tpu import TransformMode
from libbicos_tpu import _oracle as oracle
from libbicos_tpu import descriptor
from libbicos_tpu.config import actual_bits, required_bits


@pytest.mark.parametrize("n", [2, 3, 4, 5, 10, 33, 65])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_limited_bit_exact(rng, n, dtype):
    stack = rng.integers(0, np.iinfo(dtype).max + 1, size=(n, 6, 9)).astype(dtype)
    got = np.asarray(descriptor.descriptor_bits(stack, TransformMode.LIMITED))
    want = oracle.descriptor_bits(stack, TransformMode.LIMITED)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 10, 16])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_full_bit_exact(rng, n, dtype):
    stack = rng.integers(0, np.iinfo(dtype).max + 1, size=(n, 5, 7)).astype(dtype)
    got = np.asarray(descriptor.descriptor_bits(stack, TransformMode.FULL))
    want = oracle.descriptor_bits(stack, TransformMode.FULL)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_mean_comparison_edge(rng):
    # Constant series: a < av is false everywhere; pairsum ties are false.
    stack = np.full((5, 3, 4), 7, dtype=np.uint8)
    got = np.asarray(descriptor.descriptor_bits(stack, TransformMode.LIMITED))
    want = oracle.descriptor_bits(stack, TransformMode.LIMITED)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 10, 33])
def test_pack_roundtrip(rng, n):
    stack = rng.integers(0, 256, size=(n, 4, 6)).astype(np.uint8)
    bits = descriptor.descriptor_bits(stack, TransformMode.LIMITED)
    words = descriptor.pack_bits(bits)
    back = descriptor.unpack_words(words, bits.shape[-1])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_packed_words_match_reference_layout(rng):
    """Bit k of the oracle's append order must land at word k//32, bit k%32 —
    the little-endian layout shared by the reference's uint32/64/128/bitset
    descriptors (bitfield.hpp:49-56)."""
    stack = rng.integers(0, 256, size=(10, 3, 4)).astype(np.uint8)
    bits = oracle.descriptor_bits(stack, TransformMode.LIMITED)
    words = np.asarray(
        descriptor.pack_bits(
            descriptor.descriptor_bits(stack, TransformMode.LIMITED)
        )
    )
    b = bits.shape[-1]
    expect = np.zeros(words.shape, dtype=np.uint64)
    for k in range(b):
        expect[:, :, k // 32] |= bits[:, :, k].astype(np.uint64) << (k % 32)
    np.testing.assert_array_equal(words, expect.astype(np.uint32))


def test_required_vs_actual_bits():
    # The reference's 4n-7 undercount never crosses a word boundary.
    for n in range(2, 66):
        req = required_bits(n, TransformMode.LIMITED)
        act = actual_bits(n, TransformMode.LIMITED)
        assert act <= max(32, -(-req // 32) * 32)
    for n in range(2, 17):
        assert required_bits(n, TransformMode.FULL) == actual_bits(
            n, TransformMode.FULL
        )


def test_descriptor_words_equals_packed_bits(rng):
    """The fused word path must match pack_bits(descriptor_bits(...))."""
    import numpy as np
    from libbicos_tpu import TransformMode, descriptor

    for n, mode in [(2, TransformMode.LIMITED), (5, TransformMode.LIMITED),
                    (33, TransformMode.LIMITED), (6, TransformMode.FULL),
                    (16, TransformMode.FULL)]:
        s = rng.integers(0, 256, (n, 3, 7), dtype=np.uint8)
        want = descriptor.pack_bits(descriptor.descriptor_bits(s, mode))
        got = descriptor.descriptor_words(s, mode)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_descriptor_words_pallas_parity(rng):
    """The Pallas transform kernel must be bit-identical to the XLA path."""
    import numpy as np
    from libbicos_tpu import TransformMode, descriptor
    from libbicos_tpu.kernels.transform import descriptor_words_pallas

    for n, mode, dtype in [(5, TransformMode.LIMITED, np.uint8),
                           (33, TransformMode.LIMITED, np.uint8),
                           (6, TransformMode.FULL, np.uint16),
                           (16, TransformMode.FULL, np.uint8)]:
        s = rng.integers(0, np.iinfo(dtype).max + 1, (n, 5, 40)).astype(dtype)
        want = descriptor.descriptor_words(s, mode)
        got = descriptor_words_pallas(s, mode, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compare_coeffs_bit_exact(rng):
    """The comparison-matrix form (bit k = dot(CX[k], s) < dot(CY[k], s))
    reproduces every descriptor bit — the algebraic foundation of the fused
    transform+search kernel (kernels/hamming.py)."""
    import pytest as _pytest

    for n, mode in [(4, TransformMode.LIMITED), (33, TransformMode.LIMITED),
                    (65, TransformMode.LIMITED), (2, TransformMode.FULL),
                    (17, TransformMode.FULL)]:
        for dtype in (np.uint8, np.uint16):
            hi = np.iinfo(dtype).max
            s = rng.integers(0, hi + 1, (n, 5, 9)).astype(dtype)
            ref = np.asarray(descriptor.descriptor_bits(s, mode))
            cx, cy = descriptor.compare_coeffs(n, mode)
            flat = s.reshape(n, -1).astype(np.int64)
            got = ((cx @ flat) < (cy @ flat)).T.reshape(ref.shape)
            np.testing.assert_array_equal(got, ref)
    with _pytest.raises(ValueError):
        descriptor.compare_coeffs(3, TransformMode.LIMITED)


def test_compare_coeffs_mean_rounding_equivalence(rng):
    """n*s[t] < sum is exactly the reference's s[t] < fl(sum/n) even at
    near-tie sums (the division's rounding never crosses an integer)."""
    for n in (5, 33):
        # Constant series (exact ties) + off-by-one perturbations.
        for base in (0, 1, 100, 255):
            s = np.full((n, 1, 3), base, np.uint8)
            s[0, 0, 1] = min(255, base + 1)
            s[0, 0, 2] = max(0, base - 1)
            ref = np.asarray(
                descriptor.descriptor_bits(s, TransformMode.LIMITED)
            ) if n >= 4 else None
            if ref is None:
                continue
            cx, cy = descriptor.compare_coeffs(n, TransformMode.LIMITED)
            flat = s.reshape(n, -1).astype(np.int64)
            got = ((cx @ flat) < (cy @ flat)).T.reshape(ref.shape)
            np.testing.assert_array_equal(got, ref)
