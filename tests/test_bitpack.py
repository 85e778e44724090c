"""Pow2-bit pack/unpack roundtrip, numpy vs jnp parity."""

import numpy as np
import pytest

from iresearch_tpu.formats.bitpack import (
    BITS,
    bits_class,
    pack_blocks,
    unpack_blocks,
    unpack_jnp,
    words_per_block,
)


@pytest.mark.parametrize("b", BITS)
def test_roundtrip(b, rng):
    n = 17
    hi = (1 << b) if b < 32 else (1 << 32)
    vals = rng.integers(0, hi, size=(n, 128), dtype=np.uint64).astype(np.uint32)
    words = pack_blocks(vals, b)
    assert words.shape == (n, words_per_block(b))
    np.testing.assert_array_equal(unpack_blocks(words, b), vals)


@pytest.mark.parametrize("b", BITS)
def test_jnp_matches_numpy(b, rng):
    vals = rng.integers(0, 1 << min(b, 31), size=(5, 128), dtype=np.uint64).astype(
        np.uint32
    )
    words = pack_blocks(vals, b)
    got = np.asarray(unpack_jnp(words, b))
    np.testing.assert_array_equal(got, vals)


def test_bits_class():
    assert BITS[int(bits_class(0))] == 1
    assert BITS[int(bits_class(1))] == 1
    assert BITS[int(bits_class(2))] == 2
    assert BITS[int(bits_class(3))] == 2
    assert BITS[int(bits_class(4))] == 4
    assert BITS[int(bits_class(255))] == 8
    assert BITS[int(bits_class(256))] == 16
    assert BITS[int(bits_class(65535))] == 16
    assert BITS[int(bits_class(65536))] == 32
    assert BITS[int(bits_class(0xFFFFFFFF))] == 32
    np.testing.assert_array_equal(
        bits_class(np.array([0, 1, 2, 16, 300, 70000])), [0, 0, 1, 3, 4, 5]
    )
