"""wide_top_k must be bit-identical to lax.top_k, including tie order."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from iresearch_tpu.ops.topk import wide_top_k


def _check(x, k, chunk):
    ref_v, ref_i = lax.top_k(x, k)
    got_v, got_i = wide_top_k(x, k, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_float_random_1d():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=10_000).astype(np.float32))
    for chunk in (256, 1024, 4096):
        _check(x, 10, chunk)


def test_ties_cross_chunk():
    # equal values spanning chunk boundaries: index order must match
    x = np.zeros(4096, np.float32)
    x[[5, 300, 1030, 2050, 4000]] = 7.0
    x[[6, 301, 1031]] = 7.0
    _check(jnp.asarray(x), 6, 1024)


def test_int_dtype_with_padding():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-(2**30), 2**30, size=3001, dtype=np.int32))
    _check(x, 7, 512)  # 3001 % 512 != 0 -> pad path


def test_batched_rows():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 8192)).astype(np.float32))
    _check(x, 10, 1024)


def test_neg_inf_rows():
    x = jnp.full(5000, -jnp.inf, jnp.float32)
    got_v, _ = wide_top_k(x, 10, chunk=512)
    assert np.all(np.isneginf(np.asarray(got_v)))


def test_small_input_passthrough():
    x = jnp.asarray(np.arange(64, dtype=np.float32))
    _check(x, 10, 1 << 20)
