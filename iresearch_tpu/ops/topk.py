"""vmem-safe top-k for wide candidate rows.

XLA lowers ``lax.top_k`` to the ``TopKBatchMajorSmallK`` custom call,
which stages the whole [batch, lanes] operand block in scoped vmem
(16 MB stack budget on v5e): a batched top-k over [18, 4.2M] lanes (a
5M-doc disjunction group) asks for hundreds of MB and fails to compile.
``wide_top_k`` splits the lane axis into chunks sized so that
batch x chunk stays tiny, takes a per-chunk top-k, then a top-k of the
chunk winners — mathematically identical (top-k is associative over
partitions) including the tie-break: ``lax.top_k`` prefers the smaller
lane index on equal values, and chunk-major winner order preserves
exactly that global preference.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

# total lanes (batch x chunk) staged per TopK call. The TopK custom call
# stages ~32 B/lane of scoped vmem against a 16 MB stack budget (measured:
# [16, 524288] lanes hit exactly 16.00M); stay 16x under it.
_CHUNK_LANES = 1 << 17


def wide_top_k(x, k: int, chunk: int | None = None):
    """``lax.top_k(x, k)`` over the last axis, chunked for vmem safety.

    Works for any leading batch shape. Returns (values, global indices),
    bit-identical to the unchunked call.
    """
    p = x.shape[-1]
    lead = x.shape[:-1]
    if chunk is None:
        nbatch = math.prod(lead) if lead else 1
        chunk = max(2 * k, _CHUNK_LANES // max(1, nbatch))
    if p <= chunk or p <= 2 * k:
        return lax.top_k(x, k)
    c = -(-p // chunk)
    pad = c * chunk - p
    if pad:
        if jnp.issubdtype(x.dtype, jnp.floating):
            fill = x.dtype.type(-jnp.inf)
        else:
            fill = jnp.iinfo(x.dtype).min
        x = jnp.concatenate(
            [x, jnp.full(lead + (pad,), fill, x.dtype)], axis=-1
        )
    xc = x.reshape(lead + (c, chunk))
    v, i = lax.top_k(xc, k)  # [..., c, k]
    gi = i.astype(jnp.int32) + (
        jnp.arange(c, dtype=jnp.int32) * chunk
    )[:, None]
    # winners are few; the second stage may itself still be wide when c*k
    # is large — recurse (depth is O(log) and 2 in practice)
    v2, j = wide_top_k(v.reshape(lead + (c * k,)), k)
    out_i = jnp.take_along_axis(gi.reshape(lead + (c * k,)), j, axis=-1)
    return v2, out_i
