"""vmem-safe top-k for wide candidate rows.

XLA lowers ``lax.top_k`` to the ``TopKBatchMajorSmallK`` custom call,
which stages the whole row in vmem (128 MB on v5e): a batched top-k over
[Q, 4.2M] lanes (a 5M-doc OrHighMed group) asks for ~384 MB and fails to
compile. ``wide_top_k`` splits the lane axis into fixed chunks, takes a
per-chunk top-k, then a top-k of the chunk winners — mathematically
identical (top-k is associative over partitions) including the
tie-break: ``lax.top_k`` prefers the smaller lane index on equal values,
and chunk-major winner order preserves exactly that global preference.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# 2^20 lanes = 4 MB per f32/i32 operand staged in vmem — comfortably
# inside the 128 MB scoped budget even with a ~dozen-query batch dim
_CHUNK = 1 << 20


def wide_top_k(x, k: int, chunk: int = _CHUNK):
    """``lax.top_k(x, k)`` over the last axis, chunked for vmem safety.

    Works for any leading batch shape. Returns (values, global indices),
    bit-identical to the unchunked call.
    """
    p = x.shape[-1]
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
            [x, jnp.full(x.shape[:-1] + (pad,), fill, x.dtype)], axis=-1
        )
    lead = x.shape[:-1]
    xc = x.reshape(lead + (c, chunk))
    v, i = lax.top_k(xc, k)  # [..., c, k]
    gi = i.astype(jnp.int32) + (
        jnp.arange(c, dtype=jnp.int32) * chunk
    )[:, None]
    v2, j = lax.top_k(v.reshape(lead + (c * k,)), k)
    out_i = jnp.take_along_axis(gi.reshape(lead + (c * k,)), j, axis=-1)
    return v2, out_i
