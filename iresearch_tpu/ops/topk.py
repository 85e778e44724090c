"""vmem-safe, batch-friendly top-k for wide candidate rows.

XLA lowers ``lax.top_k`` to the ``TopKBatchMajorSmallK`` custom call,
which (a) stages its operand block in scoped vmem — a [18, 4.2M] batched
call wants hundreds of MB and fails to compile — and (b) serializes
badly under vmap (measured on v5e: 1.6 ms for one 5.24M-lane row but
~10 ms/row in a 6-row batch). For small-k over wide rows the classic
tournament beats it by an order of magnitude:

  1. one full pass computes per-chunk (max, argmax) — the only O(n) work,
     a pure reduction that fuses and batches perfectly;
  2. k extract/repair steps: take the best chunk winner, then recompute
     just that chunk's next-best (one 4096-lane row) — O(k * chunk).

Exactness including tie order: argmax prefers the first occurrence, and
chunk-major winner order preserves ``lax.top_k``'s smaller-index-wins
rule, so results are bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_CHUNK = 4096


def _fill_for(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).min, dtype)


def _tournament_1d(x, k: int, chunk: int):
    p = x.shape[0]
    c = -(-p // chunk)
    pad = c * chunk - p
    fill = _fill_for(x.dtype)
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    xc = x.reshape(c, chunk)
    bi = jnp.argmax(xc, axis=1).astype(jnp.int32)  # [c]
    bv = jnp.take_along_axis(xc, bi[:, None], axis=1)[:, 0]

    def body(i, st):
        xc, bv, bi, ov, oi = st
        w = jnp.argmax(bv).astype(jnp.int32)
        lane = bi[w]
        ov = ov.at[i].set(bv[w])
        oi = oi.at[i].set(w * chunk + lane)
        row = lax.dynamic_slice(xc, (w, jnp.int32(0)), (1, chunk))[0]
        row = row.at[lane].set(fill)
        nbi = jnp.argmax(row).astype(jnp.int32)
        xc = lax.dynamic_update_slice(xc, row[None, :], (w, jnp.int32(0)))
        bv = bv.at[w].set(row[nbi])
        bi = bi.at[w].set(nbi)
        return xc, bv, bi, ov, oi

    ov = jnp.full((k,), fill, x.dtype)
    oi = jnp.zeros((k,), jnp.int32)
    _, _, _, ov, oi = lax.fori_loop(0, k, body, (xc, bv, bi, ov, oi))
    return ov, oi


def wide_top_k(x, k: int, chunk: int | None = None):
    """``lax.top_k(x, k)`` over the last axis, tournament-style.

    Works for any leading batch shape. Returns (values, global indices),
    bit-identical to the unchunked call."""
    if chunk is None:
        chunk = _CHUNK
    p = x.shape[-1]
    if p <= max(chunk, 2 * k) or k > chunk:
        return lax.top_k(x, k)
    lead = x.shape[:-1]
    if not lead:
        return _tournament_1d(x, k, chunk)
    flat = x.reshape((-1, p))
    ov, oi = jax.vmap(lambda v: _tournament_1d(v, k, chunk))(flat)
    return ov.reshape(lead + (k,)), oi.reshape(lead + (k,))
