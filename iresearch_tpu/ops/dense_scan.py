"""Fused Pallas scan over dense-grid spans: the speed-of-light term scan.

For a single-leaf sum tree over dense-grid spans (TermQuery, collapsed
OrHighN — the head of every query mix), the XLA dense path materializes
several [nd] f32 intermediates (unpacked freqs, scores, fold channels,
top-k operand) — ~25x the index bytes actually needed. This kernel
reads ONLY the packed freq rows and the norms, computes BM25/TFIDF
scores in-register, and reduces each 128-doc row to (max score, argmax
lane): HBM traffic collapses to the packed pools + one [nd/128] output
pair.

Top-k then runs tournament-style on the row maxima (ops/topk.py logic)
with a repair step that RE-SCORES just the winning row (128 lanes, in
plain JAX) after each extraction — exact, including the smaller-doc
tie rule.

Mosaic notes (see ops/decode.py): pltpu.repeat tiles copies — which is
exactly the planar pow2 layout's unpack; u32->f32 has no lowering, so
casts go through i32; all refs are 3-D with a unit sublane dim.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np

from iresearch_tpu.formats.bitpack import words_per_block
from iresearch_tpu.formats.spec import BLOCK

# the Pallas kernel measured ~3 ms for a 5.24M-lane span on v5e while
# the fused XLA reduction runs the same math in ~0.2 ms — XLA wins here
# (reductions fuse; Mosaic's per-step overhead dominates at these tile
# shapes). Keep the kernel behind a flag for future tuning.
_USE_PALLAS_ROWMAX = (
    __import__("os").environ.get("IRS_PALLAS_ROWMAX", "0") == "1"
)

def _rows_step(ndrows: int) -> int:
    """Rows per grid step: large tiles keep the DMA pipeline busy (a
    256-row step moves a 128 KB norms block); small segments fall back
    to whatever power of two divides."""
    for step in (256, 128, 64, 32, 16, 8, 4, 2):
        if ndrows % step == 0:
            return step
    return 1


def _score_expr(scorer, w, f, dl, avgdl, jnp):
    """Elementwise score of one span on a tile (mirrors score_block)."""
    from iresearch_tpu.search.scorers import BM25, TFIDF, BoostScore

    if isinstance(scorer, BM25):
        kb = scorer.k * scorer.b
        c0 = scorer.k - kb
        denom = f + (c0 + (kb / avgdl) * dl if scorer.b != 0.0 else c0)
        return w * f / jnp.maximum(denom, 1e-9)
    if isinstance(scorer, TFIDF):
        if scorer.with_norms:
            return w * jnp.sqrt(f) * jax.lax.rsqrt(jnp.maximum(dl, 1.0))
        return w * jnp.sqrt(f)
    if isinstance(scorer, BoostScore):
        return jnp.where(f > 0, w, 0.0)
    raise NotImplementedError(type(scorer))


@functools.partial(
    jax.jit, static_argnames=("scorer", "span_bits", "conj", "mm")
)
def dense_scan_rowmax_xla(
    span_words, span_w, norms, avgdl, *, scorer, span_bits, conj=False,
    mm=1,
):
    """jnp twin of the Pallas row-max kernel: XLA fuses the unpack +
    score + row reduction into one pass with no materialized [nd]
    operands surviving to HBM (reductions fuse into their producers)."""
    import jax.numpy as jnp

    from iresearch_tpu.formats.bitpack import unpack_jnp

    ndrows = norms.shape[0]
    if not jnp.issubdtype(norms.dtype, jnp.floating):
        # u16 doc lengths: exact integer convert (via i32 — no u16->f32)
        norms = norms.astype(jnp.int32).astype(jnp.float32)
    score = jnp.zeros((ndrows, BLOCK), jnp.float32)
    # disjunction: hit when any span has f > 0; conjunction: all spans;
    # min_match (mm >= 2): at least mm spans (the fused analog of the
    # reference's min-match early pruning, disjunction.hpp:860-1100)
    fagg = None
    for s, words in enumerate(span_words):
        f = unpack_jnp(words, span_bits[s]).astype(jnp.int32).astype(
            jnp.float32
        )
        score = score + _score_expr(
            scorer, span_w[s], f, norms, avgdl, jnp
        )
        h = (f > 0.0).astype(jnp.float32) if mm > 1 else f
        fagg = h if fagg is None else (
            jnp.minimum(fagg, h) if conj else fagg + h
        )
    hit = fagg >= float(mm) if mm > 1 else fagg > 0.0
    masked = jnp.where(hit, score, -jnp.inf)
    amax = jnp.max(masked, axis=1)
    lane_i = jnp.arange(BLOCK, dtype=jnp.int32)
    first = jnp.min(
        jnp.where(masked == amax[:, None], lane_i[None, :], BLOCK), axis=1
    ).astype(jnp.int32)
    return amax, jnp.minimum(first, BLOCK - 1)


@functools.partial(
    jax.jit,
    static_argnames=("scorer", "span_bits", "interpret", "conj", "mm"),
)
def dense_scan_rowmax(
    span_words,  # tuple: u32 [ndrows, wpb_s] per span (pre-sliced rows)
    span_w,  # tuple: f32 scalar per span
    norms,  # f32 [ndrows, 128] doc lengths (grid order, clamped >= 1)
    avgdl,  # f32 scalar
    *,
    scorer,
    span_bits: Tuple[int, ...],
    interpret: bool = False,
    conj: bool = False,
    mm: int = 1,
):
    """(row_max f32 [ndrows], row_arg i32 [ndrows]) of the summed span
    scores; rows with no hit get -inf."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndrows = norms.shape[0]
    _ROWS = _rows_step(ndrows)
    grid = ndrows // _ROWS
    S = len(span_words)

    def kernel(*refs):
        word_refs = refs[:S]
        nrm_ref = refs[S]
        w_refs = refs[S + 1 : 2 * S + 1]
        avg_ref = refs[2 * S + 1]
        max_ref, arg_ref = refs[2 * S + 2 :]
        dl = nrm_ref[0]
        avg = avg_ref[0, 0, 0]
        score = jnp.zeros((_ROWS, BLOCK), jnp.float32)
        fagg = None
        for s in range(S):
            b = span_bits[s]
            g = 32 // b
            wpb = words_per_block(b)
            mask = np.uint32(0xFFFFFFFF if b == 32 else (1 << b) - 1)
            rep = pltpu.repeat(word_refs[s][0], g, axis=1)  # [_ROWS, 128]
            lane = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 1)
            shift = (lane // np.uint32(wpb)) * np.uint32(b)
            f = ((rep >> shift) & mask).astype(jnp.int32).astype(jnp.float32)
            score = score + _score_expr(
                scorer, w_refs[s][0, 0, 0], f, dl, avg, jnp
            )
            h = (f > 0.0).astype(jnp.float32) if mm > 1 else f
            fagg = h if fagg is None else (
                jnp.minimum(fagg, h) if conj else fagg + h
            )
        hit = fagg >= float(mm) if mm > 1 else fagg > 0.0
        masked = jnp.where(hit, score, -jnp.inf)
        max_ref[0] = jnp.max(masked, axis=1).reshape(1, _ROWS)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1)
        amax = jnp.max(masked, axis=1).reshape(_ROWS, 1)
        first = jnp.min(
            jnp.where(masked == amax, lane_i, BLOCK), axis=1
        )
        arg_ref[0] = first.reshape(1, _ROWS)

    in_specs = [
        pl.BlockSpec(
            (1, _ROWS, words_per_block(span_bits[s])),
            lambda i: (i, 0, 0),
        )
        for s in range(S)
    ]
    in_specs.append(pl.BlockSpec((1, _ROWS, BLOCK), lambda i: (i, 0, 0)))
    in_specs.extend(
        pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)) for _ in range(S)
    )
    in_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)))

    args = [
        w.reshape(grid, _ROWS, words_per_block(span_bits[s]))
        for s, w in enumerate(span_words)
    ]
    args.append(norms.reshape(grid, _ROWS, BLOCK))
    args.extend(
        jnp.asarray(w, jnp.float32).reshape(1, 1, 1) for w in span_w
    )
    args.append(jnp.asarray(avgdl, jnp.float32).reshape(1, 1, 1))

    row_max, row_arg = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((grid, 1, _ROWS), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, _ROWS), jnp.int32),
        ],
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, _ROWS), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, _ROWS), lambda i: (i, 0, 0)),
        ],
        interpret=interpret,
    )(*args)
    return row_max.reshape(ndrows), row_arg.reshape(ndrows)


def _score_rows(
    span_words, span_w, span_bits, norms_rows, avgdl, rows, scorer,
    conj=False, mm=1,
):
    """Re-score M gathered rows in plain JAX: [M, 128] masked scores."""
    import jax.numpy as jnp

    m = rows.shape[0]
    if not jnp.issubdtype(norms_rows.dtype, jnp.floating):
        norms_rows = norms_rows.astype(jnp.int32).astype(jnp.float32)
    score = jnp.zeros((m, BLOCK), jnp.float32)
    fagg = None
    lane = jnp.arange(BLOCK, dtype=jnp.uint32)
    for s, words in enumerate(span_words):
        b = span_bits[s]
        g = 32 // b
        wpb = words_per_block(b)
        mask = jnp.uint32(0xFFFFFFFF if b == 32 else (1 << b) - 1)
        w_rows = words[rows]  # [M, wpb] gather
        rep = jnp.tile(w_rows, (1, g))  # [M, 128]
        shift = (lane // jnp.uint32(wpb)) * jnp.uint32(b)
        f = ((rep >> shift[None, :]) & mask).astype(jnp.int32).astype(
            jnp.float32
        )
        score = score + _score_expr(
            scorer, span_w[s], f, norms_rows, avgdl, jnp
        )
        h = (f > 0.0).astype(jnp.float32) if mm > 1 else f
        fagg = h if fagg is None else (
            jnp.minimum(fagg, h) if conj else fagg + h
        )
    hit = fagg >= float(mm) if mm > 1 else fagg > 0.0
    return jnp.where(hit, score, -jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scorer", "span_bits", "k", "interpret", "conj", "mm",
    ),
)
def dense_scan_topk(
    span_words,
    span_w,
    norms,  # f32 [ndrows, 128]
    avgdl,
    *,
    scorer,
    span_bits: Tuple[int, ...],
    k: int,
    interpret: bool = False,
    conj: bool = False,
    mm: int = 1,
):
    """Exact (vals f32 [k], docs i32 [k]) for a sum tree of dense spans
    — disjunctive (any span hits), conjunctive (all spans hit), or
    min_match (>= mm spans hit) — ordered by (-score, doc); -inf when
    matches < k.

    Refine step: the top 2k rows by row max provably contain every
    winner — at most k rows hold scores strictly above the true k-th
    (each such row contributes >=1 doc above it), and tied winners take
    the smallest doc ids, i.e. the EARLIEST tied rows, of which at most
    k are needed; ``wide_top_k``'s (value desc, row asc) order lists
    both groups inside the first 2k rows."""
    import jax.numpy as jnp

    from iresearch_tpu.ops.topk import wide_top_k

    if _USE_PALLAS_ROWMAX:
        bv, _bi = dense_scan_rowmax(
            span_words, span_w, norms, avgdl,
            scorer=scorer, span_bits=span_bits, interpret=interpret,
            conj=conj, mm=mm,
        )
    else:
        bv, _bi = dense_scan_rowmax_xla(
            span_words, span_w, norms, avgdl,
            scorer=scorer, span_bits=span_bits, conj=conj, mm=mm,
        )
    ndrows = norms.shape[0]
    m = min(max(2 * k, 16), ndrows)
    _rv, rows = wide_top_k(bv, m)
    rows = rows.astype(jnp.int32)
    scores = _score_rows(
        span_words, span_w, span_bits, norms[rows], avgdl, rows, scorer,
        conj=conj, mm=mm,
    )  # [M, 128]
    docs = rows[:, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, :]
    from iresearch_tpu.exec.candidates import topk_docs

    return topk_docs(scores.reshape(-1), docs.reshape(-1), k)
