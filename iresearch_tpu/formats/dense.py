"""Dense (doc-grid) representation for high-df terms.

A term whose df approaches the corpus size makes candidate-space
execution O(corpus) *with sort constants*: the 3-operand lax.sort over
an OrHighHigh's ~16M decoded lanes measured ~400 ms on v5e, and the
dense tier's scatter-adds are no better (~30 ns/lane serialized).
TPU-natively, such a term is better stored **in doc-grid order**: one
packed freq lane per doc (freq 0 = absent), rows of 128 docs in the
same planar pow2-width classes as the delta pools. Placement in the
[nd] fold then costs *nothing* — the data is already grid-aligned, so
a leaf's contribution is a sequential unpack + elementwise score at
HBM stream speed, with no sort, no scatter and no gather.

This mirrors what roaring bitmaps / Lucene dense blocks do for high-df
postings (reference: sparse_bitmap.hpp ALL/dense containers), taken one
step further: frequencies, not just membership, live on the grid.

The cache is reader-side acceleration: on-disk postings stay in delta
blocks; the grid pools are derived per segment at open (vectorized
numpy) and uploaded once. The host oracle never reads them, so the
device==oracle exactness gate also validates this path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from iresearch_tpu.formats.bitpack import BITS, bits_class, pack_blocks
from iresearch_tpu.formats.postings import FieldPostings
from iresearch_tpu.formats.spec import BLOCK, NUM_CLASSES, TermCols, pad_docs

# df >= nd / DENSE_MIN_RATIO qualifies a term for the grid representation.
# Measured on v5e (scripts/bench_placement.py): grid streaming costs
# ~0.7 ns/lane while the gather/scatter/sort alternatives cost 4-10
# ns/lane — so any term whose lists disjunctions/conjunctions routinely
# touch should live on the grid. 64 reaches the luceneutil "Med" band;
# storage is device-side only and capped below.
DENSE_MIN_RATIO = 128
# grid rows cost nd/128 rows per term; cap the cache size per field
DENSE_MAX_TERMS = 512


@dataclass
class DenseCache:
    """Grid-order freq pools for one field's high-df terms (host numpy)."""

    ndrows: int  # rows per term == nd_pad / 128
    # tid -> (width class, first row in that class's pool)
    spans: Dict[int, Tuple[int, int]]
    pools: List[np.ndarray]  # u32 [rows_c, words_per_block(BITS[c])]
    bmaxf: List[np.ndarray]  # u32 [rows_c] max freq per 128-doc row
    host_bytes: int = 0


def build_dense_cache(fp: FieldPostings, num_docs: int) -> Optional[DenseCache]:
    """Select high-df terms and repack their freqs in doc-grid order.

    Returns None when the field has no qualifying terms or the doc axis
    is too small to align to 128-lane rows (pad_docs(nd) % 128 != 0).
    """
    nd_pad = pad_docs(num_docs)
    if nd_pad % BLOCK != 0:
        return None
    T = fp.num_terms
    if T == 0:
        return None
    df = fp.entries[:, TermCols.DF].astype(np.int64)
    # floor of 32: a shorter list gains nothing from a grid of nd lanes
    thresh = max(32, num_docs // DENSE_MIN_RATIO)
    sel = np.flatnonzero(df >= thresh)
    if len(sel) == 0:
        return None
    if len(sel) > DENSE_MAX_TERMS:
        sel = sel[np.argsort(-df[sel], kind="stable")[:DENSE_MAX_TERMS]]
        sel.sort()
    ndrows = nd_pad // BLOCK

    from iresearch_tpu.formats.postings import decode_term

    per_class: List[List[int]] = [[] for _ in range(NUM_CLASSES)]
    for tid in sel.tolist():
        c = int(bits_class(np.uint32(fp.entries[tid, TermCols.MAX_FREQ])))
        per_class[c].append(tid)

    from iresearch_tpu.formats.bitpack import words_per_block

    spans: Dict[int, Tuple[int, int]] = {}
    pools: List[np.ndarray] = []
    bmaxf: List[np.ndarray] = []
    host_bytes = 0
    grid = np.zeros((ndrows, BLOCK), np.uint32)  # reused per term
    for c in range(NUM_CLASSES):
        tids = per_class[c]
        rows_c = 1 + ndrows * len(tids)  # row 0: zero sentinel
        # pack per term into the preallocated word pool: one [ndrows, 128]
        # unpacked temp at a time (a single class matrix for hundreds of
        # 5M-doc terms would be a multi-GB host allocation)
        packed = np.zeros((rows_c, words_per_block(BITS[c])), np.uint32)
        bm = np.zeros(rows_c, np.uint32)
        for i, tid in enumerate(tids):
            start = 1 + i * ndrows
            grid[:] = 0
            docs, freqs = decode_term(fp, tid)
            grid.reshape(-1)[docs.astype(np.int64)] = freqs
            packed[start : start + ndrows] = pack_blocks(grid, BITS[c])
            bm[start : start + ndrows] = grid.max(axis=1)
            spans[tid] = (c, start)
        pools.append(packed)
        bmaxf.append(bm)
        host_bytes += packed.nbytes + bm.nbytes
    return DenseCache(
        ndrows=ndrows, spans=spans, pools=pools, bmaxf=bmaxf,
        host_bytes=host_bytes,
    )
