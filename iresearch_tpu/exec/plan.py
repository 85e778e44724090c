"""Filter -> device block-scan plan compiler.

The reference compiles a filter into per-segment prepared state holding
cached term cookies and collected stats (filter::prepare,
core/search/filter.hpp:62-78; multiterm_query.hpp; states_cache.hpp). The
TPU analog compiles, per segment, a *flat row program*:

* every scored/unscored sampled term contributes its postings-block rows to
  a per-(field, width-class) **row group**: `rows[i]` (row index into the
  class pools), `weight[i]` (final per-term score weight, 0 for match-only
  terms), `leaf[i]` (which leaf of the boolean tree the row feeds);
* the boolean structure is a static nested-tuple **tree** folded elementwise
  over per-leaf dense `[num_docs]` match-count/score arrays at trace time
  (the analog of conjunction.hpp / disjunction.hpp / exclusion.hpp);
* positional / nested / columnar leaves fall back to the host oracle and are
  injected as dense aux arrays (device phrase execution comes via the
  positions kernel path).

Row counts are padded to powers of two with sentinel row 0 (zero block:
freq 0 => zero score, zero matches), so jit signatures come from a small
set and the executor needs no masks.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Tuple

import numpy as np

from iresearch_tpu.formats.spec import TermCols
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.scorers import Scorer

# Leaf filters whose expansion is a set of (term, boost) postings slices.
TERM_LEAVES = (
    F.ByTerm,
    F.ByTerms,
    F.ByPrefix,
    F.ByRange,
    F.ByGranularRange,
    F.ByWildcard,
    F.ByEditDistance,
)
# Leaves executed by the host oracle and injected as dense aux arrays.
AUX_LEAVES = (
    F.ByPhrase,
    F.BySamePosition,
    F.ByNgramSimilarity,
    F.ByNested,
    F.ByColumnExistence,
    F.Proxy,
)


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@dataclass
class RowGroup:
    """Rows of one (field, doc-class, freq-class) pool pair feeding the
    leaf arrays. rows_d indexes the doc-delta pool of class dcls; rows_f
    indexes the freq pool of class fcls (parallel arrays)."""

    field_name: str
    dcls: int
    fcls: int
    rows_d: np.ndarray  # i32 [R] padded with 0 (sentinel row)
    rows_f: np.ndarray  # i32 [R]
    weight: np.ndarray  # f32 [R]
    leaf: np.ndarray  # i32 [R]


@dataclass
class SegmentPlan:
    """Everything the executor needs for one segment, host-side numpy."""

    seg_idx: int
    num_docs: int
    nd_pad: int
    groups: List[RowGroup]
    num_leaves: int
    leaf_min_match: np.ndarray  # i32 [L]
    tree: tuple  # static nested tuples, hashable (part of the jit key)
    aux_match: Optional[np.ndarray]  # bool [A, nd_pad]
    aux_score: Optional[np.ndarray]  # f32 [A, nd_pad]
    # per-group avgdl of its field (index-wide), traced scalar input
    group_avgdl: np.ndarray  # f32 [len(groups)]

    def signature(self) -> tuple:
        """Hashable jit cache key component (shapes drive the rest)."""
        return (
            self.tree,
            self.num_leaves,
            tuple(
                (g.field_name, g.dcls, g.fcls, len(g.rows_d)) for g in self.groups
            ),
            0 if self.aux_match is None else self.aux_match.shape[0],
        )


class PlanCompiler:
    """Compiles one prepared query (filter + expansions + stats) per segment.

    ``prepared`` must expose `_expansions[id(flt)]`, `_field(name) -> (dwf,
    ttf)` and `_eval(flt, seg, boost) -> HostResult` — i.e. a
    `host_eval.HostQuery`. Sharing the prepare step guarantees the device
    path scores the exact terms/stats the oracle does.
    """

    def __init__(self, prepared, scorer: Scorer) -> None:
        self.prepared = prepared
        self.scorer = scorer

    def compile(self, flt: F.Filter, seg_idx: int) -> SegmentPlan:
        sr = self.prepared.segments[seg_idx]
        self._sr = sr
        self._seg = seg_idx
        self._groups: Dict[Tuple[str, int], List[Tuple[int, int, float, int]]] = {}
        self._leaf_mm: List[int] = []
        self._aux: List[Tuple[np.ndarray, np.ndarray]] = []
        tree = self._walk(flt, 1.0)
        nd = sr.num_docs
        nd_pad = _pow2(max(1, nd))

        groups: List[RowGroup] = []
        avgdls: List[float] = []
        for (fname, dcls, fcls), spans in sorted(self._groups.items()):
            rd_l: List[np.ndarray] = []
            rf_l: List[np.ndarray] = []
            w_l: List[np.ndarray] = []
            leaf_l: List[np.ndarray] = []
            for dstart, fstart, nblocks, w, leaf in spans:
                rd_l.append(np.arange(dstart, dstart + nblocks, dtype=np.int32))
                rf_l.append(np.arange(fstart, fstart + nblocks, dtype=np.int32))
                w_l.append(np.full(nblocks, w, np.float32))
                leaf_l.append(np.full(nblocks, leaf, np.int32))
            rows_d = np.concatenate(rd_l) if rd_l else np.zeros(0, np.int32)
            rows_f = np.concatenate(rf_l) if rf_l else np.zeros(0, np.int32)
            w = np.concatenate(w_l) if w_l else np.zeros(0, np.float32)
            leaf = np.concatenate(leaf_l) if leaf_l else np.zeros(0, np.int32)
            rp = _pow2(max(8, len(rows_d)))
            rows_d = np.pad(rows_d, (0, rp - len(rows_d)))
            rows_f = np.pad(rows_f, (0, rp - len(rows_f)))
            w = np.pad(w, (0, rp - len(w)))
            leaf = np.pad(leaf, (0, rp - len(leaf)))
            groups.append(RowGroup(fname, dcls, fcls, rows_d, rows_f, w, leaf))
            dwf, ttf = self.prepared._field(fname)
            avgdls.append((ttf / dwf) if dwf else 1.0)

        L = max(1, len(self._leaf_mm))
        leaf_mm = np.ones(L, np.int32)
        leaf_mm[: len(self._leaf_mm)] = np.asarray(self._leaf_mm or [1], np.int32)

        if self._aux:
            am = np.zeros((len(self._aux), nd_pad), np.bool_)
            asc = np.zeros((len(self._aux), nd_pad), np.float32)
            for i, (m, s) in enumerate(self._aux):
                am[i, : len(m)] = m
                asc[i, : len(s)] = s
        else:
            am = asc = None

        return SegmentPlan(
            seg_idx=seg_idx,
            num_docs=nd,
            nd_pad=nd_pad,
            groups=groups,
            num_leaves=L,
            leaf_min_match=leaf_mm,
            tree=tree,
            aux_match=am,
            aux_score=asc,
            group_avgdl=np.asarray(avgdls, np.float32),
        )

    # --- tree walk (mirrors host_eval._eval boost propagation) ----------

    def _walk(self, flt: F.Filter, boost: float) -> tuple:
        if isinstance(flt, F.Empty):
            return ("empty",)
        if isinstance(flt, F.All):
            return ("all",)
        if isinstance(flt, TERM_LEAVES):
            return ("leaf", self._make_leaf(flt, boost))
        if isinstance(flt, AUX_LEAVES):
            return ("aux", self._make_aux(flt, boost))
        if isinstance(flt, F.And):
            b = boost * flt.boost
            pos = tuple(
                self._walk(c, b) for c in flt.filters if not isinstance(c, F.Not)
            )
            neg = tuple(
                self._walk(c.filter, 1.0)
                for c in flt.filters
                if isinstance(c, F.Not)
            )
            return ("and", pos, neg)
        if isinstance(flt, F.Or):
            b = boost * flt.boost
            pos = tuple(
                self._walk(c, b) for c in flt.filters if not isinstance(c, F.Not)
            )
            neg = tuple(
                self._walk(c.filter, 1.0)
                for c in flt.filters
                if isinstance(c, F.Not)
            )
            return ("or", pos, neg, int(flt.min_match))
        if isinstance(flt, F.Not):
            return ("not", self._walk(flt.filter, 1.0))
        # anything else: host fallback
        return ("aux", self._make_aux(flt, boost))

    def _make_leaf(self, flt, boost: float) -> int:
        leaf = len(self._leaf_mm)
        self._leaf_mm.append(max(1, int(getattr(flt, "min_match", 1))))
        exp = self.prepared._expansions[id(flt)]
        fname = flt.field
        fp = self._sr.field(fname)
        if fp is None:
            return leaf
        dwf, _ = self.prepared._field(fname)
        leaf_boost = boost * flt.boost
        for h in exp.scored:
            if h.seg != self._seg:
                continue
            idf = self.scorer.idf(exp.stats_df[h.key], dwf)
            w = float(self.scorer.term_weight(leaf_boost * h.boost, idf))
            self._add_span(fname, fp, h.tid, w, leaf)
        for h in exp.unscored:
            if h.seg != self._seg:
                continue
            self._add_span(fname, fp, h.tid, 0.0, leaf)
        return leaf

    def _add_span(self, fname: str, fp, tid: int, w: float, leaf: int) -> None:
        e = fp.entries[tid]
        key = (fname, int(e[TermCols.DCLS]), int(e[TermCols.FCLS]))
        self._groups.setdefault(key, []).append(
            (
                int(e[TermCols.DSTART]),
                int(e[TermCols.FSTART]),
                int(e[TermCols.NBLOCKS]),
                w,
                leaf,
            )
        )

    def _make_aux(self, flt, boost: float) -> int:
        r = self.prepared._eval(flt, self._seg, boost)
        self._aux.append((r.match, r.score))
        return len(self._aux) - 1
