"""Host (numpy) query evaluator — the exact-semantics reference engine.

This is the oracle the TPU executor is tested against, and the evaluator
the writer uses for Remove-by-filter. Semantics follow the reference:

* boolean algebra: And = conjunction with Not-extraction (exclusion),
  Or = min-match disjunction with Not-extraction
  (boolean_filter.cpp:57-285, boolean_query.cpp:84-244);
* scores: sum-merge of matching children, node boosts multiply downward
  (CompileScore / Sum merger, scorer.hpp:317-460);
* leaves score only the sampled terms (see expand.py), idf aggregated
  index-wide over the sample;
* phrase: tf = number of phrase occurrences; stats = summed idf of parts
  (BM25::collect accumulates += per part, bm25.cpp:366-384);
* All/ByColumnExistence match without frequency -> score 0 under BM25/TFIDF
  (reference: prepare_scorer without a freq attribute, bm25.cpp:414-425).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from iresearch_tpu.formats.postings import decode_positions, decode_term
from iresearch_tpu.formats.spec import TermCols
from iresearch_tpu.index.segment import SegmentReader
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.expand import (
    LeafExpansion,
    expand_leaf,
    expand_phrase_part,
)
from iresearch_tpu.search.scorers import BM25, BoostScore, Scorer, score_block


@dataclass
class HostResult:
    match: np.ndarray  # bool [nd]
    score: np.ndarray  # f32 [nd], zero where not matched


class HostQuery:
    """A prepared (compiled) query over a list of segments."""

    def __init__(
        self,
        flt: F.Filter,
        segments: List[SegmentReader],
        scorer: Optional[Scorer] = None,
    ) -> None:
        self.flt = flt
        self.segments = segments
        self.scorer = scorer or BM25()
        self._expansions: Dict[int, LeafExpansion] = {}
        self._field_stats: Dict[str, Tuple[int, int]] = {}
        self._collect(flt)
        self._proxy_cache: Dict[Tuple[int, int], np.ndarray] = {}

    # --- prepare: expansion + stats (reference: filter::prepare) --------

    def _field(self, name: str) -> Tuple[int, int]:
        st = self._field_stats.get(name)
        if st is None:
            dwf = 0
            ttf = 0
            for sr in self.segments:
                fp = sr.field(name)
                if fp is not None:
                    dwf += fp.docs_with_field
                    ttf += fp.total_term_freq
            st = (dwf, ttf)
            self._field_stats[name] = st
        return st

    def _collect(self, flt: F.Filter) -> None:
        if isinstance(
            flt,
            (
                F.ByTerm,
                F.ByTerms,
                F.ByPrefix,
                F.ByRange,
                F.ByGranularRange,
                F.ByWildcard,
                F.ByEditDistance,
            ),
        ):
            self._expansions[id(flt)] = expand_leaf(flt, self.segments)
        elif isinstance(flt, (F.And, F.Or)):
            for c in flt.filters:
                self._collect(c)
        elif isinstance(flt, (F.Not, F.Proxy)):
            self._collect(flt.filter)
        elif isinstance(flt, F.ByNested):
            self._collect(flt.parent)
            self._collect(flt.child)

    # --- execute --------------------------------------------------------

    def execute(self, seg_idx: int) -> HostResult:
        sr = self.segments[seg_idx]
        res = self._eval(self.flt, seg_idx, 1.0)
        alive = sr.alive
        match = res.match & alive
        return HostResult(match, np.where(match, res.score, 0.0).astype(np.float32))

    def top_k(self, k: int) -> List[Tuple[int, float]]:
        """Global top-k as (global_doc, score), ordered by (-score, doc)."""
        out: List[Tuple[int, float]] = []
        base = 0
        for s, sr in enumerate(self.segments):
            r = self.execute(s)
            docs = np.flatnonzero(r.match)
            for d in docs:
                out.append((base + int(d), float(r.score[d])))
            base += sr.num_docs
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]

    # --- node evaluation -----------------------------------------------

    def _eval(self, flt: F.Filter, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs

        if isinstance(flt, F.Empty):
            return HostResult(np.zeros(nd, bool), np.zeros(nd, np.float32))
        if isinstance(flt, F.All):
            return HostResult(
                np.ones(nd, bool), np.zeros(nd, np.float32)
            )  # no freq -> score 0 (reference default boost_as_score=false)
        if isinstance(flt, F.ByColumnExistence):
            match = np.zeros(nd, bool)
            if getattr(flt, "prefix_match", False):
                names = [
                    n for n in sr.column_names() if n.startswith(flt.column)
                ]
            else:
                names = [flt.column] if sr.column(flt.column) is not None else []
            for n in names:
                col = sr.column(n)
                if col is not None:
                    match[col.doc_ids().astype(np.int64)] = True
            return HostResult(match, np.zeros(nd, np.float32))
        if isinstance(flt, F.Proxy):
            key = (id(flt), s)
            cached = self._proxy_cache.get(key)
            if cached is None:
                r = self._eval(flt.filter, s, boost * flt.boost)
                self._proxy_cache[key] = r.match
                return r
            r = self._eval(flt.filter, s, boost * flt.boost)
            return HostResult(cached, r.score)
        if isinstance(
            flt,
            (
                F.ByTerm,
                F.ByTerms,
                F.ByPrefix,
                F.ByRange,
                F.ByGranularRange,
                F.ByWildcard,
                F.ByEditDistance,
            ),
        ):
            return self._eval_terms_leaf(flt, s, boost)
        if isinstance(flt, (F.ByPhrase, F.BySamePosition)):
            return self._eval_positional(flt, s, boost)
        if isinstance(flt, F.ByNgramSimilarity):
            return self._eval_ngram_similarity(flt, s, boost)
        if isinstance(flt, F.ByNested):
            return self._eval_nested(flt, s, boost)
        if isinstance(flt, F.And):
            return self._eval_and(flt, s, boost)
        if isinstance(flt, F.Or):
            return self._eval_or(flt, s, boost)
        if isinstance(flt, F.Not):
            # bare Not == All AND NOT x (reference wraps into exclusion)
            inner = self._eval(flt.filter, s, 1.0)
            return HostResult(~inner.match, np.zeros(nd, np.float32))
        raise TypeError(f"unsupported filter: {flt!r}")

    def _eval_terms_leaf(self, flt, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs
        field_name = flt.field
        fp = sr.field(field_name)
        match_count = np.zeros(nd, np.int32)
        score = np.zeros(nd, np.float32)
        exp = self._expansions[id(flt)]
        dwf, ttf = self._field(field_name)
        avgdl = (ttf / dwf) if dwf else 1.0
        leaf_boost = boost * flt.boost
        if fp is None:
            return HostResult(np.zeros(nd, bool), score)
        for h in exp.scored:
            if h.seg != s:
                continue
            docs, freqs = decode_term(fp, h.tid)
            idf = self.scorer.idf(exp.stats_df[h.key], dwf)
            w = self.scorer.term_weight(leaf_boost * h.boost, idf)
            dl = np.maximum(fp.norms[docs], 1).astype(np.float32)
            sc = score_block(
                self.scorer,
                np.float32(w),
                freqs.astype(np.float32),
                dl,
                avgdl,
            )
            score[docs] += sc
            match_count[docs] += 1
        for h in exp.unscored:
            if h.seg != s:
                continue
            docs, _ = decode_term(fp, h.tid)
            match_count[docs] += 1
        min_match = getattr(flt, "min_match", 1)
        match = match_count >= max(1, min_match)
        return HostResult(match, np.where(match, score, 0.0))

    def _eval_positional(self, flt, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs
        if isinstance(flt, F.BySamePosition):
            parts = [(0, fld, [sr.lookup_term(fld, t)]) for fld, t in flt.terms]
            parts = [
                (off, fld, [t for t in tids if t is not None])
                for off, fld, tids in parts
            ]
        else:
            parts = [
                (off, flt.field, expand_phrase_part(p, flt.field, sr))
                for off, p in flt.parts
            ]
        score = np.zeros(nd, np.float32)
        match = np.zeros(nd, bool)
        if not parts or any(len(tids) == 0 for _, _, tids in parts):
            return HostResult(match, score)
        # per-part: doc -> set of (pos - offset)
        part_maps: List[Dict[int, set]] = []
        for off, fld, tids in parts:
            fp = sr.field(fld)
            if fp is None or fp.pos_flat is None:
                return HostResult(match, score)
            m: Dict[int, set] = {}
            for tid in tids:
                docs, _ = decode_term(fp, tid)
                plists = decode_positions(fp, tid)
                for d, ps in zip(docs, plists):
                    m.setdefault(int(d), set()).update(int(p) - off for p in ps)
            part_maps.append(m)
        # smallest map drives the intersection
        driver = min(range(len(part_maps)), key=lambda i: len(part_maps[i]))
        field_name = parts[0][1]
        fp = sr.field(field_name)
        dwf, ttf = self._field(field_name)
        avgdl = (ttf / dwf) if dwf else 1.0
        # stats: summed idf over parts (reference accumulates += per part)
        idf_sum = 0.0
        for off, fld, tids in parts:
            # per-part df = index-wide df summed over the part's variants
            df = self._phrase_part_df(fld, tids, sr)
            idf_sum += self.scorer.idf(max(df, 1), max(dwf, 1))
        w = self.scorer.term_weight(boost * flt.boost, idf_sum)
        for d, positions in part_maps[driver].items():
            common = positions
            for i, m in enumerate(part_maps):
                if i == driver:
                    continue
                o = m.get(d)
                if not o:
                    common = set()
                    break
                common = common & o
                if not common:
                    break
            if common:
                tf = np.float32(len(common))
                dl = np.float32(max(int(fp.norms[d]), 1))
                score[d] = score_block(
                    self.scorer,
                    np.float32(w),
                    tf.reshape(1, 1),
                    dl.reshape(1, 1),
                    avgdl,
                )[0, 0]
                match[d] = True
        return HostResult(match, score)

    def _eval_ngram_similarity(self, flt, s: int, boost: float) -> HostResult:
        """Longest ngram-subsequence matching (ngram_similarity_query.cpp).

        A doc matches when the longest subsequence of the query ngrams that
        appears at strictly increasing positions has length >= ceil(Q *
        threshold); score = filter_boost (len/Q) * scorer(tf=count of
        position-disjoint longest sequences). Difference from the
        reference: disjoint repeats may use any longest pattern, not only
        the first-found one.
        """
        import math as _math

        sr = self.segments[s]
        nd = sr.num_docs
        score = np.zeros(nd, np.float32)
        match = np.zeros(nd, bool)
        fp = sr.field(flt.field)
        if fp is None or fp.pos_flat is None or not flt.ngrams:
            return HostResult(match, score)
        Q = len(flt.ngrams)
        mm = min(max(int(_math.ceil(Q * flt.threshold)), 1), Q)
        # positions per query index per doc
        doc_pos: Dict[int, List[List[int]]] = {}
        idf_sum = 0.0
        dwf, ttf = self._field(flt.field)
        avgdl = (ttf / dwf) if dwf else 1.0
        for qi, g in enumerate(flt.ngrams):
            df_total = 0
            for sr2 in self.segments:
                fp2 = sr2.field(flt.field)
                tid2 = sr2.lookup_term(flt.field, g)
                if fp2 is not None and tid2 is not None:
                    df_total += int(fp2.entries[tid2, TermCols.DF])
            idf_sum += self.scorer.idf(max(df_total, 1), max(dwf, 1))
            tid = sr.lookup_term(flt.field, g)
            if tid is None:
                continue
            docs, _ = decode_term(fp, tid)
            plists = decode_positions(fp, tid)
            for d, ps in zip(docs, plists):
                slots = doc_pos.setdefault(int(d), [[] for _ in range(Q)])
                slots[qi].extend(int(p) for p in ps)

        def longest_chain(slots, used):
            """(best_len, positions of one best chain) via LIS-style DP."""
            best_len = 0
            best_chain: List[int] = []
            # state per qi: list of (pos, length, chain)
            prev: Dict[int, Tuple[int, List[int]]] = {}  # pos -> (len, chain)
            for qi in range(len(slots)):
                cur: Dict[int, Tuple[int, List[int]]] = {}
                for p in slots[qi]:
                    if p in used:
                        continue
                    bl, bc = 0, []
                    for pp, (l2, c2) in prev.items():
                        if pp < p and l2 > bl:
                            bl, bc = l2, c2
                    cur[p] = (bl + 1, bc + [p])
                    if bl + 1 > best_len:
                        best_len, best_chain = bl + 1, cur[p][1]
                for p, v in cur.items():
                    if p not in prev or v[0] > prev[p][0]:
                        prev[p] = v
            return best_len, best_chain

        for d, slots in doc_pos.items():
            if not sr.alive[d]:
                continue
            used: set = set()
            L, chain = longest_chain(slots, used)
            if L < mm:
                continue
            freq = 0
            Lbest = L
            while L == Lbest and chain:
                freq += 1
                used.update(chain)
                L, chain = longest_chain(slots, used)
            fb = Lbest / Q
            w = self.scorer.term_weight(boost * flt.boost, idf_sum)
            dl = np.float32(max(int(fp.norms[d]), 1))
            sc = score_block(
                self.scorer,
                np.float32(w),
                np.float32(freq).reshape(1, 1),
                dl.reshape(1, 1),
                avgdl,
            )[0, 0]
            score[d] = fb * sc
            match[d] = True
        return HostResult(match, score)

    def _phrase_part_df(self, field_name: str, tids_in_sr, sr) -> int:
        """Index-wide df of a phrase part (sum of its variants' terms)."""
        terms = {sr.terms(field_name)[tid] for tid in tids_in_sr}
        df = 0
        for sr2 in self.segments:
            fp2 = sr2.field(field_name)
            if fp2 is None:
                continue
            for t in terms:
                tid2 = sr2.lookup_term(field_name, t)
                if tid2 is not None:
                    df += int(fp2.entries[tid2, 0])
        return df

    def _eval_nested(self, flt: F.ByNested, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs
        parent = self._eval(flt.parent, s, 1.0)
        child = self._eval(flt.child, s, boost * flt.boost)
        match = np.zeros(nd, bool)
        score = np.zeros(nd, np.float32)
        parents = np.flatnonzero(parent.match)
        prev = -1
        for p in parents:
            kids = slice(prev + 1, p)
            cnt = int(child.match[kids].sum())
            lo = flt.min_match
            hi = flt.max_match if flt.max_match is not None else np.iinfo(np.int32).max
            if lo <= cnt <= hi:
                match[p] = True
                score[p] = child.score[kids].sum()
            prev = p
        return HostResult(match, score)

    @staticmethod
    def _merge_scores(scores, matches, merge, nd):
        """Combine matching children's scores (ScoreMergeType semantics)."""
        if merge == "noop" or not scores:
            return np.zeros(nd, np.float32)
        if merge == "sum":
            return np.sum(scores, axis=0, dtype=np.float32)
        stack = np.stack(scores)
        mstack = np.stack(matches)
        if merge == "max":
            return np.max(np.where(mstack, stack, -np.inf), axis=0, initial=-np.inf).astype(np.float32)
        # min over matching children only
        out = np.min(np.where(mstack, stack, np.inf), axis=0, initial=np.inf)
        return out.astype(np.float32)

    def _split_not(self, children):
        pos = [c for c in children if not isinstance(c, F.Not)]
        neg = [c.filter for c in children if isinstance(c, F.Not)]
        return pos, neg

    def _eval_and(self, flt: F.And, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs
        pos, neg = self._split_not(flt.filters)
        b = boost * flt.boost
        match = np.ones(nd, bool)
        scores = []
        matches = []
        for c in pos:
            r = self._eval(c, s, b)
            match &= r.match
            scores.append(r.score)
            matches.append(r.match)
        score = self._merge_scores(scores, matches, flt.merge, nd)
        for c in neg:
            r = self._eval(c, s, 1.0)
            match &= ~r.match
        score = np.where(np.isfinite(score), score, 0.0).astype(np.float32)
        return HostResult(match, np.where(match, score, 0.0))

    def _eval_or(self, flt: F.Or, s: int, boost: float) -> HostResult:
        sr = self.segments[s]
        nd = sr.num_docs
        pos, neg = self._split_not(flt.filters)
        b = boost * flt.boost
        count = np.zeros(nd, np.int32)
        scores = []
        matches = []
        for c in pos:
            r = self._eval(c, s, b)
            count += r.match.astype(np.int32)
            scores.append(r.score)
            matches.append(r.match)
        score = self._merge_scores(scores, matches, flt.merge, nd)
        score = np.where(np.isfinite(score), score, 0.0).astype(np.float32)
        if flt.min_match <= 0:
            match = np.ones(nd, bool)
        else:
            match = count >= flt.min_match
        for c in neg:
            r = self._eval(c, s, 1.0)
            match &= ~r.match
        return HostResult(match, np.where(match, score, 0.0))


def match_docs(flt: F.Filter, sr: SegmentReader) -> np.ndarray:
    """Alive docs matching ``flt`` in one segment (writer delete path)."""
    q = HostQuery(flt, [sr], BoostScore())
    return np.flatnonzero(q.execute(0).match)


def search(
    reader, flt: F.Filter, scorer: Optional[Scorer] = None, k: int = 10
) -> List[Tuple[int, float]]:
    """Convenience: top-k (global_doc, score) over a DirectoryReader."""
    q = HostQuery(flt, list(reader.segments), scorer)
    return q.top_k(k)
