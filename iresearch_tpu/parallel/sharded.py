"""Segment-sharded query execution over a jax.sharding.Mesh.

Layout: all per-segment arrays are stacked with a leading segment axis
``[S, ...]`` (S padded to a multiple of the mesh size with empty segments)
and sharded along the mesh's only axis. One jitted shard_map program per
plan signature runs the shared dense segment body (exec/executor.py:
segment_body) on each local segment, takes a local top-k, converts to
global doc ids, and merges across the mesh with ``all_gather`` over ICI +
a lexicographic (-score, doc) re-rank — bitwise-identical ranking on every
shard, so exact top-k is preserved under sharding (SURVEY.md §7 "hard
parts": float-order control via fixed merge order + doc-id tie-break).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from iresearch_tpu.exec.executor import _NEG_INF, segment_body
from iresearch_tpu.exec.plan import PlanCompiler, SegmentPlan
from iresearch_tpu.formats.bitpack import BITS, words_per_block
from iresearch_tpu.formats.spec import NUM_CLASSES
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25, Scorer

AXIS = "d"


def make_mesh(devices=None, axis: str = AXIS):
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "tree", "gbits", "scorer", "num_leaves", "k", "nd", "per_shard"
    ),
)
def _sharded_topk(
    pools_st,  # per group: (doc_words [S,R,4b], freq_words [S,Rf,4b], base [S,R], norms [S,nd])
    rowsets_st,  # per group: (rows_d [S,R], rows_f [S,R], w [S,R], leaf [S,R])
    avgdl,  # f32 [G] (replicated)
    leaf_min,  # i32 [L] (replicated)
    aux_match,  # bool [S, A, nd] or None
    aux_score,  # f32 [S, A, nd] or None
    alive_st,  # bool [S, nd]
    doc_base,  # i32 [S]
    *,
    mesh,
    tree,
    gbits,
    scorer: Scorer,
    num_leaves: int,
    k: int,
    nd: int,
    per_shard: int,
):
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def local(pools_l, rowsets_l, aux_m_l, aux_s_l, alive_l, base_l):
        vals_l = []
        docs_l = []
        for s in range(per_shard):
            pools_s = tuple(
                (d[s], f[s], b[s], n[s]) for (d, f, b, n) in pools_l
            )
            rowsets_s = tuple(
                (rd[s], rf[s], w[s], l[s]) for (rd, rf, w, l) in rowsets_l
            )
            am = None if aux_m_l is None else aux_m_l[s]
            asc = None if aux_s_l is None else aux_s_l[s]
            match, score = segment_body(
                pools_s,
                rowsets_s,
                avgdl,
                leaf_min,
                am,
                asc,
                alive_l[s],
                tree=tree,
                gbits=gbits,
                scorer=scorer,
                num_leaves=num_leaves,
                nd=nd,
            )
            masked = jnp.where(match, score, _NEG_INF)
            v, d = lax.top_k(masked, k)
            vals_l.append(v)
            docs_l.append(d + base_l[s])
        vals = jnp.concatenate(vals_l)
        docs = jnp.concatenate(docs_l)
        # ICI merge: gather all shards' candidates, identical re-rank everywhere
        vals_all = lax.all_gather(vals, AXIS).reshape(-1)
        docs_all = lax.all_gather(docs, AXIS).reshape(-1)
        order = jnp.lexsort((docs_all, -vals_all))
        top = order[:k]
        return vals_all[top], docs_all[top]

    sh = P(AXIS)
    in_specs = (
        tuple((sh, sh, sh, sh) for _ in pools_st),
        tuple((sh, sh, sh, sh) for _ in rowsets_st),
        sh,
        sh,
        sh,
        sh,
    )

    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=(P(), P()))
    # the replicated-output check kwarg was renamed across jax versions
    for flag in ("check_vma", "check_rep"):
        try:
            fn = shard_map(local, **kw, **{flag: False})
            break
        except TypeError:
            continue
    else:
        fn = shard_map(local, **kw)
    return fn(pools_st, rowsets_st, aux_match, aux_score, alive_st, doc_base)


class ShardedSearcher:
    """Shards a reader's segments across a 1-D mesh and runs exact top-k.

    Building the searcher uploads the stacked pools once with a
    NamedSharding along the mesh axis (the device_put analog of the
    reference's per-segment mmap warmup).
    """

    def __init__(self, segments: Sequence, mesh=None) -> None:
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = AXIS
        self.D = self.mesh.devices.size
        self.segments = list(segments)
        S = max(1, math.ceil(len(self.segments) / self.D) * self.D)
        self.S = S
        self.per_shard = S // self.D
        self.nd_pad = max(
            [_pow2(max(1, sr.num_docs)) for sr in self.segments] or [1]
        )
        self._doc_base = np.zeros(S, np.int32)
        base = 0
        for i, sr in enumerate(self.segments):
            self._doc_base[i] = base
            base += sr.num_docs
        self.total_docs = base
        self._field_pool_cache: Dict[str, tuple] = {}
        self._alive = self._stack_alive()

    # --- stacked device residency ---------------------------------------

    def _put(self, arr: np.ndarray, spec_dims: int):
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.axis, *([None] * (spec_dims - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _stack_alive(self):
        alive = np.zeros((self.S, self.nd_pad), np.bool_)
        for i, sr in enumerate(self.segments):
            alive[i, : sr.num_docs] = sr.alive
        return self._put(alive, 2)

    def _field_pools(self, fname: str):
        """Stacked per-class pools for one field: ([(doc_words, base)],
        [(freq_words,)], norms)."""
        cached = self._field_pool_cache.get(fname)
        if cached is not None:
            return cached

        def stack(attr, extra=None):
            per_class = []
            for c in range(NUM_CLASSES):
                rmax = 1
                for sr in self.segments:
                    fp = sr.field(fname)
                    if fp is not None:
                        rmax = max(rmax, getattr(fp, attr)[c].shape[0])
                rmax = _pow2(rmax)
                words = np.zeros(
                    (self.S, rmax, words_per_block(BITS[c])), np.uint32
                )
                extra_arr = np.zeros((self.S, rmax), np.int32)
                for i, sr in enumerate(self.segments):
                    fp = sr.field(fname)
                    if fp is None:
                        continue
                    src = getattr(fp, attr)[c]
                    words[i, : src.shape[0]] = src
                    if extra is not None:
                        e = getattr(fp, extra)[c]
                        extra_arr[i, : len(e)] = e.astype(np.int32)
                if extra is not None:
                    per_class.append((self._put(words, 3), self._put(extra_arr, 2)))
                else:
                    per_class.append((self._put(words, 3),))
            return per_class

        doc_cls = stack("doc_words", "base")
        freq_cls = stack("freq_words")
        norms = np.ones((self.S, self.nd_pad), np.float32)
        for i, sr in enumerate(self.segments):
            fp = sr.field(fname)
            if fp is not None:
                norms[i, : len(fp.norms)] = np.maximum(fp.norms, 1)
        out = (doc_cls, freq_cls, self._put(norms, 2))
        self._field_pool_cache[fname] = out
        return out

    # --- query ----------------------------------------------------------

    def search(
        self, flt: F.Filter, scorer: Optional[Scorer] = None, k: int = 10
    ) -> List[Tuple[int, float]]:
        vals, docs = self.search_arrays(flt, scorer, k)
        out = []
        for v, d in zip(np.asarray(vals), np.asarray(docs)):
            if math.isinf(v) and v < 0:
                continue
            out.append((int(d), float(v)))
        return out

    def search_arrays(self, flt: F.Filter, scorer: Optional[Scorer], k: int):
        return self.prepare(flt, scorer).run(k)

    def prepare(self, flt: F.Filter, scorer: Optional[Scorer] = None):
        """Compile + upload once; the returned query re-runs dispatch-only
        (reference analog: filter::prepare caching per-segment state)."""
        import jax.numpy as jnp

        scorer = scorer or BM25()
        prepared = HostQuery(flt, self.segments, scorer)
        compiler = PlanCompiler(prepared, scorer)
        plans = [
            compiler.compile(flt, s, device_phrase=False, modes=False)
            for s in range(len(self.segments))
        ]
        tree = plans[0].tree
        num_leaves = plans[0].num_leaves
        leaf_min = plans[0].leaf_min_match

        # union of (field, dcls, fcls) groups over all shards
        keys = sorted(
            {(g.field_name, g.dcls, g.fcls) for p in plans for g in p.groups}
        )
        G = len(keys)
        rmax = {kk: 8 for kk in keys}
        for p in plans:
            for g in p.groups:
                kk = (g.field_name, g.dcls, g.fcls)
                rmax[kk] = max(rmax[kk], len(g.rows_d))
        pools_st = []
        rowsets_st = []
        gbits = []
        avgdl = np.ones(max(G, 1), np.float32)
        for gi, (fname, dcls, fcls) in enumerate(keys):
            doc_cls, freq_cls, norms = self._field_pools(fname)
            doc_words, base = doc_cls[dcls]
            (freq_words,) = freq_cls[fcls]
            pools_st.append((doc_words, freq_words, base, norms))
            gbits.append((BITS[dcls], BITS[fcls]))
            R = _pow2(rmax[(fname, dcls, fcls)])
            rows_d = np.zeros((self.S, R), np.int32)
            rows_f = np.zeros((self.S, R), np.int32)
            w = np.zeros((self.S, R), np.float32)
            leaf = np.zeros((self.S, R), np.int32)
            for i, p in enumerate(plans):
                for gi2, g in enumerate(p.groups):
                    if (g.field_name, g.dcls, g.fcls) == (fname, dcls, fcls):
                        rows_d[i, : len(g.rows_d)] = g.rows_d
                        rows_f[i, : len(g.rows_f)] = g.rows_f
                        w[i, : len(g.weight)] = g.weight
                        leaf[i, : len(g.leaf)] = g.leaf
                        avgdl[gi] = p.group_avgdl[gi2]
            rowsets_st.append(
                (
                    self._put(rows_d, 2),
                    self._put(rows_f, 2),
                    self._put(w, 2),
                    self._put(leaf, 2),
                )
            )

        # aux arrays are always materialized (A >= 1) so the shard_map
        # argument structure is static; unused aux inputs are DCE'd by XLA.
        A = max(
            [1]
            + [(0 if p.aux_match is None else p.aux_match.shape[0]) for p in plans]
        )
        am = np.zeros((self.S, A, self.nd_pad), np.bool_)
        asc = np.zeros((self.S, A, self.nd_pad), np.float32)
        for i, p in enumerate(plans):
            if p.aux_match is not None:
                am[i, : p.aux_match.shape[0], : p.aux_match.shape[1]] = p.aux_match
                asc[i, : p.aux_score.shape[0], : p.aux_score.shape[1]] = p.aux_score
        am = self._put(am, 3)
        asc = self._put(asc, 3)

        return PreparedShardedQuery(
            self,
            args=(
                tuple(pools_st),
                tuple(rowsets_st),
                jnp.asarray(avgdl),
                jnp.asarray(leaf_min),
                am,
                asc,
                self._alive,
                self._put(self._doc_base, 1),
            ),
            statics=dict(
                mesh=self.mesh,
                tree=tree,
                gbits=tuple(gbits),
                scorer=scorer,
                num_leaves=num_leaves,
                nd=self.nd_pad,
                per_shard=self.per_shard,
            ),
        )


class PreparedShardedQuery:
    """Device-resident sharded query: run(k) is dispatch-only."""

    def __init__(self, searcher: "ShardedSearcher", args, statics) -> None:
        self.searcher = searcher
        self._args = args
        self._statics = statics

    def run(self, k: int):
        """(scores f32[k], global docs i32[k]) jax arrays, replicated."""
        return _sharded_topk(
            *self._args, k=min(k, self.searcher.nd_pad), **self._statics
        )

    def top_k(self, k: int) -> List[Tuple[int, float]]:
        vals, docs = self.run(k)
        out = []
        for v, d in zip(np.asarray(vals), np.asarray(docs)):
            if math.isinf(v) and v < 0:
                continue
            out.append((int(d), float(v)))
        return out
