"""Scale-proportional executors: query cost O(postings), not O(corpus).

The reference's hot path touches only postings — leapfrog conjunction
(core/search/conjunction.hpp:155-230), heap/block disjunction
(core/search/disjunction.hpp:860-1100), skip lists
(core/formats/formats_10.cpp:320-323). The round-1 dense executor folded
per-leaf [L, nd_pad] arrays instead: exact, but O(corpus) per query — a
LowTerm query over 5M docs did ~1000x the reference's work.

This module is the TPU-native answer, three tiers picked at plan time
(exec/plan.py chooses per query; exactness is identical by construction):

* ``direct`` — single-span leaf (one term): decoded docs are unique, so
  contributions ARE final scores; top-k straight over the [P] decoded
  lanes. No doc-space array is ever built.
* ``join`` — conjunction with a single-span driver leaf: candidates are
  the driver's decoded docs (sorted, ∝ its df); every other span joins by
  ``searchsorted`` into the candidate array and scatter-adds its
  contribution (the dense-dataflow analog of the leapfrog AND).
* ``sort`` — general positive trees: all decoded (doc, score, leaf|match)
  lanes are sorted by doc, runs are compacted to candidate slots
  (cumsum over run starts), and per-leaf score/count land in a compact
  [L, P] grid; the boolean tree folds over candidates only.

All tiers compose with block-max WAND: rows pruned by θ redirect to the
sentinel row 0 and decode to zero contributions, exactly as in the dense
path. Safety: a tier other than dense is only used for *covering* trees —
every match is guaranteed to carry at least one postings entry
(plan.candidate_tree_ok) — so docs absent from the candidate set cannot
match.
"""

from __future__ import annotations

from typing import Sequence

from iresearch_tpu.search.scorers import Scorer

_NEG_INF = float("-inf")


def topk_docs(masked, doc_arr, k: int):
    """top_k by (-score, doc): deterministic doc-id tie-break.

    ``lax.top_k`` breaks ties by lane position; in the dense executor lane
    == doc so ties resolve by doc id (matching the host oracle's
    (-score, doc) order), but candidate-space lanes are arbitrary. Fix up
    the boundary tie group: its members are the smallest-doc ties, found
    with one extra top_k over negated doc ids — no full sort.
    """
    import jax.numpy as jnp
    from jax import lax

    vals, idx = lax.top_k(masked, k)
    docs0 = doc_arr[idx]
    if k == 1:
        # single winner: smallest doc among max-score ties
        tie_key = jnp.where(masked == vals[0], doc_arr, jnp.int32(2**31 - 1))
        return vals, jnp.min(tie_key)[None]
    thetak = vals[k - 1]
    tie_out = vals == thetak  # trailing run of the sorted top-k values
    tie_key = jnp.where(masked == thetak, doc_arr, jnp.int32(2**31 - 1))
    # k smallest tie docs, ascending
    small_ties = -lax.top_k(-tie_key, k)[0]
    tie_rank = jnp.cumsum(tie_out.astype(jnp.int32)) - 1
    out_docs = jnp.where(
        tie_out, small_ties[jnp.maximum(tie_rank, 0)], docs0
    )
    return vals, out_docs


def decode_flat(pools, rowsets, avgdl, gbits, scorer: Scorer, slicer=None):
    """Decode every row group into flat per-lane arrays.

    Returns (docs i32 [P], score f32 [P], matched bool [P], leaf i32 [P])
    with P = sum over groups of rows*128. ``slicer`` optionally narrows
    each rowset (WAND sampled phase).
    """
    import jax.numpy as jnp

    from iresearch_tpu.exec.executor import _group_contrib

    docs_l, sc_l, m_l, leaf_l = [], [], [], []
    for gi, (pool, rs) in enumerate(zip(pools, rowsets)):
        bd, bf = gbits[gi]
        rows_d, rows_f, w, leaf = (rs[:4] if slicer is None else slicer(rs))
        docs, sc, m = _group_contrib(pool, rows_d, rows_f, w, bd, bf, avgdl[gi], scorer)
        R = docs.shape[0]
        docs_l.append(docs.reshape(-1))
        sc_l.append(sc.reshape(-1))
        m_l.append(m.reshape(-1))
        leaf_l.append(jnp.broadcast_to(leaf[:, None], (R, docs.shape[1])).reshape(-1))
    if len(docs_l) == 1:
        return docs_l[0], sc_l[0], m_l[0], leaf_l[0]
    return (
        jnp.concatenate(docs_l),
        jnp.concatenate(sc_l),
        jnp.concatenate(m_l),
        jnp.concatenate(leaf_l),
    )


def direct_topk(pools, rowsets, avgdl, alive, *, gbits, scorer, k):
    """Single-span top-k: decoded docs are unique, so no combine is needed.

    The TermQuery hot path (reference: term_query.cpp:35-75 +
    postings_reader refill) as decode → score → top_k over [P] lanes.
    Trailing padding lanes repeat the last real doc with freq 0 and the
    sentinel decodes to doc 0 with freq 0 — both carry matched=False.
    """
    import jax.numpy as jnp
    from jax import lax

    docs, sc, m, _ = decode_flat(pools, rowsets, avgdl, gbits, scorer)
    match = m & alive[docs]
    return topk_docs(jnp.where(match, sc, _NEG_INF), docs, k)


def sorted_topk(
    pools, rowsets, avgdl, leaf_min, alive,
    *, tree, gbits, scorer, num_leaves, k, slicer=None,
):
    """Sort-compact candidate top-k for covering trees.

    Sorting by doc makes duplicate docs (same doc hit by several terms)
    contiguous; run starts become compact candidate slots; per-leaf
    score/count scatter-add into [L, P] — P lanes, not nd docs. The tree
    then folds elementwise over candidates exactly as the dense executor
    folds over docs.
    """
    import jax.numpy as jnp
    from jax import lax

    from iresearch_tpu.exec.executor import _fold_tree

    docs, sc, m, leaf = decode_flat(pools, rowsets, avgdl, gbits, scorer, slicer)
    P = docs.shape[0]
    # pack (leaf, matched) into one payload so the sort carries 3 operands
    pay = leaf * 2 + m.astype(jnp.int32)
    sdocs, ssc, spay = lax.sort((docs, sc, pay), num_keys=1)
    start = jnp.concatenate(
        [jnp.ones(1, bool), sdocs[1:] != sdocs[:-1]]
    )
    slot = jnp.cumsum(start.astype(jnp.int32)) - 1  # [P], values < P
    sleaf = spay >> 1
    scnt = spay & 1
    leaf_score = jnp.zeros((num_leaves, P), jnp.float32)
    leaf_score = leaf_score.at[sleaf, slot].add(ssc, mode="drop")
    leaf_count = jnp.zeros((num_leaves, P), jnp.int32)
    leaf_count = leaf_count.at[sleaf, slot].add(scnt, mode="drop")
    cand_doc = jnp.zeros(P, jnp.int32)
    cand_doc = cand_doc.at[jnp.where(start, slot, P)].set(sdocs, mode="drop")
    leaf_match = leaf_count >= leaf_min[:, None]
    leaf_score = jnp.where(leaf_match, leaf_score, 0.0)
    match, score = _fold_tree(tree, leaf_match, leaf_score, None, None, P, jnp)
    # untouched slots have zero counts -> covering trees cannot match them
    match = match & alive[cand_doc]
    return topk_docs(jnp.where(match, score, _NEG_INF), cand_doc, k)


def join_topk(
    pools, rowsets, avgdl, leaf_min, alive,
    *, tree, gbits, scorer, num_leaves, k, driver_gi, driver_leaf,
):
    """Conjunction top-k with a single-span driver (leapfrog AND analog).

    Candidates are the driver leaf's decoded docs. Pad rows and partial
    block lanes carry freq 0, so mapping non-matching lanes to INT32_MAX
    and sorting yields a strictly ascending unique candidate array (its
    sort is cheap: the driver is the *smallest* leaf by construction).
    Every other group's lanes binary-search into the candidate array and
    scatter-add where the doc actually matches; entries outside the
    candidate set are dropped, which is exact because the root conjunction
    requires the driver leaf. Work ∝ total postings of the query,
    independent of corpus size (reference: conjunction.hpp:155-230
    leapfrog).
    """
    import jax.numpy as jnp
    from jax import lax

    from iresearch_tpu.exec.executor import _fold_tree, _group_contrib

    _IMAX = jnp.int32(2**31 - 1)
    bd, bf = gbits[driver_gi]
    rows_d, rows_f, w, leaf = rowsets[driver_gi][:4]
    ddocs, dsc, dm = _group_contrib(
        pools[driver_gi], rows_d, rows_f, w, bd, bf, avgdl[driver_gi], scorer
    )
    P = ddocs.shape[0] * ddocs.shape[1]
    key = jnp.where(dm, ddocs, _IMAX).reshape(-1)
    cdocs, csc = lax.sort((key, dsc.reshape(-1)), num_keys=1)
    cvalid = cdocs != _IMAX
    leaf_score = jnp.zeros((num_leaves, P), jnp.float32)
    leaf_score = leaf_score.at[driver_leaf].set(jnp.where(cvalid, csc, 0.0))
    leaf_count = jnp.zeros((num_leaves, P), jnp.int32)
    leaf_count = leaf_count.at[driver_leaf].set(cvalid.astype(jnp.int32))

    for gi, (pool, rs) in enumerate(zip(pools, rowsets)):
        if gi == driver_gi:
            continue
        bdg, bfg = gbits[gi]
        rows_d, rows_f, w, lf = rs[:4]
        docs, sc, m = _group_contrib(pool, rows_d, rows_f, w, bdg, bfg, avgdl[gi], scorer)
        R, B = docs.shape
        docs_f = docs.reshape(-1)
        # first occurrence of each doc in cdocs is the real driver entry
        # (trailing repeats come after it); misses scatter to index P=drop
        pos = jnp.searchsorted(cdocs, docs_f).astype(jnp.int32)
        pos_c = jnp.minimum(pos, P - 1)
        hit = cdocs[pos_c] == docs_f
        tgt = jnp.where(hit, pos_c, P)
        lf_f = jnp.broadcast_to(lf[:, None], (R, B)).reshape(-1)
        leaf_score = leaf_score.at[lf_f, tgt].add(sc.reshape(-1), mode="drop")
        leaf_count = leaf_count.at[lf_f, tgt].add(
            m.reshape(-1).astype(jnp.int32), mode="drop"
        )

    leaf_match = leaf_count >= leaf_min[:, None]
    leaf_score = jnp.where(leaf_match, leaf_score, 0.0)
    match, score = _fold_tree(tree, leaf_match, leaf_score, None, None, P, jnp)
    match = match & cvalid & alive[jnp.minimum(cdocs, alive.shape[0] - 1)]
    return topk_docs(jnp.where(match, score, _NEG_INF), cdocs, k)


def wand_theta(
    pools, sorted_sets, avgdl, leaf_min, alive,
    *, tree, gbits, scorer, num_leaves, k, sample, mode,
):
    """Lower-bound θ from the highest-upper-bound `sample` blocks per group.

    Partial decode can only shrink matches and scores, so the k-th partial
    score is a lower bound of the true k-th — the same argument as the
    dense wand_body phase 1, evaluated in candidate space.
    """
    import jax.numpy as jnp
    from jax import lax

    def slicer(rs):
        return (
            rs[0][: min(sample, rs[0].shape[0])],
            rs[1][: min(sample, rs[1].shape[0])],
            rs[2][: min(sample, rs[2].shape[0])],
            rs[3][: min(sample, rs[3].shape[0])],
        )

    if mode == "direct":
        docs, sc, m, _ = decode_flat(
            pools, sorted_sets, avgdl, gbits, scorer, slicer
        )
        pm = m & alive[docs]
        ps = sc
    else:  # sort-compact partial fold
        pools_s = pools
        vals, docs = sorted_topk(
            pools_s, sorted_sets, avgdl, leaf_min, alive,
            tree=tree, gbits=gbits, scorer=scorer,
            num_leaves=num_leaves, k=k, slicer=slicer,
        )
        theta = vals[k - 1]
        return jnp.where(
            jnp.isfinite(theta), theta - jnp.abs(theta) * 1e-5 - 1e-30, theta
        )
    theta = lax.top_k(jnp.where(pm, ps, _NEG_INF), k)[0][k - 1]
    # float-order guard (same epsilon dance as wand_body / the reference's
    # nextafter, formats_10.cpp:2434-2441)
    return jnp.where(
        jnp.isfinite(theta), theta - jnp.abs(theta) * 1e-5 - 1e-30, theta
    )


def candidate_body(
    pools,
    rowsets,
    avgdl,
    leaf_min,
    alive,
    *,
    tree,
    gbits,
    scorer: Scorer,
    num_leaves: int,
    k: int,
    mode: str,  # "direct" | "sort" | "join"
    driver_gi: int = 0,
    driver_leaf: int = 0,
    wand: bool = False,
    sample: int = 16,
):
    """Unified scale-proportional executor body (shared single/batch/shard)."""
    import jax.numpy as jnp

    sets = rowsets
    if wand:
        sorted_sets = []
        for rs in rowsets:
            rows_d, rows_f, w, leaf, ub, other = rs
            order = jnp.argsort(-ub)
            sorted_sets.append(
                (rows_d[order], rows_f[order], w[order], leaf[order],
                 ub[order], other[order])
            )
        theta = wand_theta(
            pools, sorted_sets, avgdl, leaf_min, alive,
            tree=tree, gbits=gbits, scorer=scorer, num_leaves=num_leaves,
            k=k, sample=sample, mode=mode,
        )

        def prune(rs):
            rows_d, rows_f, w, leaf, ub, other = rs
            keep = (ub + other) >= theta
            return (
                jnp.where(keep, rows_d, 0),
                jnp.where(keep, rows_f, 0),
                jnp.where(keep, w, 0.0),
                leaf, ub, other,
            )

        sets = [prune(rs) for rs in sorted_sets]

    if mode == "direct":
        return direct_topk(
            pools, sets, avgdl, alive, gbits=gbits, scorer=scorer, k=k
        )
    if mode == "join":
        return join_topk(
            pools, sets, avgdl, leaf_min, alive,
            tree=tree, gbits=gbits, scorer=scorer, num_leaves=num_leaves,
            k=k, driver_gi=driver_gi, driver_leaf=driver_leaf,
        )
    return sorted_topk(
        pools, sets, avgdl, leaf_min, alive,
        tree=tree, gbits=gbits, scorer=scorer, num_leaves=num_leaves, k=k,
    )
