"""Skyline execution: survivor-row gather for dense-grid sum trees.

The fused row-max scan (ops/dense_scan.py) reads every grid row of every
span — ~16 MB of HBM per term query at 5M docs. But the top-k threshold
θ prunes almost all of that: the reference's wanderator skips sub-θ
blocks via skip-list bounds (formats_10.cpp:2426-2825). The TPU-native
analog precomputes, per (field, scorer), a PERMUTATION of each dense
span's rows sorted by a per-row score UPPER bound; at query time the
host derives

  * θ_s — a provable lower bound of the true k-th score, from per-row
    ACHIEVABLE score pairs (real lanes recorded at cache build), and
  * per-span survivor counts — how many rows can possibly beat θ_s,
    one `searchsorted` over the span's descending ub array,

so the device only gathers the first `count` rows of each span's
permutation and rescores them EXACTLY. Typical counts are O(k·slack):
a HighTerm query at 5M docs touches a few dozen rows instead of 40960.

Exactness proof (disjunctive sum tree, no deletes):
  θ: the k rows with the largest achievable row scores contribute k
  DISTINCT docs whose total score ≥ their own span contribution ≥ θ_s
  (other contributions are ≥ 0), so the true k-th score θ ≥ θ_s.
  Coverage: a winner doc d has Σ_s w_s·ub_s[row(d)] ≥ score(d) ≥ θ ≥
  θ_s, hence max_s w_s·ub_s[row(d)] ≥ θ_s/S — row(d) is inside span
  s's cut at θ_s/(S·w_s), which the survivor count includes (ties
  inclusive). A relative epsilon absorbs float-order drift between the
  host-computed θ_s and device-computed scores (the same guard as WAND,
  reference formats_10.cpp:2434-2441).

Ineligible shapes (conjunctions, deletes, k > 128, zero θ, oversized
survivor sets) fall back to the fused scan — exact either way.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from iresearch_tpu.formats.bitpack import BITS
from iresearch_tpu.formats.spec import NUM_CLASSES
from iresearch_tpu.search.scorers import BM25, TFIDF, Scorer, score_block

_IMAX32 = 2**31 - 1
_NEG_INF = float("-inf")

# survivor-row budget per query; beyond this the full fused scan is
# cheaper anyway (it streams all rows with no gather)
SKYLINE_MAX_ROWS = int(os.environ.get("IRS_SKYLINE_MAX_ROWS", "8192"))
# relative cost gate: the fused scan streams S*ndrows packed rows at
# ~0.7 ns/lane while skyline row-gathers cost several ns/lane — gathering
# more than S*ndrows/RATIO rows loses to just scanning (measured on v5e:
# scan 1.3 ms/q vs gather ~0.1 ms/1024 rows at 5M docs => crossover ~3,
# kept at 6 for margin). Tests on tiny grids set this to 0 to force the
# skyline path regardless.
SKYLINE_SCAN_RATIO = float(os.environ.get("IRS_SKYLINE_SCAN_RATIO", "6"))
# θ needs the k-th best achievable row score per span; keep the top
# K_MAX per term (k beyond that falls back to the scan)
K_MAX = 128


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class SkylineIndex:
    """Per-(field, scorer, avgdl) ub permutation over a DenseCache.

    Host side: per class, `perm[rows_c]` (row offsets 0..ndrows-1 within
    each span, ub-descending) and the parallel descending `s_ub` array
    for survivor counts; per term, the top-K_MAX achievable row scores.
    Device side: the perm arrays upload lazily per class.
    """

    def __init__(self, cache, scorer: Scorer, avgdl: float) -> None:
        self.cache = cache
        self.scorer = scorer
        self.avgdl = float(avgdl)
        ndrows = cache.ndrows
        self.perm: List[np.ndarray] = []
        self.s_ub: List[np.ndarray] = []
        self.lb_top: Dict[int, np.ndarray] = {}
        self.host_bytes = 0
        # exact row-max bound: the champion pair (f_c, dl_c) was selected
        # under DEFAULT BM25 constants at the cache's build avgdl — when
        # the query scores with exactly that formula, score(f_c, dl_c) IS
        # the row's true max (measured: survivor counts drop from ~60% of
        # the grid to ~k rows for the hottest 5M-doc terms)
        exact = (
            isinstance(scorer, BM25)
            and scorer.k == 1.2
            and scorer.b == 0.75
            and abs(self.avgdl - cache.avgdl)
            <= 1e-6 * max(1.0, cache.avgdl)
        )
        for c in range(NUM_CLASSES):
            n = len(cache.bmaxf[c])
            perm_c = np.zeros(n, np.int32)
            ub_c = np.zeros(n, np.float32)
            if n > 1:
                f_ub = cache.bmaxf[c].astype(np.float32)
                dl_min = np.maximum(
                    cache.dl_min[c].astype(np.float32), 1.0
                )
                # unit-weight bounds through the SAME formula the device
                # uses (score_block), so host/device drift is ≤ ulp and
                # covered by the θ epsilon
                ub_c = score_block(
                    scorer, np.float32(1.0), f_ub, dl_min, self.avgdl,
                    xp=np,
                ).astype(np.float32)
                f_c = cache.f_c[c].astype(np.float32)
                dl_c = np.maximum(cache.dl_c[c].astype(np.float32), 1.0)
                f_m = cache.f_mdl[c].astype(np.float32)
                s_champ = score_block(
                    scorer, np.float32(1.0), f_c, dl_c, self.avgdl,
                    xp=np,
                ).astype(np.float32)
                s_lb = np.maximum(
                    s_champ,
                    score_block(
                        scorer, np.float32(1.0), f_m, dl_min, self.avgdl,
                        xp=np,
                    ),
                )
                if exact:
                    # zeroed (u16-overflow) or clipped champion pairs
                    # fall back to the loose bound — still sound
                    valid = (f_c > 0.0) & (f_c < 65535.0)
                    ub_c = np.where(valid, s_champ, ub_c)
                kk = min(K_MAX, ndrows)
                for tid, (cc, start) in cache.spans.items():
                    if cc != c:
                        continue
                    seg = slice(start, start + ndrows)
                    order = np.argsort(
                        -ub_c[seg], kind="stable"
                    ).astype(np.int32)
                    perm_c[seg] = order
                    ub_c[seg] = ub_c[seg][order]
                    top = -np.partition(-s_lb[seg], kk - 1)[:kk]
                    top[::-1].sort()
                    self.lb_top[tid] = top
            self.perm.append(perm_c)
            self.s_ub.append(ub_c)
            self.host_bytes += perm_c.nbytes + ub_c.nbytes
        self._dev_perm: Dict[int, object] = {}

    def device_perm(self, c: int):
        """Device-resident perm array of class ``c`` (lazy, cached)."""
        cached = self._dev_perm.get(c)
        if cached is None:
            import jax.numpy as jnp

            from iresearch_tpu.utils import resource

            cached = jnp.asarray(self.perm[c])
            self._dev_perm[c] = cached
            resource.manager().increase(
                resource.CATEGORY_DEVICE, cached.nbytes
            )
        return cached

    def theta(self, spans, k: int) -> float:
        """Lower bound of the k-th best score for these scored spans
        (w-weighted), 0.0 when unavailable."""
        th = 0.0
        for ds in spans:
            top = self.lb_top.get(ds.tid)
            if top is None or k > len(top):
                continue
            th = max(th, float(ds.w) * float(top[k - 1]))
        return th

    def count(self, cls: int, start: int, ndrows: int, cut: float) -> int:
        """#rows of the span whose ub ≥ cut (ties inclusive)."""
        sub = self.s_ub[cls][start : start + ndrows]  # descending
        return int(np.searchsorted(-sub, -np.float32(cut), side="right"))


@dataclass(frozen=True)
class SkylineSpec:
    """Plan-time survivor-row schedule for one segment's dense spans."""

    field_name: str
    ndrows: int
    # per scored span: static (cls, bits, M) and dynamic (start, count, w)
    classes: Tuple[int, ...]
    Ms: Tuple[int, ...]
    starts: Tuple[int, ...]
    counts: Tuple[int, ...]
    ws: Tuple[float, ...]
    avgdl: float
    k: int

    def signature(self) -> tuple:
        return (
            self.field_name,
            self.classes,
            self.Ms,
            self.ndrows,
            self.k,
        )


def _scorer_supported(scorer: Scorer) -> bool:
    # BoostScore's ub is flat (every hit row ties) — no pruning power
    return isinstance(scorer, (BM25, TFIDF))


def skyline_spec(plan, sr, scorer: Scorer, k: int) -> Optional[SkylineSpec]:
    """Compute the survivor schedule for an eligible plan, else None.

    Eligibility: single-leaf disjunctive sum tree whose spans are all
    dense-grid resident in ONE field (scan_shape == "or"), no deletes,
    1 ≤ k ≤ K_MAX, supported scorer, positive θ, bounded survivors.
    """
    from iresearch_tpu.exec.executor import scan_shape

    if not (1 <= k <= K_MAX) or not _scorer_supported(scorer):
        return None
    if scan_shape(plan) != "or" or sr.has_deletes:
        return None
    spans = plan.dense_spans
    fields = {ds.field_name for ds in spans}
    if len(fields) != 1:
        return None
    fname = next(iter(fields))
    scored = [ds for ds in spans if ds.w > 0.0]
    if not scored or any(ds.w < 0.0 for ds in spans):
        return None
    ski = sr.skyline_index(fname, scorer, scored[0].avgdl)
    if ski is None:
        return None
    theta = ski.theta(scored, k)
    if not (theta > 0.0):
        return None
    # float-order guard: host θ vs device-exact scores can differ by ulp
    theta_eps = theta * (1.0 - 1e-5) - 1e-30
    S = len(scored)
    ndrows = scored[0].ndrows
    classes, Ms, starts, counts, ws = [], [], [], [], []
    total = 0
    for ds in scored:
        cut = theta_eps / (S * ds.w)
        cnt = ski.count(ds.cls, ds.start, ndrows, cut)
        cnt = min(cnt, ndrows)
        M = min(_pow2(max(8, cnt)), ndrows)
        total += M
        classes.append(ds.cls)
        Ms.append(M)
        starts.append(ds.start)
        counts.append(cnt)
        ws.append(float(ds.w))
    if total > SKYLINE_MAX_ROWS or total * SKYLINE_SCAN_RATIO > S * ndrows:
        return None
    return SkylineSpec(
        field_name=fname,
        ndrows=ndrows,
        classes=tuple(classes),
        Ms=tuple(Ms),
        starts=tuple(starts),
        counts=tuple(counts),
        ws=tuple(ws),
        avgdl=float(scored[0].avgdl),
        k=k,
    )


def skyline_topk(
    span_pools,  # per span: u32 [rows_c, wpb] dense grid pool (shared ok)
    perm_pools,  # per span: i32 [rows_c] ub-descending row offsets
    norms_grid,  # [ndrows, 128] u16/f32 doc lengths
    starts,  # i32 per span (traced)
    counts,  # i32 per span (traced)
    ws,  # f32 per span (traced)
    avgdl,  # f32 (traced)
    *,
    scorer: Scorer,
    span_bits: Tuple[int, ...],
    Ms: Tuple[int, ...],
    k: int,
    ndrows: int,
):
    """Exact (vals f32 [k], docs i32 [k]) over the survivor rows only."""
    import jax.numpy as jnp
    from jax import lax

    from iresearch_tpu.formats.bitpack import unpack_jnp
    from iresearch_tpu.formats.spec import BLOCK

    S = len(span_pools)
    IMAX = jnp.int32(_IMAX32)
    rel_l = []
    for s in range(S):
        pr = lax.dynamic_slice(perm_pools[s], (starts[s],), (Ms[s],))
        mask = jnp.arange(Ms[s], dtype=jnp.int32) < counts[s]
        rel_l.append(jnp.where(mask, pr, IMAX))
    rel = rel_l[0] if S == 1 else jnp.concatenate(rel_l)
    if S > 1:
        # dedup rows contributed by several spans (each survivor row is
        # rescored across ALL spans, so one copy suffices)
        rel = lax.sort(rel)
        dup = jnp.concatenate(
            [jnp.zeros(1, bool), rel[1:] == rel[:-1]]
        )
        rel = jnp.where(dup, IMAX, rel)
    parked = rel >= ndrows
    safe = jnp.where(parked, 0, rel)
    dl = norms_grid[safe]
    if not jnp.issubdtype(dl.dtype, jnp.floating):
        dl = dl.astype(jnp.int32).astype(jnp.float32)
    dl = jnp.maximum(dl, 1.0)
    M = rel.shape[0]
    score = jnp.zeros((M, BLOCK), jnp.float32)
    fagg = None
    for s in range(S):
        # parked rows read the class pool's global zero sentinel (row 0)
        rows_abs = jnp.where(parked, 0, starts[s] + safe)
        f = unpack_jnp(span_pools[s][rows_abs], span_bits[s]).astype(
            jnp.int32
        ).astype(jnp.float32)
        score = score + score_block(scorer, ws[s], f, dl, avgdl, xp=jnp)
        fagg = f if fagg is None else fagg + f
    lane = jnp.arange(BLOCK, dtype=jnp.int32)
    match = (fagg > 0.0) & (~parked)[:, None]
    docs = jnp.where(
        match, safe[:, None] * BLOCK + lane[None, :], IMAX
    )
    masked = jnp.where(match, score, _NEG_INF)
    from iresearch_tpu.exec.candidates import topk_docs

    return topk_docs(masked.reshape(-1), docs.reshape(-1), k)
