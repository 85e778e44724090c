"""Device phrase execution: positional intersection as sorted-key set ops.

Reference: by_phrase executes as a conjunction wrapped in a position
checker that leapfrogs per-part position iterators doc by doc
(core/search/phrase_iterator.hpp:75-160). The TPU formulation processes
ALL docs at once: each part's (doc, position - offset) pairs become sorted
int32 keys ``doc * pos_cap + shifted_pos``; the phrase hits are the keys of
part 0 that appear in every other part (vectorized ``searchsorted``
membership); per-doc tf = number of surviving keys, scored like a term
with the summed-idf weight (phrase stats, bm25.cpp:366-384).

Constraints for the device path (else host fallback): single-term parts,
positions present, and doc*pos_cap fitting int31 (nd_pad * pos_cap < 2^31).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import numpy as np

from iresearch_tpu.formats.bitpack import BITS
from iresearch_tpu.formats.spec import TermCols
from iresearch_tpu.search.scorers import Scorer, score_block

_I32_MAX = np.int32(2**31 - 1)


@dataclass
class PhrasePartSpec:
    """Device inputs for one single-term phrase part."""

    dcls: int
    fcls: int
    pcls: int
    rows_d: np.ndarray  # i32 [NB_pad]
    rows_f: np.ndarray  # i32 [NB_pad]
    rows_p: np.ndarray  # i32 [NPB_pad] rows into the class-pcls pos pool
    ttf: int
    offset: int


@dataclass
class DevicePhraseSpec:
    field_name: str
    parts: List[PhrasePartSpec]
    weight: float  # term_weight(boost, summed idf)
    avgdl: float


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def compile_phrase(
    flt, sr, seg_idx: int, boost: float, prepared, scorer: Scorer
) -> Optional[DevicePhraseSpec]:
    """Build a device spec for a ByPhrase of plain terms, or None."""
    from iresearch_tpu.search import filters as F

    if not isinstance(flt, F.ByPhrase) or not flt.parts:
        return None
    fp = sr.field(flt.field)
    if fp is None or not fp.has_positions:
        return None
    nd_pad = _pow2(max(1, sr.num_docs))
    pos_cap = _pow2(int(fp.norms.max(initial=1)) + 1)
    if nd_pad * pos_cap >= 2**31:
        return None
    dwf, ttf_field = prepared._field(flt.field)
    avgdl = (ttf_field / dwf) if dwf else 1.0
    parts: List[PhrasePartSpec] = []
    idf_sum = 0.0
    for off, p in flt.parts:
        if not isinstance(p, F.PhraseTerm):
            return None
        tid = sr.lookup_term(flt.field, p.term)
        if tid is None:
            return None  # a missing part -> empty result; host handles it
        e = fp.entries[tid]
        nb = int(e[TermCols.NBLOCKS])
        nbp = _pow2(max(8, nb))
        rows_d = np.zeros(nbp, np.int32)
        rows_d[:nb] = np.arange(
            int(e[TermCols.DSTART]), int(e[TermCols.DSTART]) + nb, dtype=np.int32
        )
        rows_f = np.zeros(nbp, np.int32)
        rows_f[:nb] = np.arange(
            int(e[TermCols.FSTART]), int(e[TermCols.FSTART]) + nb, dtype=np.int32
        )
        ttf = int(e[TermCols.TTF])
        npb = (ttf + 127) >> 7
        npbp = _pow2(max(1, npb))
        rows_p = np.zeros(npbp, np.int32)  # pad -> sentinel row 0
        rows_p[:npb] = np.arange(
            int(e[TermCols.PSTART]), int(e[TermCols.PSTART]) + npb, dtype=np.int32
        )
        parts.append(
            PhrasePartSpec(
                dcls=int(e[TermCols.DCLS]),
                fcls=int(e[TermCols.FCLS]),
                pcls=int(e[TermCols.PCLS]),
                rows_d=rows_d,
                rows_f=rows_f,
                rows_p=rows_p,
                ttf=ttf,
                offset=int(off),
            )
        )
        # index-wide df of the part's term (host prepare semantics)
        df = 0
        for sr2 in prepared.segments:
            fp2 = sr2.field(flt.field)
            tid2 = sr2.lookup_term(flt.field, p.term)
            if fp2 is not None and tid2 is not None:
                df += int(fp2.entries[tid2, TermCols.DF])
        idf_sum += scorer.idf(max(df, 1), max(dwf, 1))
    w = float(scorer.term_weight(boost * flt.boost, idf_sum))
    return DevicePhraseSpec(flt.field, parts, w, avgdl)


def _part_keys(pool, spec_arrays, bd, bf, bp, ttf, off, pos_cap_log2):
    """Sorted int32 keys doc*pos_cap + (pos - off) of one part; invalid
    slots get I32_MAX (sorts last, never matches). Positions decode from
    the term's packed block rows (format v4) — pure unpack, no gather
    into a flat pool."""
    import jax.numpy as jnp

    doc_words, freq_words, base, pos_words = pool
    rows_d, rows_f, rows_p = spec_arrays
    from iresearch_tpu.formats.bitpack import unpack_jnp

    d = unpack_jnp(doc_words[rows_d], bd).astype(jnp.int32)
    docs = (base[rows_d][:, None] + jnp.cumsum(d, axis=1)).reshape(-1)
    f = unpack_jnp(freq_words[rows_f], bf).astype(jnp.int32).reshape(-1)
    cumf = jnp.cumsum(f)
    pos = unpack_jnp(pos_words[rows_p], bp).astype(jnp.int32).reshape(-1)
    n = pos.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    entry = jnp.searchsorted(cumf, i, side="right")
    doc_of_pos = docs[jnp.minimum(entry, docs.shape[0] - 1)]
    shifted = pos - off
    valid = (i < ttf) & (shifted >= 0)
    key = (doc_of_pos << pos_cap_log2) + shifted
    key = jnp.where(valid & (shifted < (1 << pos_cap_log2)), key, _I32_MAX)
    return jnp.sort(key)


@partial(
    jax.jit,
    static_argnames=("gbits", "scorer", "pos_cap_log2", "nd"),
)
def _run_phrase(
    pools,  # tuple per part: (doc_words, freq_words, base, pos_words)
    specs,  # tuple per part: (rows_d, rows_f, rows_p)
    ttfs,  # i32 [m]
    offs,  # i32 [m]
    weight,  # f32 scalar
    avgdl,  # f32 scalar
    norms,  # f32 [nd]
    *,
    gbits,  # tuple per part: (doc_bits, freq_bits, pos_bits)
    scorer: Scorer,
    pos_cap_log2: int,
    nd: int,
):
    import jax.numpy as jnp

    keys0 = _part_keys(
        pools[0], specs[0], gbits[0][0], gbits[0][1], gbits[0][2],
        ttfs[0], offs[0], pos_cap_log2,
    )
    alive_keys = keys0 != _I32_MAX
    for j in range(1, len(pools)):
        kj = _part_keys(
            pools[j], specs[j], gbits[j][0], gbits[j][1], gbits[j][2],
            ttfs[j], offs[j], pos_cap_log2,
        )
        idx = jnp.searchsorted(kj, keys0)
        found = kj[jnp.minimum(idx, kj.shape[0] - 1)] == keys0
        alive_keys = alive_keys & found
    doc_of_key = keys0 >> pos_cap_log2
    tf = (
        jnp.zeros(nd, jnp.float32)
        .at[jnp.where(alive_keys, doc_of_key, nd - 1)]
        .add(jnp.where(alive_keys, 1.0, 0.0), mode="drop")
    )
    match = tf > 0
    dl = norms
    sc = score_block(
        scorer,
        jnp.float32(weight),
        tf.reshape(1, -1),
        dl.reshape(1, -1),
        avgdl,
        xp=jnp,
    ).reshape(-1)
    return match, jnp.where(match, sc, 0.0)


def run_phrase_dense(
    spec: DevicePhraseSpec, sr, scorer: Scorer, nd_pad: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Execute on device -> (match bool [nd_pad], score f32 [nd_pad])."""
    import jax.numpy as jnp

    dfield = sr.device_field(spec.field_name)
    fp = sr.field(spec.field_name)
    pos_cap_log2 = int(np.log2(_pow2(int(fp.norms.max(initial=1)) + 1)))
    pools = []
    specs = []
    gbits = []
    for p in spec.parts:
        pools.append(
            (
                dfield.doc_words[p.dcls],
                dfield.freq_words[p.fcls],
                dfield.base[p.dcls],
                dfield.pos_words(p.pcls),
            )
        )
        specs.append(
            (jnp.asarray(p.rows_d), jnp.asarray(p.rows_f), jnp.asarray(p.rows_p))
        )
        gbits.append((BITS[p.dcls], BITS[p.fcls], BITS[p.pcls]))
    match, score = _run_phrase(
        tuple(pools),
        tuple(specs),
        jnp.asarray([p.ttf for p in spec.parts], jnp.int32),
        jnp.asarray([p.offset for p in spec.parts], jnp.int32),
        jnp.float32(spec.weight),
        jnp.float32(spec.avgdl),
        dfield.norms,
        gbits=tuple(gbits),
        scorer=scorer,
        pos_cap_log2=pos_cap_log2,
        nd=nd_pad,
    )
    return match, score
