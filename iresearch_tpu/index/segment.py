"""Segment model: host data, reader with term lookup, device residency.

Reference analogs: SegmentReader (core/index/segment_reader_impl.cpp:162-294)
= fields + columns + doc mask; term dictionary seeks (formats_burst_trie.cpp)
become bisect over the sorted term array; device residency replaces the
reference's mmap of index files — pools are uploaded once per segment and
cached (the `jax.device_put` analog of IOAdvice/mmap warmup).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iresearch_tpu.formats.columnstore import Column
from iresearch_tpu.formats.postings import FieldPostings
from iresearch_tpu.formats.spec import NUM_CLASSES, pad_docs


@dataclass
class SegmentData:
    """Immutable host-side segment payload."""

    num_docs: int
    fields: Dict[str, FieldPostings]
    columns: Dict[str, Column]


class TermDictView(Sequence):
    """Zero-copy sorted term dictionary over (blob, offsets).

    Replaces the round-1 ``List[bytes]`` materialization: a dictionary of
    T terms costs only the byte blob plus one u64 offset array (a Python
    list of 10M small bytes objects is GBs; this is tens of MB). The
    reference holds millions of terms in an FST index + prefix blocks
    (formats_burst_trie.cpp:951,1457); here the sorted blob IS the
    dictionary and ``bisect`` over this view is the seek.
    """

    __slots__ = ("_blob", "_off")

    def __init__(self, blob: bytes, offsets: np.ndarray) -> None:
        self._blob = blob
        self._off = offsets

    def __len__(self) -> int:
        return len(self._off) - 1

    def __getitem__(self, i):
        if isinstance(i, slice):
            lo, hi, step = i.indices(len(self))
            return [self[j] for j in range(lo, hi, step)]
        n = len(self)
        if i < 0:
            i += n
        if not 0 <= i < n:
            raise IndexError(i)
        return self._blob[int(self._off[i]) : int(self._off[i + 1])]

    def __eq__(self, other) -> bool:
        if self is other:
            return True
        try:
            if len(other) != len(self):
                return False
        except TypeError:
            return NotImplemented
        return all(a == b for a, b in zip(self, other))

    def __hash__(self):  # pragma: no cover - views are not dict keys
        return object.__hash__(self)

    @property
    def nbytes(self) -> int:
        return len(self._blob) + self._off.nbytes


def _prefix_successor(prefix: bytes) -> Optional[bytes]:
    """Smallest byte string greater than every string with this prefix
    (increment-with-carry; None when the prefix is all 0xff)."""
    p = bytearray(prefix)
    while p and p[-1] == 0xFF:
        p.pop()
    if not p:
        return None
    p[-1] += 1
    return bytes(p)


def _pow2(n: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, n)))))


# zero-row tail appended to every doc/freq/norm pool: the dslice tier
# (exec/candidates.py:dslice_topk) reads a term's contiguous rows with ONE
# dynamic_slice of up to DSLICE_PAD rows, and XLA's dynamic_slice CLAMPS
# out-of-bounds starts (silently shifting the window) — the tail guarantees
# start + R never exceeds the padded row count, so the slice never shifts.
DSLICE_PAD = 1024


class DeviceField:
    """One field's pools resident on device, shapes padded to powers of two
    plus a DSLICE_PAD zero-row tail (see above).

    Padding rows are zero blocks (same semantics as the row-0 sentinel), and
    norm padding lanes are 1 to keep tf/idf math finite; padded docs carry
    freq 0 so they never contribute score or matches.
    """

    def __init__(self, fp: FieldPostings) -> None:
        import jax.numpy as jnp

        def pad_rows(arr, rp):
            out = np.zeros((rp,) + arr.shape[1:], arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        self.doc_words = []
        self.freq_words = []
        self.base = []
        self.bmax = []
        self.bmaxf = []
        # inline norm pools (format v5): scoring's dl comes from the same
        # sequential row-gather path as freqs; None for legacy segments,
        # which fall back to the per-lane norms[docs] gather
        self.nrm_words = [] if fp.nrm_words is not None else None
        for c in range(NUM_CLASSES):
            rp = _pow2(fp.doc_words[c].shape[0]) + DSLICE_PAD
            self.doc_words.append(jnp.asarray(pad_rows(fp.doc_words[c], rp)))
            self.base.append(
                jnp.asarray(pad_rows(fp.base[c], rp).astype(np.int32))
            )
            self.bmax.append(
                jnp.asarray(pad_rows(fp.bmax[c], rp).astype(np.int32))
            )
            rpf = _pow2(fp.freq_words[c].shape[0]) + DSLICE_PAD
            self.freq_words.append(jnp.asarray(pad_rows(fp.freq_words[c], rpf)))
            self.bmaxf.append(
                jnp.asarray(pad_rows(fp.bmaxf[c], rpf).astype(np.int32))
            )
            if self.nrm_words is not None:
                rpn = _pow2(fp.nrm_words[c].shape[0]) + DSLICE_PAD
                self.nrm_words.append(jnp.asarray(pad_rows(fp.nrm_words[c], rpn)))
        nd_pad = pad_docs(len(fp.norms))
        norms = np.ones(nd_pad, np.float32)
        norms[: len(fp.norms)] = np.maximum(fp.norms, 1).astype(np.float32)
        self.norms = jnp.asarray(norms)
        # u16 twin for the fused dense scan (halves its norms traffic);
        # exact only while every doc length fits 16 bits
        self.norms_u16 = (
            jnp.asarray(norms.astype(np.uint16))
            if norms.max(initial=1.0) < 65536.0
            else None
        )
        # device-memory accounting (reference: IResourceManager categories,
        # core/resource_manager.hpp:61-70 + CountMappedMemory)
        from iresearch_tpu.utils import resource

        self.device_bytes = int(
            sum(a.nbytes for a in self.doc_words + self.freq_words)
            + sum(a.nbytes for a in (self.nrm_words or []))
            + sum(a.nbytes for a in self.base + self.bmax + self.bmaxf)
            + self.norms.nbytes
        )
        resource.manager().increase(resource.CATEGORY_DEVICE, self.device_bytes)
        # position pools upload lazily (pos_words()): only phrase-family
        # queries touch them, and for a large corpus they are the largest
        # transfer — don't pay it on plain term queries
        self._fp = fp
        self._pos_words: Dict[int, "object"] = {}
        self._dense_words: Dict[int, "object"] = {}
        if fp.docs_with_field > 0:
            self.avgdl = float(fp.total_term_freq) / float(fp.docs_with_field)
        else:
            self.avgdl = 1.0

    def norms_grid(self):
        """[ndrows, 128] view of the norms (u16 twin when exact) —
        cached: the serving path must not enqueue a device reshape per
        prepared batch."""
        cached = getattr(self, "_norms_grid", None)
        if cached is None:
            src = self.norms_u16 if self.norms_u16 is not None else self.norms
            cached = self._norms_grid = src.reshape(-1, 128)
        return cached

    def pos_words(self, c: int):
        """Device-resident position pool of class ``c`` (lazy, cached)."""
        cached = self._pos_words.get(c)
        if cached is None:
            import jax.numpy as jnp

            from iresearch_tpu.utils import resource

            src = self._fp.pos_words[c]
            rp = _pow2(src.shape[0])
            padded = np.zeros((rp, src.shape[1]), src.dtype)
            padded[: src.shape[0]] = src
            cached = jnp.asarray(padded)
            self._pos_words[c] = cached
            self.device_bytes += cached.nbytes
            resource.manager().increase(resource.CATEGORY_DEVICE, cached.nbytes)
        return cached

    def dense_words(self, dense_cache, c: int):
        """Device-resident dense grid pool of class ``c`` (lazy, cached).

        ``dense_cache`` is the host DenseCache (formats/dense.py) owned by
        the SegmentReader; pools upload on first use like pos_words."""
        cached = self._dense_words.get(c)
        if cached is None:
            import jax.numpy as jnp

            from iresearch_tpu.utils import resource

            cached = jnp.asarray(dense_cache.pools[c])
            self._dense_words[c] = cached
            self.device_bytes += cached.nbytes
            resource.manager().increase(resource.CATEGORY_DEVICE, cached.nbytes)
        return cached


class DeviceSegment:
    """Device residency for one segment: shared alive mask + per-field pools."""

    def __init__(self, num_docs: int, alive: np.ndarray) -> None:
        import jax.numpy as jnp

        self.num_docs = num_docs
        self.nd_pad = pad_docs(num_docs)
        padded = np.zeros(self.nd_pad, np.bool_)
        padded[:num_docs] = alive
        self.alive = jnp.asarray(padded)
        self._fields: Dict[str, DeviceField] = {}

    def field(self, name: str, fp: FieldPostings) -> DeviceField:
        df = self._fields.get(name)
        if df is None:
            df = DeviceField(fp)
            self._fields[name] = df
        return df


import itertools

_SEGMENT_SERIAL = itertools.count(1)


class SegmentReader:
    """Snapshot view of one committed segment (+ its doc mask generation)."""

    def __init__(
        self,
        name: str,
        data: SegmentData,
        masked_docs: Optional[np.ndarray] = None,
    ) -> None:
        self.name = name
        self.data = data
        self.num_docs = data.num_docs
        self._alive = np.ones(data.num_docs, np.bool_)
        if masked_docs is not None and len(masked_docs):
            self._alive[np.asarray(masked_docs, np.int64)] = False
        self._term_lists: Dict[str, TermDictView] = {}
        self._device: Optional[DeviceSegment] = None
        self._dense: Dict[str, "object"] = {}  # field -> DenseCache | None
        # process-unique identity token for prepared-plan caching
        # (exec/plancache.py) — id() could alias after GC, a serial can't
        self.serial = next(_SEGMENT_SERIAL)
        self._lookup_memo: Dict[Tuple[str, bytes], Optional[int]] = {}

    # --- stats ---------------------------------------------------------

    @property
    def docs_count(self) -> int:
        return self.num_docs

    @property
    def live_docs_count(self) -> int:
        return int(self._alive.sum())

    @property
    def alive(self) -> np.ndarray:
        return self._alive

    @property
    def has_deletes(self) -> bool:
        d = getattr(self, "_has_deletes", None)
        if d is None:
            d = not bool(self._alive.all())
            self._has_deletes = d
        return d

    def field_names(self) -> List[str]:
        return sorted(self.data.fields)

    def field(self, name: str) -> Optional[FieldPostings]:
        return self.data.fields.get(name)

    def column(self, name: str) -> Optional[Column]:
        return self.data.columns.get(name)

    def column_names(self) -> List[str]:
        return sorted(self.data.columns)

    # --- term dictionary ----------------------------------------------

    def terms(self, field_name: str) -> TermDictView:
        tl = self._term_lists.get(field_name)
        if tl is None:
            fp = self.data.fields.get(field_name)
            if fp is not None:
                tl = TermDictView(fp.term_blob, fp.term_offsets)
            else:
                tl = TermDictView(b"", np.zeros(1, np.uint64))
            self._term_lists[field_name] = tl
        return tl

    def lookup_term(self, field_name: str, term: bytes) -> Optional[int]:
        """Exact term -> tid (reference: term_reader seek, burst trie).

        Memoized: serving workloads re-look-up a hot term set every
        request (the reference's states_cache keeps seek cookies for the
        same reason, core/search/states_cache.hpp)."""
        key = (field_name, term)
        memo = self._lookup_memo
        hit = memo.get(key, -2)
        if hit != -2:
            return hit
        tl = self.terms(field_name)
        i = bisect.bisect_left(tl, term)
        out = i if (i < len(tl) and tl[i] == term) else None
        if len(memo) >= 1 << 17:  # bound host memory on adversarial streams
            memo.clear()
        memo[key] = out
        return out

    def term_range(
        self,
        field_name: str,
        low: Optional[bytes],
        high: Optional[bytes],
        include_low: bool = True,
        include_high: bool = True,
    ) -> Tuple[int, int]:
        """tid range [lo, hi) of terms within the bounds (None = unbounded)."""
        tl = self.terms(field_name)
        if low is None:
            lo = 0
        elif include_low:
            lo = bisect.bisect_left(tl, low)
        else:
            lo = bisect.bisect_right(tl, low)
        if high is None:
            hi = len(tl)
        elif include_high:
            hi = bisect.bisect_right(tl, high)
        else:
            hi = bisect.bisect_left(tl, high)
        return lo, max(lo, hi)

    def term_prefix_range(self, field_name: str, prefix: bytes) -> Tuple[int, int]:
        tl = self.terms(field_name)
        lo = bisect.bisect_left(tl, prefix)
        succ = _prefix_successor(prefix)
        hi = len(tl) if succ is None else bisect.bisect_left(tl, succ)
        return lo, max(lo, hi)

    # --- dense high-df term cache (formats/dense.py) -------------------

    def dense_cache(self, field_name: str):
        """Host DenseCache for this field (built lazily; None if no term
        qualifies). Pure acceleration: the oracle never reads it."""
        if field_name in self._dense:
            return self._dense[field_name]
        fp = self.data.fields.get(field_name)
        cache = None
        if fp is not None:
            from iresearch_tpu.formats.dense import build_dense_cache

            # deleted docs are zeroed at build: grid consumers (fused
            # scan, skyline, gridmix probes) then need no alive mask
            cache = build_dense_cache(
                fp, self.num_docs,
                alive=self._alive if self.has_deletes else None,
            )
        self._dense[field_name] = cache
        return cache

    def skyline_index(self, field_name: str, scorer, avgdl: float):
        """Per-(field, scorer, avgdl) SkylineIndex (exec/skyline.py) over
        this segment's dense cache; None when the field has no dense
        cache or doc lengths exceed u16 (the row summaries are u16).

        Keyed by the INDEX-WIDE avgdl the query scores with — a reopen
        that shifts avgdl rebuilds the permutation (prepare shares avgdl
        between oracle and device, so the key is exact by construction).
        """
        key = (field_name, scorer, float(avgdl))
        cached = getattr(self, "_skyline", None)
        if cached is None:
            cached = self._skyline = {}
        if key in cached:
            return cached[key]
        idx = None
        cache = self.dense_cache(field_name)
        if cache is not None and cache.dl_min is not None:
            fp = self.data.fields[field_name]
            if len(fp.norms) == 0 or fp.norms.max(initial=0) < 65536:
                from iresearch_tpu.exec.skyline import SkylineIndex

                idx = SkylineIndex(cache, scorer, avgdl)
        cached[key] = idx
        return idx

    def dense_span(self, field_name: str, tid: int):
        """(class, start_row, ndrows) of a term's grid rows, or None."""
        cache = self.dense_cache(field_name)
        if cache is None:
            return None
        span = cache.spans.get(tid)
        if span is None:
            return None
        return (span[0], span[1], cache.ndrows)

    # --- device --------------------------------------------------------

    def device(self) -> DeviceSegment:
        if self._device is None:
            self._device = DeviceSegment(self.num_docs, self._alive)
        return self._device

    def device_field(self, field_name: str) -> DeviceField:
        fp = self.data.fields[field_name]
        return self.device().field(field_name, fp)

    def invalidate_device(self) -> None:
        if self._device is not None:
            from iresearch_tpu.utils import resource

            for df in self._device._fields.values():
                resource.manager().decrease(
                    resource.CATEGORY_DEVICE, df.device_bytes
                )
        self._device = None
