"""Concurrency stress: concurrent transactions + commits + consolidation
with snapshot-isolated readers.

Reference analog: tests/index/index_profile_tests.cpp (profile_bulk_index:
insert/update thread mixes against one writer with concurrent commits,
final index validated).
"""

import threading

import numpy as np
import pytest

from iresearch_tpu.index.consolidate import (
    consolidate_bytes,
    consolidate_bytes_accum,
    consolidate_count,
    consolidate_tier,
)
from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import search
from iresearch_tpu.store.directory import MemoryDirectory

N_THREADS = 4
DOCS_PER_THREAD = 120


def test_profile_bulk_index():
    d = MemoryDirectory()
    opts = IndexWriterOptions(invert_backend="numpy", segment_docs_max=64)
    errors = []
    with IndexWriter(d, opts) as w:
        stop = threading.Event()

        def committer():
            while not stop.wait(0.01):
                try:
                    w.commit()
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        def consolidator():
            while not stop.wait(0.03):
                try:
                    w.consolidate(consolidate_tier(min_segments=3))
                    w.commit()
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        def inserter(tn):
            try:
                for i in range(DOCS_PER_THREAD):
                    key = f"{tn}-{i}"
                    with w.batch() as tx:
                        tx.insert([
                            Field("body", f"payload {tn} token{i % 7}", analyzer="segmentation"),
                            Field("key", key, index=True, store=True),
                        ])
                    if i % 30 == 29:  # update a recent doc
                        with w.batch() as tx:
                            tx.replace(
                                F.ByTerm("key", key),
                                [
                                    Field("body", f"updated {tn} token{i % 7}", analyzer="segmentation"),
                                    Field("key", key, index=True, store=True),
                                ],
                            )
            except Exception as e:  # pragma: no cover
                errors.append(e)

        ct = threading.Thread(target=committer)
        cs = threading.Thread(target=consolidator)
        ins = [threading.Thread(target=inserter, args=(t,)) for t in range(N_THREADS)]
        ct.start()
        cs.start()
        for t in ins:
            t.start()
        # concurrent snapshot readers must never see a broken index
        for _ in range(20):
            r = DirectoryReader.open(d) if d.exists("segments_1") or True else None
            try:
                if r is not None and len(r.segments):
                    search(r, F.ByTerm("body", "payload"), k=5)
            except FileNotFoundError:
                pass  # racing the cleaner between generations is allowed
        for t in ins:
            t.join()
        stop.set()
        ct.join()
        cs.join()
        w.commit()

    assert not errors, errors
    r = DirectoryReader.open(d)
    total = N_THREADS * DOCS_PER_THREAD
    assert r.live_docs_count == total
    # every key is present exactly once (replace semantics held up)
    for tn in range(N_THREADS):
        for i in range(0, DOCS_PER_THREAD, 37):
            hits = search(r, F.ByTerm("key", f"{tn}-{i}"), k=3)
            assert len(hits) == 1, (tn, i, hits)
    # updated docs carry the new body
    hits = search(
        r,
        F.And(F.ByTerm("key", "0-29"), F.ByTerm("body", "updated")),
        k=3,
    )
    assert len(hits) == 1


class _GatedDirectory(MemoryDirectory):
    """MemoryDirectory whose segment-file writes block on an event —
    freezes a commit mid-write to prove inserts don't wait on it."""

    def __init__(self):
        super().__init__()
        self.gate = threading.Event()
        self.in_write = threading.Event()
        self.gated = False

    def write(self, name, data):
        if self.gated and name.endswith(".seg"):
            self.in_write.set()
            assert self.gate.wait(30.0), "test gate never opened"
        super().write(name, data)


def test_insert_during_commit():
    """Double-buffered flush (reference: FlushContext switch,
    index_writer.cpp:1712-1763): _register_batch never waits for a
    running commit's encode/write. The commit is frozen inside its
    segment write; inserts and even a segment roll must complete."""
    d = _GatedDirectory()
    opts = IndexWriterOptions(invert_backend="numpy", segment_docs_max=8)
    with IndexWriter(d, opts) as w:
        for i in range(5):
            w.insert([Field("body", f"first batch doc{i}", analyzer="segmentation")])
        d.gated = True
        t = threading.Thread(target=w.commit)
        t.start()
        assert d.in_write.wait(30.0)
        # commit is parked inside the directory write, holding only
        # _commit_lock. Inserts — including ones that roll a segment —
        # must complete promptly.
        done = threading.Event()

        def insert_more():
            for i in range(20):  # > segment_docs_max: forces a roll
                w.insert([Field("body", f"second batch doc{i}", analyzer="segmentation")])
            done.set()

        t2 = threading.Thread(target=insert_more)
        t2.start()
        assert done.wait(10.0), "insert blocked behind a running commit"
        t2.join()
        d.gate.set()
        t.join()
        d.gated = False
        w.commit()
    r = DirectoryReader.open(d)
    assert r.live_docs_count == 25


def test_consolidate_concurrent_delete_remap():
    """Deletes that land while a consolidation merge is running are
    remapped into the merged segment at publication (reference:
    CandidateMapping, index_writer.cpp:388-400)."""
    d = MemoryDirectory()
    opts = IndexWriterOptions(invert_backend="numpy")
    with IndexWriter(d, opts) as w:
        for s in range(3):
            for i in range(10):
                w.insert([
                    Field("body", f"tok{s}x{i}", analyzer="segmentation"),
                    Field("key", f"{s}-{i}", index=True),
                ])
            w.commit()

        # run the merge against a snapshot, then delete before publication
        from iresearch_tpu.index.merge import merge_segments

        orig_merge = merge_segments
        import iresearch_tpu.index.writer as writer_mod

        def slow_merge(readers, sort=None, return_doc_maps=False):
            out = orig_merge(readers, sort=sort, return_doc_maps=return_doc_maps)
            # a delete lands between merge and publication
            w.remove(F.ByTerm("key", "1-3"))
            w.commit()
            return out

        import iresearch_tpu.index.merge as merge_mod
        merge_mod_orig = merge_mod.merge_segments
        merge_mod.merge_segments = slow_merge
        try:
            assert w.consolidate(consolidate_count())
        finally:
            merge_mod.merge_segments = merge_mod_orig
    r = DirectoryReader.open(d)
    assert len(r.segments) == 1
    assert r.live_docs_count == 29
    assert search(r, F.ByTerm("key", "1-3"), k=3) == []
    assert len(search(r, F.ByTerm("key", "1-4"), k=3)) == 1


def test_byte_policies():
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for size, n in [(5, 3), (500, 1)]:
            for i in range(n):
                for j in range(size):
                    w.insert([Field("body", f"doc {i} {j} filler " * 3, analyzer="segmentation")])
                w.commit()
    r = DirectoryReader.open(d)
    assert len(r.segments) == 4
    small = consolidate_bytes(threshold=0.25)(r)
    assert len(small) == 3  # the three small segments
    accum = consolidate_bytes_accum(threshold=0.5)(r)
    assert len(accum) >= 2 and all(i in (0, 1, 2) for i in accum)
