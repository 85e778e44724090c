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
