"""Parallel ingest contexts (VERDICT r2 item 4).

Transactions tokenize into private _PendingSegment contexts OUTSIDE the
writer's ingest mutex (the SegmentContext-pool analog,
index_writer.hpp:183,232); register() merges pre-tokenized streams with
a vectorized tid remap. On this 1-vCPU CI image thread scaling is
unmeasurable, so the tests assert the structural property directly.
"""

import threading

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.directory import MemoryDirectory


def test_tokenize_runs_outside_mutex():
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        # hold the ingest mutex on another thread: insert() must still
        # tokenize (only register() needs the mutex)
        w._mutex.acquire()
        try:
            tx = w.batch()
            tx.insert([Field("body", "alpha beta gamma", analyzer="segmentation")])
            pf = tx._seg.fields["body"]
            ntok = sum(len(c[0]) for c in pf.chunks) + len(pf.tok_tid)
            assert ntok == 3, "insert() must tokenize without the mutex"
            done = threading.Event()

            def reg():
                tx.register()  # blocks on the mutex
                done.set()

            t = threading.Thread(target=reg)
            t.start()
            assert not done.wait(0.2), "register() must require the mutex"
        finally:
            w._mutex.release()
        t.join(5)
        assert done.is_set()
        w.commit()
    r = DirectoryReader.open(d)
    assert r.segments[0].num_docs == 1


def test_parallel_transactions_equal_serial():
    rng = np.random.default_rng(4)
    words = ["ant", "bee", "cat", "dog", "elk", "fox"]
    docs = [
        " ".join(words[int(x)] for x in rng.integers(0, len(words), size=10))
        for _ in range(200)
    ]

    def build(parallel: bool):
        d = MemoryDirectory()
        with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
            if parallel:
                # 4 threads, disjoint slices, one transaction per thread;
                # register in a fixed order so doc ids are deterministic
                txs = [w.batch() for _ in range(4)]

                def work(ti):
                    for text in docs[ti::4]:
                        txs[ti].insert(
                            [Field("body", text, analyzer="segmentation")]
                        )

                threads = [
                    threading.Thread(target=work, args=(ti,))
                    for ti in range(4)
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                for tx in txs:
                    tx.register()
            else:
                for ti in range(4):
                    for text in docs[ti::4]:
                        w.insert(
                            [Field("body", text, analyzer="segmentation")]
                        )
            w.commit()
        return DirectoryReader.open(d)

    ra = build(False)
    rb = build(True)
    for flt in [
        F.ByTerm("body", "ant"),
        F.Or(F.ByTerm("body", "bee"), F.ByTerm("body", "fox")),
        F.ByPhrase("body", ["cat", "dog"]),
    ]:
        ta = HostQuery(flt, list(ra.segments), BM25()).top_k(10)
        tb = HostQuery(flt, list(rb.segments), BM25()).top_k(10)
        assert ta == tb


def test_interleaved_remove_insert_ticks():
    """replace() inside one transaction: the remove must not hit the
    insert that follows it (tick ordering preserved through the merge)."""
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([Field("id", "a", index=True)])
        w.commit()
        with w.batch() as tx:
            tx.replace(F.ByTerm("id", "a"), [Field("id", "a", index=True)])
        w.commit()
        r = DirectoryReader.open(d)
        alive = sum(sr.live_docs_count for sr in r.segments)
        assert alive == 1
