"""Object pools / thread pool / wait group (reference: object_pool.hpp,
async_utils.hpp:54, wait_group.hpp) + writer context pooling."""

import threading
import time

import pytest

from iresearch_tpu.utils.pools import (
    BoundedObjectPool,
    ThreadPool,
    UnboundedObjectPool,
    WaitGroup,
)


def test_bounded_pool_blocks_and_reuses():
    made = []
    pool = BoundedObjectPool(lambda: made.append(1) or object(), size=2)
    a = pool.acquire()
    b = pool.acquire()
    assert pool.acquire(timeout=0.05) is None  # exhausted
    pool.release(a)
    c = pool.acquire()
    assert c is a  # reused, not rebuilt
    assert len(made) == 2
    pool.release(b)
    pool.release(c)
    with pool.lease() as obj:
        assert obj in (a, b)


def test_unbounded_pool_caches():
    made = []
    pool = UnboundedObjectPool(lambda: made.append(1) or object(), max_cached=1)
    a = pool.acquire()
    b = pool.acquire()
    pool.release(a)
    pool.release(b)  # over cache cap: dropped
    c = pool.acquire()
    assert c is a
    assert len(made) == 2


def test_thread_pool_and_wait_group():
    pool = ThreadPool(3, name="t")
    wg = WaitGroup()
    out = []
    lock = threading.Lock()
    for i in range(20):
        def work(i=i):
            time.sleep(0.001)
            with lock:
                out.append(i)
        pool.submit(work, wg)
    assert wg.wait(5.0)
    assert sorted(out) == list(range(20))
    pool.stop()
    with pytest.raises(RuntimeError):
        pool.submit(lambda: None)
    assert all(t.name.startswith("t-") for t in pool._threads)


def test_writer_context_pool_reuse():
    from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
    from iresearch_tpu.store.directory import MemoryDirectory

    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([Field("body", "one", analyzer="segmentation")])  # adopted
        seg1 = w._pending
        w.insert([Field("body", "two", analyzer="segmentation")])  # absorbed
        # the absorbed context went back to the pool and gets reused
        ctx = w._ctx_pool.acquire()
        assert ctx is not seg1 and ctx.num_docs == 0
        w._ctx_pool.release(ctx)
        tx = w.batch()
        tx.rollback()  # rollback returns the context too
        w.commit()
