"""pyresearch facade + resource accounting tests."""

import numpy as np
import pytest

from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.store.directory import FSDirectory
from iresearch_tpu.utils import resource


@pytest.fixture(scope="module")
def index_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pyr")
    d = FSDirectory(str(p))
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([Field("body", "red fox ran", analyzer="segmentation"),
                  Field("id", "0", index=True, store=True)])
        w.insert([Field("body", "red dog sat", analyzer="segmentation"),
                  Field("id", "1", index=True, store=True)])
        w.commit()
    return str(p)


def test_index_dump_script_shape(index_path):
    """The reference's python/scripts/index-dump.py flow works unchanged."""
    from iresearch_tpu import pyresearch

    index = pyresearch.index_reader.open(index_path)
    assert index.docs_count() == 2
    seen_terms = []
    postings = {}
    for segment in index:
        assert segment.docs_count() == 2
        for field in segment.fields():
            assert field.name() in ("body", "id")
            it = field.iterator()
            while it.next():
                seen_terms.append(it.value())
                docs = it.postings()
                got = []
                while docs.next():
                    got.append(docs.value())
                postings[it.value()] = got
        cols = segment.columns()
        assert [c.name() for c in cols] == ["id"]
        vals = segment.column(cols[0].id())
        assert list(vals) == [0, 1]
        assert vals[0] == b"0"
    assert b"red" in seen_terms
    assert postings[b"red"] == [0, 1]
    assert postings[b"fox"] == [0]


def test_term_iterator_seek(index_path):
    from iresearch_tpu import pyresearch

    index = pyresearch.index_reader.open(index_path)
    seg = next(iter(index))
    it = seg.field("body").iterator()
    assert it.seek(b"red")
    assert it.value() == b"red"
    assert it.seek_ge(b"do") == pyresearch.SEEK_NOT_FOUND
    assert it.value() == b"dog"
    assert it.seek_ge(b"zzz") == pyresearch.SEEK_END
    d = it.postings() if it.seek(b"fox") else None
    assert d.seek(0) == 0


def test_device_memory_accounting(index_path):
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.exec import DeviceQuery

    r = DirectoryReader.open(FSDirectory(index_path))
    before = resource.manager().used(resource.CATEGORY_DEVICE)
    sr = list(r.segments)[0]
    DeviceQuery(F.ByTerm("body", "red"), [sr]).execute_segment(0, 5)
    after = resource.manager().used(resource.CATEGORY_DEVICE)
    assert after > before
    sr.invalidate_device()
    assert resource.manager().used(resource.CATEGORY_DEVICE) <= before + 0


def test_limiter_vetoes():
    m = resource.ResourceManager(limiter=lambda cat, cur, d: cur + d <= 100)
    m.increase("x", 60)
    with pytest.raises(resource.ResourceLimitExceeded):
        m.increase("x", 60)
    m.decrease("x", 30)
    m.increase("x", 60)
    assert m.used("x") == 90
