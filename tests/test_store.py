"""Directory contract + blobpack tests (reference: tests/store/directory_test_case.cpp)."""

import numpy as np
import pytest

from iresearch_tpu.store.blobpack import BlobPackReader, BlobPackWriter, CorruptPackError
from iresearch_tpu.store.directory import (
    FSDirectory,
    LockObtainError,
    MemoryDirectory,
    clean_directory,
)


def make_dirs(tmp_path):
    return [MemoryDirectory(), FSDirectory(str(tmp_path / "fs"))]


@pytest.fixture(params=["memory", "fs"])
def directory(request, tmp_path):
    if request.param == "memory":
        return MemoryDirectory()
    return FSDirectory(str(tmp_path / "fs"))


class TestDirectoryContract:
    def test_write_read_roundtrip(self, directory):
        directory.write("a.bin", b"hello")
        assert directory.read("a.bin") == b"hello"
        assert directory.exists("a.bin")
        assert directory.length("a.bin") == 5

    def test_missing_file(self, directory):
        with pytest.raises(FileNotFoundError):
            directory.read("nope")
        assert not directory.exists("nope")
        assert directory.remove("nope") is False

    def test_list_and_remove(self, directory):
        directory.write("a", b"1")
        directory.write("b", b"2")
        assert directory.list() == ["a", "b"]
        assert directory.remove("a") is True
        assert directory.list() == ["b"]

    def test_atomic_rename(self, directory):
        directory.write("pending_segments_1", b"meta")
        directory.rename("pending_segments_1", "segments_1")
        assert not directory.exists("pending_segments_1")
        assert directory.read("segments_1") == b"meta"

    def test_rename_missing_raises(self, directory):
        with pytest.raises(FileNotFoundError):
            directory.rename("ghost", "x")

    def test_overwrite(self, directory):
        directory.write("f", b"one")
        directory.write("f", b"two")
        assert directory.read("f") == b"two"

    def test_sync(self, directory):
        directory.write("f", b"data")
        directory.sync(["f"])
        with pytest.raises(FileNotFoundError):
            directory.sync(["missing"])

    def test_single_writer_lock(self, directory):
        lock = directory.try_lock()
        assert lock is not None
        assert directory.try_lock() is None
        with pytest.raises(LockObtainError):
            directory.lock()
        lock.release()
        lock2 = directory.try_lock()
        assert lock2 is not None
        lock2.release()

    def test_cleaner(self, directory):
        directory.write("seg_a", b"x")
        directory.write("seg_b", b"y")
        directory.write("segments_1", b"m")
        removed = clean_directory(directory, {"seg_a", "segments_1"})
        assert removed == ["seg_b"]
        assert directory.exists("seg_a")


class TestBlobPack:
    def test_roundtrip(self, rng):
        w = BlobPackWriter({"kind": "segment", "num_docs": 7})
        a = rng.integers(0, 255, size=(3, 128), dtype=np.uint8)
        b = rng.standard_normal(17).astype(np.float32)
        c = np.arange(5, dtype=np.uint64)
        w.add("a", a)
        w.add("b", b)
        w.add("c", c)
        blob = w.tobytes()
        r = BlobPackReader(blob)
        assert r.meta == {"kind": "segment", "num_docs": 7}
        assert set(r.names()) == {"a", "b", "c"}
        np.testing.assert_array_equal(r.array("a"), a)
        np.testing.assert_array_equal(r.array("b"), b)
        np.testing.assert_array_equal(r.array("c"), c)

    def test_alignment(self):
        w = BlobPackWriter()
        w.add("x", np.ones(3, np.uint8))
        w.add("y", np.ones((4, 4), np.float32))
        blob = w.tobytes()
        r = BlobPackReader(blob)
        base = np.frombuffer(blob, np.uint8).ctypes.data
        for name in r.names():
            arr = r.array(name)
            # blob offsets within the file image are 64-byte aligned
            assert (arr.ctypes.data - base) % 64 == 0 or arr.nbytes == 0

    def test_corruption_detected(self):
        w = BlobPackWriter()
        w.add("x", np.arange(100, dtype=np.uint32))
        blob = bytearray(w.tobytes())
        blob[50] ^= 0xFF
        with pytest.raises(CorruptPackError):
            BlobPackReader(bytes(blob))

    def test_bad_magic(self):
        with pytest.raises(CorruptPackError):
            BlobPackReader(b"\x00" * 32)

    def test_duplicate_name_rejected(self):
        w = BlobPackWriter()
        w.add("x", np.zeros(1))
        with pytest.raises(ValueError):
            w.add("x", np.zeros(1))

    def test_empty_array(self):
        w = BlobPackWriter()
        w.add("empty", np.zeros((0, 128), np.uint16))
        r = BlobPackReader(w.tobytes())
        assert r.array("empty").shape == (0, 128)
