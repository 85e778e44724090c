"""Store features: encryption/compression/caching wrappers + fault-injected
commit atomicity.

Reference analogs: the directory x encryption test matrix
(tests/tests_param.hpp:106-199, rot13 cipher) and index_death_tests.cpp
(failing_directory: io error at every chosen operation must leave the last
committed generation intact).
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader, find_last_generation
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import search
from iresearch_tpu.store.codecs import (
    AesCtrCipher,
    AsyncDirectory,
    CachingDirectory,
    EncryptedDirectory,
    Lz4Compressor,
    Rot13Cipher,
    XorCtrCipher,
    get_compressor,
)
from iresearch_tpu.store.directory import Directory, MemoryDirectory


def build_index(d, compression="none", n=50):
    with IndexWriter(
        d, IndexWriterOptions(invert_backend="numpy", column_compression=compression)
    ) as w:
        for i in range(n):
            w.insert([
                Field("body", f"doc number {i} alpha beta", analyzer="segmentation"),
                Field("id", str(i), index=True, store=True),
            ])
        w.commit()
    return d


PARAMS = [
    ("plain", lambda: MemoryDirectory(), "none"),
    ("rot13", lambda: EncryptedDirectory(MemoryDirectory(), Rot13Cipher()), "none"),
    ("xorctr", lambda: EncryptedDirectory(MemoryDirectory(), XorCtrCipher(b"k" * 16)), "none"),
    ("caching", lambda: CachingDirectory(MemoryDirectory()), "none"),
    ("async", lambda: AsyncDirectory(MemoryDirectory()), "none"),
    ("async+rot13", lambda: AsyncDirectory(EncryptedDirectory(MemoryDirectory(), Rot13Cipher())), "none"),
    ("zlib", lambda: MemoryDirectory(), "zlib"),
    ("lz4", lambda: MemoryDirectory(), "lz4"),
    ("rot13+zlib", lambda: EncryptedDirectory(MemoryDirectory(), Rot13Cipher()), "zlib"),
    ("aesctr", lambda: EncryptedDirectory(MemoryDirectory(), AesCtrCipher(b"k" * 16)), "none"),
    ("aesctr+lz4", lambda: EncryptedDirectory(MemoryDirectory(), AesCtrCipher(b"secret")), "lz4"),
    ("lz4dict", lambda: MemoryDirectory(), "lz4dict"),
    ("delta", lambda: MemoryDirectory(), "delta"),
    ("rot13+delta", lambda: EncryptedDirectory(MemoryDirectory(), Rot13Cipher()), "delta"),
]


def test_lz4_is_real_lz4():
    """The codec must produce actual LZ4 block format, not an alias of
    another algorithm (round-1 'lz4' silently meant zlib)."""
    c = Lz4Compressor()
    data = b"abcdabcdabcdabcd" * 64
    packed = c.compress(data)
    assert c.decompress(packed) == data
    assert len(packed) < len(data)
    import zlib
    # not a zlib stream: zlib.decompress must fail on the payload
    with pytest.raises(Exception):
        zlib.decompress(packed[4:])
    with pytest.raises(Exception):
        zlib.decompress(packed)
    assert get_compressor("lz4").name == "lz4"


def test_aes_ctr_known_answer():
    """NIST SP 800-38A F.5.1 CTR-AES128 vector: proves the cipher is real
    AES-CTR, not a keyed-XOR stand-in (round-1 weakness)."""
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    want = bytes.fromhex("874d6191b620e3261bef6864990db6ce")
    c = AesCtrCipher(key)
    assert c._xform_iv(iv, pt) == want
    # roundtrip through the file-name-derived IV path
    blob = b"The quick brown fox" * 100
    assert c.decrypt("a.seg", c.encrypt("a.seg", blob)) == blob
    assert c.encrypt("a.seg", blob) != c.encrypt("b.seg", blob)


@pytest.mark.parametrize("name,mk,comp", PARAMS, ids=[p[0] for p in PARAMS])
def test_directory_matrix(name, mk, comp):
    """Full index+search cycle across directory x cipher x codec, the
    reference's parametrized matrix style."""
    d = build_index(mk(), comp)
    r = DirectoryReader.open(d)
    hits = search(r, F.ByTerm("body", "alpha"), k=60)
    assert len(hits) == 50
    assert r.stored(hits[0][0], "id") is not None


def test_encrypted_bytes_differ():
    plain = build_index(MemoryDirectory())
    enc_inner = MemoryDirectory()
    build_index(EncryptedDirectory(enc_inner, Rot13Cipher()))
    f = [n for n in plain.list() if n.endswith(".seg")][0]
    assert plain.read(f) != enc_inner.read(f)
    # and the encrypted dir cannot be read without the cipher
    with pytest.raises(Exception):
        DirectoryReader.open(enc_inner)


def test_async_write_failure_surfaces_at_sync():
    class FailWrite(MemoryDirectory):
        def write(self, name, data):
            if name.endswith(".seg"):
                raise OSError("disk full")
            super().write(name, data)

    d = AsyncDirectory(FailWrite())
    w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
    w.insert([Field("body", "doc", analyzer="segmentation")])
    with pytest.raises(OSError):
        w.commit()
    w.close()


def test_reader_options_preload():
    from iresearch_tpu.index.reader import ReaderOptions
    from iresearch_tpu.utils import resource

    d = build_index(MemoryDirectory())
    before = resource.manager().used(resource.CATEGORY_DEVICE)
    r = DirectoryReader.open(d, ReaderOptions(preload_fields=("body",)))
    assert resource.manager().used(resource.CATEGORY_DEVICE) > before
    for sr in r.segments:
        sr.invalidate_device()


def test_corruption_detected():
    """Flipped bytes in a segment file fail the blobpack checksum
    (reference: buffered_index_input checksum validation)."""
    d = build_index(MemoryDirectory(), n=10)
    name = [n for n in d.list() if n.endswith(".seg")][0]
    blob = bytearray(d.read(name))
    blob[len(blob) // 2] ^= 0xFF
    d.write(name, bytes(blob))
    with pytest.raises(Exception, match="checksum|corrupt"):
        DirectoryReader.open(d)


def test_compression_shrinks():
    txt = "repeat " * 200
    raw = get_compressor("zlib").compress(txt.encode())
    assert len(raw) < len(txt)
    assert get_compressor("zlib").decompress(raw) == txt.encode()


class FailingDirectory(Directory):
    """Throws OSError on the N-th call of a chosen operation
    (reference: tests/index/index_death_tests.cpp failing_directory)."""

    def __init__(self, inner):
        self.inner = inner
        self.fail_op = None
        self.fail_at = -1
        self._counts = {}

    def arm(self, op, at=0):
        self.fail_op = op
        self.fail_at = at
        self._counts[op] = 0

    def _check(self, op):
        if op == self.fail_op:
            c = self._counts.get(op, 0)
            self._counts[op] = c + 1
            if c == self.fail_at:
                raise OSError(f"injected failure: {op}[{c}]")

    def write(self, name, data):
        self._check("write")
        self.inner.write(name, data)

    def read(self, name):
        self._check("read")
        return self.inner.read(name)

    def exists(self, name):
        return self.inner.exists(name)

    def list(self):
        return self.inner.list()

    def remove(self, name):
        self._check("remove")
        return self.inner.remove(name)

    def rename(self, src, dst):
        self._check("rename")
        self.inner.rename(src, dst)

    def sync(self, names):
        self._check("sync")
        self.inner.sync(names)

    def try_lock(self, name="write.lock"):
        return self.inner.try_lock(name)

    def length(self, name):
        return self.inner.length(name)


@pytest.mark.parametrize("op,at", [
    ("write", 0), ("write", 1), ("sync", 0), ("rename", 0),
])
def test_commit_atomicity_under_failure(op, at):
    """A failure at ANY point of the second commit leaves generation 1
    committed, consistent, and reopenable — two-phase commit atomicity
    (reference: formats_10.cpp:2826-2981 + index_death_tests)."""
    inner = MemoryDirectory()
    d = FailingDirectory(inner)
    w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
    w.insert([Field("body", "first generation doc", analyzer="segmentation")])
    assert w.commit()
    gen1 = find_last_generation(inner)

    w.insert([Field("body", "second generation doc", analyzer="segmentation")])
    d.arm(op, at)
    with pytest.raises(OSError):
        w.commit()
    d.fail_op = None

    # previous generation survives and is consistent
    assert find_last_generation(inner) == gen1
    r = DirectoryReader.open(inner)
    assert r.docs_count == 1
    assert len(search(r, F.ByTerm("body", "first"), k=5)) == 1
    assert len(search(r, F.ByTerm("body", "second"), k=5)) == 0
    w.close()

    # a fresh writer can clean up and commit on top
    w2 = IndexWriter(inner, IndexWriterOptions(invert_backend="numpy"))
    w2.insert([Field("body", "third generation doc", analyzer="segmentation")])
    assert w2.commit()
    w2.close()
    r2 = DirectoryReader.open(inner)
    assert len(search(r2, F.ByTerm("body", "third"), k=5)) == 1


def test_delta_codec_roundtrip_and_ratio():
    """Delta + zig-zag varint codec (reference: delta_compression.cpp) —
    sorted-ish u64 payloads shrink to ~1-2 B/value; byte-exact roundtrip;
    non-u64-aligned payloads frame raw."""
    from iresearch_tpu.store.codecs import DeltaCompressor

    c = DeltaCompressor()
    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.integers(0, 100, 10_000).astype(np.uint64))
    blob = vals.tobytes()
    packed = c.compress(blob)
    assert c.decompress(packed) == blob
    assert len(packed) <= 2 * len(vals), (
        f"{len(packed)/len(vals):.2f} B/value for smooth deltas"
    )
    # descending / negative deltas survive via zig-zag
    vals2 = vals[::-1].copy()
    assert c.decompress(c.compress(vals2.tobytes())) == vals2.tobytes()
    # extremes: wraparound deltas
    vals3 = np.array([0, 2**64 - 1, 1, 2**63], np.uint64)
    assert c.decompress(c.compress(vals3.tobytes())) == vals3.tobytes()
    # unaligned payload -> raw framing
    odd = b"x" * 13
    assert c.decompress(c.compress(odd)) == odd
    assert get_compressor("delta").name == "delta"


def test_lz4dict_carried_dictionary_blocks():
    """Carried-dict lz4 (reference: streaming lz4, lz4compression.hpp:
    47-71): blocks 1+ compress against block 0 and must beat plain
    per-block lz4 on cross-block-redundant columns; lazy point reads
    stay block-granular (block b touches at most blocks {0, b})."""
    from iresearch_tpu.formats.columnstore import (
        COLUMN_BLOCK,
        ColumnBlocks,
        split_column_blocks,
    )
    from iresearch_tpu.store.codecs import get_compressor

    rng = np.random.default_rng(11)
    n = int(2.5 * COLUMN_BLOCK)
    # values share vocabulary across blocks (dictionary-compressible)
    words = [rng.bytes(12) for _ in range(64)]
    vals = [words[int(i)] for i in rng.integers(0, 64, n)]
    offsets = np.zeros(n + 1, np.uint64)
    offsets[1:] = np.cumsum([len(v) for v in vals])
    blob = b"".join(vals)

    plain = get_compressor("lz4")
    withd = get_compressor("lz4dict")
    comp_p, _ = split_column_blocks(offsets, blob, plain)
    comp_d, boffs = split_column_blocks(offsets, blob, withd)
    assert len(comp_d) < len(comp_p), "dict blocks must beat plain lz4"

    cb = ColumnBlocks(comp_d, boffs, offsets, withd, n)
    for i in [0, 1, COLUMN_BLOCK - 1, COLUMN_BLOCK, 2 * COLUMN_BLOCK + 7, n - 1]:
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        assert cb.read(i, lo, hi) == blob[lo:hi]
    assert cb.tobytes() == blob


def _docs_matching(r, term):
    return len(search(r, F.ByTerm("body", term), k=1000))


_SWEEP = [
    (op, at)
    for op in ("write", "read", "sync", "rename", "remove")
    for at in (0, 1, 2)
]


@pytest.mark.parametrize("op,at", _SWEEP, ids=[f"{o}{a}" for o, a in _SWEEP])
def test_consolidation_atomicity_under_failure(op, at):
    """Failure injected at EVERY directory op x call count during
    consolidation: the prior generation must stay committed, readable
    after a reopen, and pre-failure snapshot readers must keep serving
    (reference: index_death_tests.cpp:40-90 consolidation surfaces).
    Ops the consolidation never reaches simply succeed — asserted
    consistent either way."""
    inner = MemoryDirectory()
    d = FailingDirectory(inner)
    w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
    for gen in range(3):  # 3 committed segments = a consolidation candidate set
        for i in range(4):
            w.insert([
                Field("body", f"alpha g{gen} d{i}", analyzer="segmentation")
            ])
        assert w.commit()
    gen_before = find_last_generation(inner)
    snap = DirectoryReader.open(inner)  # pre-failure snapshot
    assert _docs_matching(snap, "alpha") == 12

    d.arm(op, at)
    try:
        w.consolidate()
        failed = False
    except OSError:
        failed = True
    d.fail_op = None

    # snapshot isolation: the old reader still serves its generation
    assert _docs_matching(snap, "alpha") == 12
    # reopen: whatever generation is last must be complete + consistent
    r = DirectoryReader.open(inner)
    assert _docs_matching(r, "alpha") == 12
    if failed:
        # a failure AFTER the atomic rename (orphan GC's `remove`) leaves
        # the new generation legitimately published; anything earlier
        # must leave the prior generation last
        assert find_last_generation(inner) in (gen_before, gen_before + 1)
    # recovery: a later consolidation (or commit) proceeds normally
    w.consolidate()
    w.close()
    r2 = DirectoryReader.open(inner)
    assert _docs_matching(r2, "alpha") == 12


_IMPORT_SWEEP = [
    (op, at) for op in ("write", "sync", "rename") for at in (0, 1)
]


@pytest.mark.parametrize(
    "op,at", _IMPORT_SWEEP, ids=[f"{o}{a}" for o, a in _IMPORT_SWEEP]
)
def test_import_atomicity_under_failure(op, at):
    """Failure during the commit that publishes imported segments
    (reference: IndexWriter::Import, index_writer.cpp:1653 + death
    tests): the prior generation survives; the import can be retried."""
    src = MemoryDirectory()
    with IndexWriter(src, IndexWriterOptions(invert_backend="numpy")) as ws:
        for i in range(5):
            ws.insert([Field("body", f"imported d{i}", analyzer="segmentation")])
        ws.commit()
    src_reader = DirectoryReader.open(src)

    inner = MemoryDirectory()
    d = FailingDirectory(inner)
    w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
    w.insert([Field("body", "native doc", analyzer="segmentation")])
    assert w.commit()
    gen1 = find_last_generation(inner)

    w.import_reader(src_reader)
    d.arm(op, at)
    try:
        w.commit()
        failed = False  # call count past what this commit performs
    except OSError:
        failed = True
    d.fail_op = None

    if failed:
        assert find_last_generation(inner) == gen1
        r = DirectoryReader.open(inner)
        assert _docs_matching(r, "native") == 1
        assert _docs_matching(r, "imported") == 0
        # retry: the import is re-staged and publishes cleanly
        w.import_reader(src_reader)
        assert w.commit()
    w.close()
    r2 = DirectoryReader.open(inner)
    assert _docs_matching(r2, "native") == 1
    assert _docs_matching(r2, "imported") == 5


def test_reopen_during_failed_commit_window():
    """A reader that reopens BETWEEN a failed commit and the writer's
    recovery sees the prior generation (never a torn one), and reopen
    reuses unchanged segment readers (reference: reader refresh race,
    directory_reader_impl.cpp:209+)."""
    inner = MemoryDirectory()
    d = FailingDirectory(inner)
    w = IndexWriter(d, IndexWriterOptions(invert_backend="numpy"))
    w.insert([Field("body", "alpha one", analyzer="segmentation")])
    assert w.commit()
    r1 = DirectoryReader.open(inner)

    w.insert([Field("body", "alpha two", analyzer="segmentation")])
    d.arm("rename", 0)
    with pytest.raises(OSError):
        w.commit()
    d.fail_op = None

    r2 = r1.reopen()
    assert _docs_matching(r2, "alpha") == 1
    # unchanged segment readers are REUSED across reopen
    assert r2.segments[0] is r1.segments[0]

    # recovery commit ("alpha two" was discarded with the failed commit —
    # the same discard semantics test_commit_atomicity_under_failure
    # pins), then reopen picks up the new generation
    w.insert([Field("body", "alpha three", analyzer="segmentation")])
    assert w.commit()
    w.close()
    r3 = r2.reopen()
    assert _docs_matching(r3, "alpha") == 2
