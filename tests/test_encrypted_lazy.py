"""Block-granular encryption: random-access CTR decrypt keeps mmap lazy
opens and v6 lazy column blocks alive (reference: stream/block cipher
wrapping, core/utils/encryption.hpp:56-116).

Round-3 VERDICT missing #3: EncryptedDirectory ciphered whole blobs and
did not override read_mapped, so an encrypted index forfeited lazy opens.
"""

import numpy as np
import pytest

from iresearch_tpu.index.reader import DirectoryReader
from iresearch_tpu.index.writer import Field, IndexWriter, IndexWriterOptions
from iresearch_tpu.search import filters as F
from iresearch_tpu.search.host_eval import HostQuery
from iresearch_tpu.search.scorers import BM25
from iresearch_tpu.store.codecs import (
    AesCtrCipher,
    Cipher,
    EncryptedDirectory,
    LazyDecryptBuffer,
    Rot13Cipher,
    XorCtrCipher,
)
from iresearch_tpu.store.directory import MemoryDirectory, MMapDirectory

CIPHERS = [
    ("rot13", lambda: Rot13Cipher()),
    ("xorctr", lambda: XorCtrCipher(b"k" * 16)),
    ("aesctr", lambda: AesCtrCipher(b"secret key bytes")),
]


class TestDecryptAt:
    """decrypt_at(name, ct[o:o+n], o) == pt[o:o+n] for arbitrary ranges."""

    @pytest.mark.parametrize("name,mk", CIPHERS, ids=[c[0] for c in CIPHERS])
    def test_random_ranges(self, name, mk, rng):
        c = mk()
        assert c.random_access
        pt = bytes(rng.integers(0, 256, size=100_000, dtype=np.uint8))
        ct = c.encrypt("file.bin", pt)
        assert c.decrypt("file.bin", ct) == pt
        for _ in range(20):
            o = int(rng.integers(0, len(pt) - 1))
            n = int(rng.integers(1, min(5000, len(pt) - o)))
            assert c.decrypt_at("file.bin", ct[o : o + n], o) == pt[o : o + n]
        # boundary cases around the 16/32-byte counter blocks
        for o, n in [(0, 1), (15, 2), (16, 16), (17, 31), (31, 33), (4096, 64)]:
            assert c.decrypt_at("file.bin", ct[o : o + n], o) == pt[o : o + n]

    def test_lazy_buffer_slicing(self, rng):
        c = XorCtrCipher(b"key")
        pt = bytes(rng.integers(0, 256, size=10_000, dtype=np.uint8))
        ct = c.encrypt("f", pt)
        buf = LazyDecryptBuffer(ct, c, "f")
        assert len(buf) == len(pt)
        assert buf[100:200] == pt[100:200]
        assert buf[:8] == pt[:8]
        assert buf[-4:] == pt[-4:]
        assert buf[17] == pt[17]
        assert buf.tobytes() == pt


class RangeRecordingCipher(Cipher):
    """XorCtr wrapper recording how many ciphertext bytes were decrypted
    per file — the laziness probe."""

    random_access = True

    def __init__(self) -> None:
        self.inner = XorCtrCipher(b"probe key")
        self.decrypted: dict = {}

    def encrypt(self, name, data):
        return self.inner.encrypt(name, data)

    def decrypt(self, name, data):
        self.decrypted[name] = self.decrypted.get(name, 0) + len(data)
        return self.inner.decrypt(name, data)

    def decrypt_at(self, name, data, offset):
        self.decrypted[name] = self.decrypted.get(name, 0) + len(data)
        return self.inner.decrypt_at(name, data, offset)


def _build(d, nseg_docs=400):
    with IndexWriter(
        d,
        IndexWriterOptions(invert_backend="numpy", column_compression="zlib"),
    ) as w:
        with w.batch() as tx:
            for i in range(nseg_docs):
                tx.insert(
                    [
                        Field("body", f"alpha beta tok{i % 37}", analyzer="segmentation"),
                        Field("other", f"gamma delta tok{i % 11}", analyzer="segmentation"),
                        Field("stored", "v" * 64 + str(i), index=False, store=True),
                    ]
                )
        w.commit()


class TestEncryptedMapped:
    @pytest.mark.parametrize("name,mk", CIPHERS, ids=[c[0] for c in CIPHERS])
    def test_query_parity_vs_plaintext(self, name, mk, tmp_path):
        enc = EncryptedDirectory(MMapDirectory(str(tmp_path / "enc")), mk())
        plain = MemoryDirectory()
        _build(enc)
        _build(plain)
        assert enc.mapped_reads
        re, rp = DirectoryReader.open(enc), DirectoryReader.open(plain)
        flt = F.ByTerm("body", "tok3")
        he = HostQuery(flt, list(re.segments), BM25()).top_k(10)
        hp = HostQuery(flt, list(rp.segments), BM25()).top_k(10)
        assert he == hp
        # stored readback through the lazy-decrypt buffer
        assert re.stored(he[0][0], "stored") == rp.stored(hp[0][0], "stored")

    def test_open_is_lazy(self, tmp_path):
        probe = RangeRecordingCipher()
        enc = EncryptedDirectory(MMapDirectory(str(tmp_path / "enc")), probe)
        _build(enc)
        seg_file = [n for n in enc.inner.list() if n.endswith(".seg")][0]
        seg_size = enc.inner.length(seg_file)
        probe.decrypted.clear()

        r = DirectoryReader.open(enc)
        opened = probe.decrypted.get(seg_file, 0)
        # open decrypts the blobpack header ONLY — no blob payloads
        raw = enc.inner.read(seg_file)
        header_len = int(np.frombuffer(probe.decrypt_at(seg_file, raw[4:8], 4), "<u4")[0])
        probe.decrypted[seg_file] = opened  # undo the probe's own read
        assert opened <= 8 + header_len + 8, (opened, header_len, seg_size)

        # querying one field decrypts its pools but not the other field's
        flt = F.ByTerm("body", "alpha")
        hits = HostQuery(flt, list(r.segments), BM25()).top_k(5)
        assert hits
        after_q = probe.decrypted.get(seg_file, 0)
        assert after_q > opened
        assert after_q < seg_size, (after_q, seg_size)

        # a stored point read decrypts ~one column block, not the column
        _ = r.stored(hits[0][0], "stored")
        after_s = probe.decrypted.get(seg_file, 0)
        assert after_s < seg_size, (after_s, seg_size)

    def test_field_granularity(self, tmp_path):
        probe = RangeRecordingCipher()
        enc = EncryptedDirectory(MMapDirectory(str(tmp_path / "enc")), probe)
        _build(enc)
        seg_file = [n for n in enc.inner.list() if n.endswith(".seg")][0]
        r = DirectoryReader.open(enc)
        probe.decrypted.clear()
        sr = r.segments[0]
        assert sr.field("body") is not None
        body_cost = probe.decrypted.get(seg_file, 0)
        assert body_cost > 0
        # second access: memoized, no re-decrypt
        probe.decrypted.clear()
        assert sr.field("body") is not None
        assert probe.decrypted.get(seg_file, 0) == 0

    def test_non_seekable_cipher_falls_back(self, tmp_path):
        class WholeFileCipher(Cipher):
            random_access = False

            def encrypt(self, name, data):
                return bytes(b ^ 0x5A for b in data)

            decrypt = encrypt

        enc = EncryptedDirectory(
            MMapDirectory(str(tmp_path / "enc")), WholeFileCipher()
        )
        assert not enc.mapped_reads
        _build(enc, nseg_docs=50)
        r = DirectoryReader.open(enc)
        hits = HostQuery(
            F.ByTerm("body", "alpha"), list(r.segments), BM25()
        ).top_k(5)
        assert hits
