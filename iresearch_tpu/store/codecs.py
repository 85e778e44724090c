"""Pluggable compression + encryption (reference: core/utils/compression
.hpp:80-117 registry with none/lz4 codecs; core/utils/encryption.hpp:56-116
cipher wrapper over streams).

Compression is a named-codec registry applied to columnstore payloads
(the reference compresses stored values, not postings). Encryption is a
block-free byte-transform cipher applied at the directory boundary so every
index artifact on disk is encrypted — the whole-blob analog of the
reference's encrypted_output/input streams. Ships `none`, `zlib`, real
`lz4` (system liblz4 via ctypes, matching the reference's codec); for
ciphers AES-128/256-CTR (system libcrypto via ctypes, the reference's
ctr_encryption), a dependency-free keyed XOR-CTR, and the reference test
suite's rot13.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
import struct
import zlib
from typing import Callable, Dict, List, Optional

from iresearch_tpu.store.directory import Directory, IndexLock

# --- compression ---------------------------------------------------------


class Compressor:
    name = "none"

    def compress(self, data: bytes) -> bytes:
        return data

    def decompress(self, data: bytes) -> bytes:
        return data


class ZlibCompressor(Compressor):
    name = "zlib"

    def __init__(self, level: int = 6) -> None:
        self.level = level

    def compress(self, data: bytes) -> bytes:
        return zlib.compress(data, self.level)

    def decompress(self, data: bytes) -> bytes:
        return zlib.decompress(data)


def _load_lz4():
    path = ctypes.util.find_library("lz4")
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.LZ4_compressBound.restype = ctypes.c_int
        lib.LZ4_compressBound.argtypes = [ctypes.c_int]
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_compress_default.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
        ]
        lib.LZ4_decompress_safe.restype = ctypes.c_int
        lib.LZ4_decompress_safe.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
        ]
        return lib
    except OSError:
        return None


_LZ4 = _load_lz4()


class Lz4Compressor(Compressor):
    """Real LZ4 block codec via the system liblz4 (the reference's codec,
    core/utils/lz4compression.cpp). Frames blobs with a u32 original-size
    prefix, like the reference's size-prefixed compressed blocks."""

    name = "lz4"

    def __init__(self) -> None:
        if _LZ4 is None:
            raise RuntimeError(
                "liblz4 not found; use the 'zlib' or 'none' codec instead"
            )

    def compress(self, data: bytes) -> bytes:
        n = len(data)
        bound = _LZ4.LZ4_compressBound(n)
        out = ctypes.create_string_buffer(bound)
        written = _LZ4.LZ4_compress_default(data, out, n, bound)
        if written <= 0:
            raise RuntimeError("LZ4_compress_default failed")
        return struct.pack("<I", n) + out.raw[:written]

    def decompress(self, data: bytes) -> bytes:
        (n,) = struct.unpack_from("<I", data)
        out = ctypes.create_string_buffer(n)
        got = _LZ4.LZ4_decompress_safe(data[4:], out, len(data) - 4, n)
        if got != n:
            raise RuntimeError(f"LZ4_decompress_safe returned {got}, want {n}")
        return out.raw


def _varint_encode_u64(vals) -> bytes:
    """Vectorized LEB128 of a u64 array (reference: vwrite<uint64_t>,
    store_utils.hpp bytes_io)."""
    import numpy as np

    v = np.ascontiguousarray(vals, np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # 7-bit group count per value: 1 + #{k >= 1 : v >= 2^(7k)}
    nb = np.ones(n, np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    starts = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), np.uint8)
    for j in range(10):
        sel = nb > j
        if not sel.any():
            break
        byte = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[starts[sel] + j] = byte.astype(np.uint8) | cont
    return out.tobytes()


def _varint_decode_u64(data: bytes):
    """Inverse of _varint_encode_u64 (whole-buffer vectorized decode)."""
    import numpy as np

    b = np.frombuffer(data, np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.uint64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.concatenate([[0], ends[:-1] + 1])
    vals = np.zeros(len(ends), np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for j in range(maxlen):
        sel = starts + j <= ends
        vals[sel] |= (
            b[starts[sel] + j].astype(np.uint64) & np.uint64(0x7F)
        ) << np.uint64(7 * j)
    return vals


class DeltaCompressor(Compressor):
    """Delta + zig-zag varint codec for u64-aligned payloads (reference:
    delta_compression.cpp — delta::encode over the u64 view, then
    zig_zag_encode64 + vwrite per value). Payloads whose size is not a
    multiple of 8 are framed raw (flag byte 0) so the codec is total."""

    name = "delta"

    def compress(self, data: bytes) -> bytes:
        import numpy as np

        if len(data) % 8:
            return b"\x00" + data
        v = np.frombuffer(data, np.uint64)
        d = np.diff(v, prepend=np.uint64(0)).view(np.int64)
        zz = ((d << 1) ^ (d >> 63)).view(np.uint64)
        return b"\x01" + struct.pack("<I", len(v)) + _varint_encode_u64(zz)

    def decompress(self, data: bytes) -> bytes:
        import numpy as np

        if data[:1] == b"\x00":
            return data[1:]
        (n,) = struct.unpack_from("<I", data, 1)
        zz = _varint_decode_u64(data[5:])
        if len(zz) != n:
            raise ValueError(f"delta codec: {len(zz)} values, want {n}")
        # unsigned zig-zag decode: logical shift + all-ones mask on odd
        with np.errstate(over="ignore"):
            d = (zz >> np.uint64(1)) ^ (
                np.uint64(0) - (zz & np.uint64(1))
            )
            return np.cumsum(d, dtype=np.uint64).tobytes()


class Lz4DictCompressor(Compressor):
    """LZ4 with a carried dictionary across column blocks (reference:
    streaming/dict lz4, lz4compression.hpp:47-71 LZ4_stream /
    LZ4_streamDecode). Block 0 of a column compresses standalone and
    doubles as the dictionary (last <=64 KB) for every later block —
    point reads stay lazy: any block needs at most block 0 extra."""

    name = "lz4dict"
    dict_blocks = True

    def __init__(self) -> None:
        if _LZ4 is None:
            raise RuntimeError(
                "liblz4 not found; use the 'zlib' or 'none' codec instead"
            )
        _LZ4.LZ4_createStream.restype = ctypes.c_void_p
        _LZ4.LZ4_freeStream.argtypes = [ctypes.c_void_p]
        _LZ4.LZ4_loadDict.restype = ctypes.c_int
        _LZ4.LZ4_loadDict.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
        ]
        _LZ4.LZ4_compress_fast_continue.restype = ctypes.c_int
        _LZ4.LZ4_compress_fast_continue.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _LZ4.LZ4_decompress_safe_usingDict.restype = ctypes.c_int
        _LZ4.LZ4_decompress_safe_usingDict.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        self._plain = Lz4Compressor()

    def compress(self, data: bytes) -> bytes:
        return self._plain.compress(data)

    def decompress(self, data: bytes) -> bytes:
        return self._plain.decompress(data)

    def compress_with_dict(self, data: bytes, dict_: bytes) -> bytes:
        dict_ = dict_[-65536:]  # LZ4 dictionary window
        n = len(data)
        bound = _LZ4.LZ4_compressBound(n)
        out = ctypes.create_string_buffer(bound)
        stream = _LZ4.LZ4_createStream()
        try:
            _LZ4.LZ4_loadDict(stream, dict_, len(dict_))
            written = _LZ4.LZ4_compress_fast_continue(
                stream, data, out, n, bound, 1
            )
        finally:
            _LZ4.LZ4_freeStream(stream)
        if written <= 0:
            raise RuntimeError("LZ4_compress_fast_continue failed")
        return struct.pack("<I", n) + out.raw[:written]

    def decompress_with_dict(self, data: bytes, dict_: bytes) -> bytes:
        dict_ = dict_[-65536:]
        (n,) = struct.unpack_from("<I", data)
        out = ctypes.create_string_buffer(n)
        got = _LZ4.LZ4_decompress_safe_usingDict(
            data[4:], out, len(data) - 4, n, dict_, len(dict_)
        )
        if got != n:
            raise RuntimeError(
                f"LZ4_decompress_safe_usingDict returned {got}, want {n}"
            )
        return out.raw


_COMPRESSORS: Dict[str, Callable[[dict], Compressor]] = {
    "none": lambda a: Compressor(),
    "zlib": lambda a: ZlibCompressor(level=int(a.get("level", 6))),
    "lz4": lambda a: Lz4Compressor(),
    "lz4dict": lambda a: Lz4DictCompressor(),
    "delta": lambda a: DeltaCompressor(),
}


def get_compressor(name: str, args: Optional[dict] = None) -> Compressor:
    """Named codec registry (reference: compression.cpp registry)."""
    if name not in _COMPRESSORS:
        raise KeyError(f"unknown compression: {name!r}")
    return _COMPRESSORS[name](args or {})


def register_compressor(name: str, factory: Callable[[dict], Compressor]) -> None:
    _COMPRESSORS[name] = factory


# --- encryption ----------------------------------------------------------


class Cipher:
    """Stateless byte-transform cipher (reference: ctr_encryption,
    core/utils/encryption.hpp:56-116).

    ``random_access=True`` ciphers additionally implement ``decrypt_at``:
    decrypting a byte range given its position in the file's ciphertext
    stream, WITHOUT touching the rest of the file — the property that
    keeps mmap lazy opens and v6 lazy column blocks alive under
    encryption (the reference's block-cipher stream wrapping)."""

    random_access = False

    def encrypt(self, name: str, data: bytes) -> bytes:
        raise NotImplementedError

    def decrypt(self, name: str, data: bytes) -> bytes:
        raise NotImplementedError

    def decrypt_at(self, name: str, data: bytes, offset: int) -> bytes:
        """Decrypt ``data`` that was read from byte position ``offset`` of
        the encrypted file ``name``."""
        raise NotImplementedError(f"{type(self).__name__} is not seekable")


class Rot13Cipher(Cipher):
    """The reference test suite's rot13 stand-in (tests_param.hpp:106-199).
    Byte-wise, so trivially position-independent."""

    random_access = True

    def encrypt(self, name: str, data: bytes) -> bytes:
        return bytes((b + 13) & 0xFF for b in data)

    def decrypt(self, name: str, data: bytes) -> bytes:
        return bytes((b - 13) & 0xFF for b in data)

    def decrypt_at(self, name: str, data: bytes, offset: int) -> bytes:
        return self.decrypt(name, data)


class XorCtrCipher(Cipher):
    """Keyed XOR keystream derived per (file, counter) via sha256 — the
    structural twin of AES-CTR without a crypto dependency; swap in a real
    block cipher by subclassing Cipher."""

    random_access = True
    _BLK = 32  # sha256 digest size = keystream block

    def __init__(self, key: bytes) -> None:
        self.key = key

    def _stream(self, name: str, n: int, offset: int = 0) -> bytes:
        """Keystream bytes [offset, offset+n) of file ``name``."""
        out = bytearray()
        counter = offset // self._BLK
        skip = offset % self._BLK
        seed = hashlib.sha256(self.key + name.encode()).digest()
        while len(out) < n + skip:
            out += hashlib.sha256(seed + struct.pack("<Q", counter)).digest()
            counter += 1
        return bytes(out[skip : skip + n])

    @staticmethod
    def _xor(data: bytes, ks: bytes) -> bytes:
        import numpy as np

        a = np.frombuffer(data, np.uint8)
        b = np.frombuffer(ks, np.uint8)
        return np.bitwise_xor(a, b).tobytes()

    def encrypt(self, name: str, data: bytes) -> bytes:
        return self._xor(data, self._stream(name, len(data)))

    decrypt = encrypt

    def decrypt_at(self, name: str, data: bytes, offset: int) -> bytes:
        return self._xor(data, self._stream(name, len(data), offset))


def _load_crypto():
    path = ctypes.util.find_library("crypto")
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for name in ("EVP_aes_128_ctr", "EVP_aes_256_ctr"):
            getattr(lib, name).restype = ctypes.c_void_p
        lib.EVP_EncryptInit_ex.restype = ctypes.c_int
        lib.EVP_EncryptInit_ex.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.EVP_EncryptUpdate.restype = ctypes.c_int
        lib.EVP_EncryptUpdate.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p, ctypes.c_int,
        ]
        return lib
    except (OSError, AttributeError):
        return None


_CRYPTO = _load_crypto()


class AesCtrCipher(Cipher):
    """AES-CTR via the system libcrypto (OpenSSL EVP) — the real analog of
    the reference's ctr_encryption (core/utils/encryption.hpp:56-116).

    The 16-byte IV is derived per file name (sha256 of key||name), so the
    keystream differs per file and random-access decrypt stays possible;
    CTR encryption and decryption are the same transform.
    """

    def __init__(self, key: bytes) -> None:
        if _CRYPTO is None:
            raise RuntimeError(
                "libcrypto not found; use XorCtrCipher instead"
            )
        key = hashlib.sha256(key).digest() if len(key) not in (16, 32) else key
        self.key = key
        self._evp = (
            _CRYPTO.EVP_aes_128_ctr() if len(key) == 16
            else _CRYPTO.EVP_aes_256_ctr()
        )

    def _xform(self, name: str, data: bytes) -> bytes:
        iv = hashlib.sha256(self.key + name.encode()).digest()[:16]
        return self._xform_iv(iv, data)

    def _xform_iv(self, iv: bytes, data: bytes) -> bytes:
        ctx = _CRYPTO.EVP_CIPHER_CTX_new()
        try:
            if _CRYPTO.EVP_EncryptInit_ex(ctx, self._evp, None, self.key, iv) != 1:
                raise RuntimeError("EVP_EncryptInit_ex failed")
            out = ctypes.create_string_buffer(len(data) + 16)
            outl = ctypes.c_int(0)
            if _CRYPTO.EVP_EncryptUpdate(ctx, out, ctypes.byref(outl), data, len(data)) != 1:
                raise RuntimeError("EVP_EncryptUpdate failed")
            return out.raw[: outl.value]
        finally:
            _CRYPTO.EVP_CIPHER_CTX_free(ctx)

    def encrypt(self, name: str, data: bytes) -> bytes:
        return self._xform(name, data)

    decrypt = encrypt

    random_access = True

    def decrypt_at(self, name: str, data: bytes, offset: int) -> bytes:
        # CTR counter = 128-bit big-endian IV incremented per 16-byte
        # block: advance it by offset//16, then drop the first offset%16
        # keystream bytes by transforming a zero-padded prefix (CTR is an
        # XOR, so zeros pass the keystream through onto the pad).
        iv = hashlib.sha256(self.key + name.encode()).digest()[:16]
        blocks, skip = divmod(offset, 16)
        if blocks:
            c = (int.from_bytes(iv, "big") + blocks) % (1 << 128)
            iv = c.to_bytes(16, "big")
        out = self._xform_iv(iv, b"\x00" * skip + data)
        return out[skip:]


class LazyDecryptBuffer:
    """Sliceable view over an encrypted mapped buffer that decrypts ONLY
    the requested byte ranges (reference: encrypted_input over a block
    cipher, encryption.hpp:116 — random-access reads stay lazy).

    Supports ``len``, slice/int ``[]`` (returns plaintext bytes/int) and
    ``tobytes``. Consumers that page lazily through an mmap (blobpack
    arrays, v6 column blocks) keep that laziness: a slice faults in and
    decrypts just its own pages.
    """

    lazy_decrypt = True

    def __init__(self, inner, cipher: Cipher, name: str) -> None:
        self._inner = inner
        self._cipher = cipher
        self._name = name

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, key):
        n = len(self._inner)
        if isinstance(key, slice):
            start, stop, step = key.indices(n)
            if step != 1:
                raise ValueError("lazy decrypt views are contiguous only")
            raw = bytes(self._inner[start:stop])
            return self._cipher.decrypt_at(self._name, raw, start)
        i = key + n if key < 0 else key
        return self._cipher.decrypt_at(self._name, bytes(self._inner[i : i + 1]), i)[0]

    def tobytes(self) -> bytes:
        return self[0 : len(self)]


class EncryptedDirectory(Directory):
    """Encrypts every file with the attached cipher (reference: directory
    encryption attribute, directory_attributes).

    With a random-access (CTR-family) cipher over a mapped inner store,
    ``read_mapped`` returns a LazyDecryptBuffer, so encrypted segment
    opens fault in + decrypt only the blocks actually touched (the
    reference's stream-granular encryption, encryption.hpp:56-116)."""

    def __init__(self, inner: Directory, cipher: Cipher) -> None:
        self.inner = inner
        self.cipher = cipher

    @property
    def mapped_reads(self) -> bool:
        return self.inner.mapped_reads and self.cipher.random_access

    def read_mapped(self, name: str):
        if self.mapped_reads:
            return LazyDecryptBuffer(
                self.inner.read_mapped(name), self.cipher, name
            )
        return self.read(name)

    def write(self, name: str, data: bytes) -> None:
        self.inner.write(name, self.cipher.encrypt(name, data))

    def read(self, name: str) -> bytes:
        return self.cipher.decrypt(name, self.inner.read(name))

    def exists(self, name: str) -> bool:
        return self.inner.exists(name)

    def list(self) -> List[str]:
        return self.inner.list()

    def remove(self, name: str) -> bool:
        return self.inner.remove(name)

    def rename(self, src: str, dst: str) -> None:
        # note: keystreams are keyed by file name; the manifest rename pair
        # must therefore re-encrypt under the destination name
        data = self.read(src)
        self.inner.write(dst, self.cipher.encrypt(dst, data))
        self.inner.sync([dst])
        self.inner.remove(src)

    def sync(self, names) -> None:
        self.inner.sync(names)

    def try_lock(self, name: str = "write.lock") -> Optional[IndexLock]:
        return self.inner.try_lock(name)

    def length(self, name: str) -> int:
        return self.inner.length(name)


class AsyncDirectory(Directory):
    """Write-behind directory: writes are queued to a background worker
    and made durable (or their errors surfaced) at sync() — the io_uring
    AsyncDirectory analog (reference: core/store/async_directory.hpp:47).
    Reads see queued writes immediately."""

    def __init__(self, inner: Directory) -> None:
        import queue
        import threading

        self.inner = inner
        self._pending: dict = {}
        self._q: "queue.Queue" = queue.Queue()
        self._errors: list = []
        self._mutex = threading.Lock()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()

    def _drain(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            name, data = item
            try:
                self.inner.write(name, data)
            except Exception as e:  # surfaced at the next sync()
                self._errors.append(e)
            finally:
                with self._mutex:
                    if self._pending.get(name) is data:
                        del self._pending[name]
                self._q.task_done()

    def write(self, name: str, data: bytes) -> None:
        with self._mutex:
            self._pending[name] = data
        self._q.put((name, data))

    def read(self, name: str) -> bytes:
        with self._mutex:
            data = self._pending.get(name)
        if data is not None:
            return data
        return self.inner.read(name)

    def exists(self, name: str) -> bool:
        with self._mutex:
            if name in self._pending:
                return True
        return self.inner.exists(name)

    def list(self) -> List[str]:
        with self._mutex:
            pending = list(self._pending)
        return sorted(set(self.inner.list()) | set(pending))

    def remove(self, name: str) -> bool:
        self._q.join()
        return self.inner.remove(name)

    def rename(self, src: str, dst: str) -> None:
        self._q.join()  # the commit rename must see durable sources
        self.inner.rename(src, dst)

    def sync(self, names) -> None:
        self._q.join()
        if self._errors:
            err = self._errors[:]
            self._errors.clear()
            raise OSError(f"async writes failed: {err}")
        self.inner.sync(names)

    def try_lock(self, name: str = "write.lock") -> Optional[IndexLock]:
        return self.inner.try_lock(name)

    def length(self, name: str) -> int:
        with self._mutex:
            data = self._pending.get(name)
        if data is not None:
            return len(data)
        return self.inner.length(name)

    def close(self) -> None:
        self._q.put(None)
        self._worker.join()


class CachingDirectory(Directory):
    """Bounded whole-blob read cache (reference: caching_directory.hpp:36-114
    caches file handles/mmaps; blobs here)."""

    def __init__(self, inner: Directory, max_bytes: int = 256 << 20) -> None:
        self.inner = inner
        self.max_bytes = max_bytes
        self._cache: Dict[str, bytes] = {}
        self._bytes = 0

    def _evict(self) -> None:
        while self._bytes > self.max_bytes and self._cache:
            name, data = next(iter(self._cache.items()))
            del self._cache[name]
            self._bytes -= len(data)

    def write(self, name: str, data: bytes) -> None:
        self._cache.pop(name, None)
        self.inner.write(name, data)

    def read(self, name: str) -> bytes:
        data = self._cache.get(name)
        if data is None:
            data = self.inner.read(name)
            if len(data) <= self.max_bytes:
                self._cache[name] = data
                self._bytes += len(data)
                self._evict()
        return data

    def exists(self, name: str) -> bool:
        return name in self._cache or self.inner.exists(name)

    def list(self) -> List[str]:
        return self.inner.list()

    def remove(self, name: str) -> bool:
        data = self._cache.pop(name, None)
        if data is not None:
            self._bytes -= len(data)
        return self.inner.remove(name)

    def rename(self, src: str, dst: str) -> None:
        data = self._cache.pop(src, None)
        if data is not None:
            self._bytes -= len(data)
        self.inner.rename(src, dst)

    def sync(self, names) -> None:
        self.inner.sync(names)

    def try_lock(self, name: str = "write.lock") -> Optional[IndexLock]:
        return self.inner.try_lock(name)

    def length(self, name: str) -> int:
        data = self._cache.get(name)
        if data is not None:
            return len(data)
        return self.inner.length(name)
