"""MurmurHash3 x64 128 — the URL hash mandated by the north rule.

Two independent implementations of Austin Appleby's public-domain
MurmurHash3_x64_128 algorithm (smhasher):

- ``murmur3_x64_128(data, seed)``: scalar pure-Python reference, used by the
  sequential oracle and for test vectors.
- ``murmur3_x64_128_batch(bytes_like_array)``: numpy-vectorized over a whole
  Arrow/py list of strings at once — the hot-path kernel used inside
  ``map_batches``. Rows are processed as zero-padded 16-byte blocks; a
  zero tail is a no-op through the multiply/rotate chain, so only the
  number of *full* blocks needs masking (no per-row branching).

The two are property-tested against each other (tests/test_murmur3.py),
which pins the algorithm without the absent ``mmh3`` wheel.

``hash64`` / ``hash64_batch`` return the low 64 bits (h1) — the
``url_hash`` / ``host_hash`` key used for dedup and partitioning.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AB9738E947B1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar MurmurHash3_x64_128; returns (h1, h2) as unsigned 64-bit ints."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    h1 = h2 = seed & _MASK64
    nblocks = length // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16 :]
    # Zero-padded tail assembly: absent bytes contribute 0 and k == 0 is a
    # no-op through the mix, so no length switch is needed.
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
    k2 = (k2 * _C2) & _MASK64
    k2 = _rotl64(k2, 33)
    k2 = (k2 * _C1) & _MASK64
    h2 ^= k2
    k1 = (k1 * _C1) & _MASK64
    k1 = _rotl64(k1, 31)
    k1 = (k1 * _C2) & _MASK64
    h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def hash64(data: bytes | str, seed: int = 0) -> int:
    """Low 64 bits (h1) of murmur3_x64_128 — the url/host hash key."""
    return murmur3_x64_128(data, seed)[0]


# --------------------------------------------------------------------------
# x86_32 variant — anchored by universally published test vectors
# (tests/test_murmur3.py); validates the shared family conventions
# (LE block assembly, rotl, fmix shape, zero-padded tail, len-xor).
# --------------------------------------------------------------------------

_MASK32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = data[nblocks * 4 :]
    if tail:
        k = int.from_bytes(tail.ljust(4, b"\0"), "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


# --------------------------------------------------------------------------
# numpy-vectorized batch variant
# --------------------------------------------------------------------------

_NC1 = np.uint64(_C1)
_NC2 = np.uint64(_C2)
_N5 = np.uint64(5)
_NA1 = np.uint64(0x52DCE729)
_NA2 = np.uint64(0x38495AB5)
_NF1 = np.uint64(0xFF51AFD7ED558CCD)
_NF2 = np.uint64(0xC4CEB9FE1A85EC53)
_N33 = np.uint64(33)


def _nrotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    rc = np.uint64(64 - r)
    return (x << r_) | (x >> rc)


def _nfmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _N33)
    k = k * _NF1
    k = k ^ (k >> _N33)
    k = k * _NF2
    k = k ^ (k >> _N33)
    return k


def _padded_matrix(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, padded_width) uint8 matrix of the rows + per-row byte lengths.

    ``data`` is the concatenated value buffer, ``offsets`` the (n+1,) int
    offsets into it (Arrow string-array layout).
    """
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    # pad so every row has its full blocks plus one whole zero-padded tail block
    width = ((maxlen // 16) + 1) * 16
    idx = offsets[:-1, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = np.arange(width, dtype=np.int64)[None, :] < lengths[:, None]
    np.clip(idx, 0, max(len(data) - 1, 0), out=idx)
    if len(data) == 0:
        mat = np.zeros((n, width), dtype=np.uint8)
    else:
        mat = np.where(valid, data[idx], 0).astype(np.uint8)
    return mat, lengths


def murmur3_x64_128_batch(
    data: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3_x64_128 over n variable-length byte rows.

    Arguments are the Arrow string-array buffers: ``data`` the concatenated
    uint8 value buffer and ``offsets`` the (n+1,) offsets. Returns (h1, h2)
    uint64 arrays. All arithmetic wraps mod 2^64 via numpy uint64.
    """
    with np.errstate(over="ignore"):
        mat, lengths = _padded_matrix(data, offsets)
        n = len(lengths)
        if n == 0:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
        words = np.ascontiguousarray(mat).view("<u8")  # (n, width//8) little-endian
        nblocks = (lengths // 16).astype(np.int64)
        max_blocks = int(nblocks.max())
        h1 = np.full(n, np.uint64(seed), dtype=np.uint64)
        h2 = np.full(n, np.uint64(seed), dtype=np.uint64)
        for j in range(max_blocks):
            m = nblocks > j
            k1 = words[:, 2 * j].copy()
            k2 = words[:, 2 * j + 1].copy()
            k1 = _nrotl(k1 * _NC1, 31) * _NC2
            nh1 = h1 ^ k1
            nh1 = (_nrotl(nh1, 27) + h2) * _N5 + _NA1
            k2 = _nrotl(k2 * _NC2, 33) * _NC1
            nh2 = h2 ^ k2
            nh2 = (_nrotl(nh2, 31) + nh1) * _N5 + _NA2
            h1 = np.where(m, nh1, h1)
            h2 = np.where(m, nh2, h2)
        # tail: the zero-padded block right after each row's full blocks.
        # k == 0 rows (len % 16 == 0) are no-ops, matching the scalar path.
        rows = np.arange(n)
        t1 = words[rows, 2 * nblocks]
        t2 = words[rows, 2 * nblocks + 1]
        t2 = _nrotl(t2 * _NC2, 33) * _NC1
        h2 = h2 ^ t2
        t1 = _nrotl(t1 * _NC1, 31) * _NC2
        h1 = h1 ^ t1
        ln = lengths.astype(np.uint64)
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _nfmix(h1)
        h2 = _nfmix(h2)
        h1 = h1 + h2
        h2 = h2 + h1
        return h1, h2


def to_i64(u: int) -> int:
    """Reinterpret an unsigned 64-bit hash as signed int64 (two's
    complement). Hash COLUMNS are int64 engine-wide: Ray's aggregate /
    unique paths convert uint64 > 2^63-1 to Python ints and then fail
    Arrow conversion (observed: OverflowError fallback to pickled
    objects), and DuckDB BIGINT is signed — int64 keeps both happy."""
    return u - (1 << 64) if u >= (1 << 63) else u


def string_buffers(strings) -> tuple[np.ndarray, np.ndarray]:
    """(data, offsets) uint8/int64 view of a pyarrow StringArray /
    ChunkedArray / list of str — the Arrow value-buffer layout every
    vectorized byte-level kernel here consumes (zero-copy for Arrow
    inputs)."""
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        arr = strings
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
            off_dtype = np.int64
        else:
            off_dtype = np.int32
        if arr.null_count:
            arr = arr.fill_null("")
        bufs = arr.buffers()
        # buffers: [validity, offsets, data]
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
        offsets = offsets.astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
    else:
        enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
        lengths = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
        offsets = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        data = (
            np.frombuffer(b"".join(enc), dtype=np.uint8)
            if enc
            else np.empty(0, dtype=np.uint8)
        )
    return data, offsets


def hash64_batch(strings, seed: int = 0) -> np.ndarray:
    """Vectorized low-64-bit murmur3 over a pyarrow StringArray / ChunkedArray
    / numpy object array / list of str. Returns uint64 ndarray."""
    data, offsets = string_buffers(strings)
    h1, _ = murmur3_x64_128_batch(data, offsets, seed)
    return h1


def hash64s(data: bytes | str, seed: int = 0) -> int:
    """Scalar signed-int64 hash — the engine's hash-column value."""
    return to_i64(hash64(data, seed))


def hash64_batch_i64(strings, seed: int = 0) -> np.ndarray:
    """Batch signed-int64 hash (bit-reinterpreted uint64) — use this for
    every hash COLUMN (url_hash, host_hash, text_hash...)."""
    return hash64_batch(strings, seed).view(np.int64)
