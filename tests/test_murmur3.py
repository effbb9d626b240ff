"""murmur3 kernels: published x86_32 vectors pin the family conventions;
scalar vs numpy-vectorized x64_128 cross-validation pins the hot path;
self-derived x64_128 digests guard against regression."""

import random

import numpy as np
import pyarrow as pa
import pytest

from crawlray.functions.murmur3 import (
    hash64,
    hash64_batch,
    murmur3_x64_128,
    murmur3_x86_32,
)

# Published MurmurHash3_x86_32 verification vectors (smhasher / RFC-style
# test suites; public knowledge).
X86_32_VECTORS = [
    (b"", 0x00000000, 0x00000000),
    (b"", 0x00000001, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"\xff\xff\xff\xff", 0x00000000, 0x76293B50),
    (b"\x21\x43\x65\x87", 0x00000000, 0xF55B516B),
    (b"\x21\x43\x65\x87", 0x5082EDEE, 0x2362F9DE),
    (b"\x21\x43\x65", 0x00000000, 0x7E4A8634),
    (b"\x21\x43", 0x00000000, 0xA0F7B07A),
    (b"\x21", 0x00000000, 0x72661CF4),
    (b"\x00\x00\x00\x00", 0x00000000, 0x2362F9DE),
    (b"\x00\x00\x00", 0x00000000, 0x85F0B427),
    (b"\x00\x00", 0x00000000, 0x30F4C306),
    (b"\x00", 0x00000000, 0x514E28B7),
]


@pytest.mark.parametrize("data,seed,want", X86_32_VECTORS)
def test_x86_32_published_vectors(data, seed, want):
    assert murmur3_x86_32(data, seed) == want


# x64_128 regression digests — derived from this implementation after the
# x86_32 family validation; guard against accidental change.
X64_128_REGRESSION = [
    (b"", (0x0, 0x0)),
    (
        b"The quick brown fox jumps over the lazy dog",
        (0x3FD1043189A34199, 0x9559DC7650D99CB7),
    ),
    (b"foo", (4448056575674417598, 10437204649945349778)),
]


@pytest.mark.parametrize("data,want", X64_128_REGRESSION)
def test_x64_128_regression(data, want):
    assert murmur3_x64_128(data) == want


def test_scalar_vs_vectorized_property():
    rng = random.Random(1234)
    strs = [
        "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(rng.randrange(0, 120)))
        for _ in range(400)
    ]
    strs += ["", "a" * 15, "b" * 16, "c" * 17, "d" * 31, "e" * 32, "f" * 33]
    for arr_type in (pa.string(), pa.large_string()):
        arr = pa.array(strs, type=arr_type)
        vec = hash64_batch(arr)
        sca = np.array([hash64(s) for s in strs], dtype=np.uint64)
        assert (vec == sca).all()


def test_batch_accepts_plain_lists_and_chunked():
    strs = ["x", "yy", "zzz"]
    want = np.array([hash64(s) for s in strs], dtype=np.uint64)
    assert (hash64_batch(strs) == want).all()
    chunked = pa.chunked_array([pa.array(strs)])
    assert (hash64_batch(chunked) == want).all()


def test_sliced_array_offsets():
    arr = pa.array(["aaa", "bbb", "ccc", "ddd"]).slice(1, 2)
    want = np.array([hash64("bbb"), hash64("ccc")], dtype=np.uint64)
    assert (hash64_batch(arr) == want).all()


def test_empty_batch():
    assert len(hash64_batch(pa.array([], type=pa.string()))) == 0
