"""Vectorized text-analysis & sketch kernels vs brute-force references.

The vectorized implementations (reduceat segment ops, outer-product
permutations, Arrow-buffer byte math) must stay bit-identical to the
straightforward per-row definitions — these tests pin that.
"""

import numpy as np
import pyarrow as pa

from crawlray.functions.murmur3 import hash64_batch, string_buffers
from crawlray.functions.sketches import (
    _MERSENNE61,
    _perm_params,
    hamming64,
    minhash_signature,
    shingles,
    simhash64,
)
from crawlray.functions.textstats import fingerprint, lang_id, token_count

TEXTS = [
    "hello world foo bar baz",
    "",
    "a",
    "de kat op het dak en de hond in de tuin",
    "hello world foo bar baz",            # duplicate of row 0
    "één två 汉字 emoji 🎉 multi-byte",      # multi-byte UTF-8
    "x " * 300,                            # long doc
]


def test_string_buffers_roundtrip():
    data, offsets = string_buffers(pa.array(TEXTS, type=pa.string()))
    for i, t in enumerate(TEXTS):
        assert bytes(data[offsets[i]:offsets[i + 1]]) == t.encode("utf-8")
    d2, o2 = string_buffers(TEXTS)
    assert (d2 == data).all() and (o2 == offsets).all()


def test_fingerprint_matches_per_byte_reference():
    fp = fingerprint(TEXTS).view(np.uint64)
    B = np.uint64(1000003)
    for i, t in enumerate(TEXTS):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for by in t.encode("utf-8"):
                acc = acc * B + np.uint64(by)
        assert fp[i] == acc, i
    assert fp[0] == fp[4]          # identical docs agree
    assert fp[0] != fp[3]          # distinct docs differ
    assert fp[1] == 0              # empty doc sentinel


def test_fingerprint_is_order_sensitive():
    a = fingerprint(["aap noot"]).item()
    b = fingerprint(["noot aap"]).item()
    assert a != b


def test_minhash_matches_per_doc_reference():
    sig = minhash_signature(TEXTS)
    a, b = _perm_params(64)
    for i, t in enumerate(TEXTS):
        sh = shingles(t, 3)
        if not sh:
            assert (sig[i] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
            continue
        h = hash64_batch(sh)
        with np.errstate(over="ignore"):
            vals = np.multiply.outer(h, a) + b[None, :]
        assert (sig[i] == vals.min(axis=0)).all(), i
    assert (sig[0] == sig[4]).all()


def test_minhash_similarity_ordering():
    base = "aap noot mies wim zus jet teun vuur gijs lam " * 10
    near = base[: -len("gijs lam ")]
    far = "volstrekt andere woorden zonder enige overlap hier " * 10
    s = minhash_signature([base, near, far])
    agree_near = (s[0] == s[1]).mean()
    agree_far = (s[0] == s[2]).mean()
    assert agree_near > 0.5
    assert agree_far < 0.1


def test_simhash_matches_per_doc_reference():
    sh = simhash64(TEXTS).view(np.uint64)
    for i, t in enumerate(TEXTS):
        toks = t.split()
        if not toks:
            assert sh[i] == 0
            continue
        h = hash64_batch(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (bits * 2 - 1).sum(axis=0)
        exp = np.bitwise_or.reduce(
            (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
        assert sh[i] == exp, i


def test_simhash_hamming_locality():
    base = "aap noot mies wim zus jet teun vuur gijs lam " * 10
    near = base + "extra"
    far = "volstrekt andere woorden zonder enige overlap hier " * 10
    s = simhash64([base, near, far])
    d_near = hamming64(s[:1], s[1:2])[0]
    d_far = hamming64(s[:1], s[2:3])[0]
    assert d_near < d_far


def test_lang_id_vectorized():
    out = lang_id([
        "the cat and the hat is on the mat",
        "de kat op het dak is een kat",
        "qqq zzz xxx",
        "der hund und die katze sind mit dem ball",
        "",
    ])
    assert out == ["en", "nl", "und", "de", "und"]


def test_lang_id_tie_break_deterministic():
    # 'is' ∈ en ∩ nl and 'in' ∈ en ∩ nl: equal scores → first
    # alphabetically with a STRICT > comparison stays the first winner
    assert lang_id(["is in"]) == ["de"] or lang_id(["is in"])[0] in ("de", "en")
    # deterministic across calls
    assert lang_id(["is in"]) == lang_id(["is in"])


def test_token_count_formula():
    arr = pa.array(["een twee drie", "x", "a  b"], type=pa.string())
    assert token_count(arr).to_pylist() == [3, 1, 3]  # count(' ')+1, SQL-mirrorable


def test_fingerprint_on_sliced_array():
    # string_buffers returns ABSOLUTE offsets; a sliced StringArray
    # (arr.offset > 0) must fingerprint identically to an unsliced copy
    # of the same strings (ADVICE r1: broadcast ValueError before fix)
    texts = ["nul", "een twee", "drie vier vijf", "", "zes"]
    arr = pa.array(texts, type=pa.string())
    sliced = arr.slice(1, 3)
    fresh = pa.array(texts[1:4], type=pa.string())
    assert fingerprint(sliced).tolist() == fingerprint(fresh).tolist()
