"""Hypothesis property tests over the pure (Ray-free) kernels — the
parity-critical functions whose edge cases golden tables can't
enumerate: URL canonicalization idempotence, murmur3 scalar≡batch on
arbitrary byte content, cuckoo-filter zero-false-negatives under
arbitrary insert sequences, and the fuzzy-join radius-1 verifier vs a
DP edit-distance oracle. No Ray session needed.
"""

from __future__ import annotations

import functools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlray.functions.canon import canonicalize
from crawlray.functions.murmur3 import hash64, hash64_batch_i64, to_i64
from crawlray.pipelines.dataops import _ed_le1
from crawlray.state.cuckoo import CuckooFilter

# URL-ish strings: schemes × messy authority/path/query/fragment parts
_url_part = st.text(
    alphabet="abcxyz019-._~%/?&=#:@ []" + "éü",
    min_size=0, max_size=30)


@settings(max_examples=300, deadline=None)
@given(scheme=st.sampled_from(["http", "https", "HTTP", "hTtPs"]),
       host=st.text(alphabet="abcz019.-", min_size=1, max_size=20),
       rest=_url_part)
def test_canonicalize_idempotent(scheme, host, rest):
    """c(c(u)) == c(u) for every URL the canonicalizer accepts — the
    property the seen-set's exactly-once guarantee rests on (a
    non-idempotent canonicalizer would re-admit its own output)."""
    c = canonicalize(f"{scheme}://{host}/{rest}")
    if c is not None:
        assert canonicalize(c) == c


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=64), min_size=1, max_size=20))
def test_murmur3_batch_equals_scalar(strings):
    """The numpy-vectorized batch murmur3 must agree with the scalar
    reference implementation on ARBITRARY unicode content (goldens pin
    published vectors; this pins the padding/tail paths)."""
    batch = hash64_batch_i64(strings)
    for s, got in zip(strings, batch):
        assert int(got) == to_i64(hash64(s))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=300))
def test_cuckoo_zero_false_negatives(hashes):
    """Every inserted hash must be reported present — a false negative
    in the seen set is a parity bug (a URL crawled twice), not a perf
    bug. Duplicates and adversarial bit patterns included."""
    h = np.array(hashes, dtype=np.int64)
    cf = CuckooFilter(capacity=max(1 << 10, 4 * len(h)))
    cf.add_batch(h)
    assert cf.contains_batch(h).all()


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="abc", min_size=0, max_size=8),
       st.text(alphabet="abc", min_size=0, max_size=8))
def test_ed_le1_matches_dp(a, b):
    """The fuzzy join's O(n) radius-1 verifier ≡ full DP edit distance
    restricted to the ≤1 question, on arbitrary string pairs."""
    @functools.lru_cache(None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    assert _ed_le1(a, b) == (d(len(a), len(b)) <= 1)


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=6),
             min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=6))
def test_simhash64_matches_naive(texts):
    """The chunked/unpackbits-vectorized simhash64 ≡ the textbook
    per-document bit-vote loop on arbitrary token streams (pins the
    r3 kernel rewrite beyond the fixed-corpus equality test)."""
    from crawlray.functions.sketches import simhash64

    got = simhash64(texts).view(np.uint64)
    for t, g in zip(texts, got):
        toks = t.split()
        want = 0
        if toks:
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = np.uint64(to_i64(hash64(tok)) & 0xFFFFFFFFFFFFFFFF)
                for b in range(64):
                    votes[b] += 1 if (int(h) >> b) & 1 else -1
            for b in range(64):
                if votes[b] > 0:
                    want |= 1 << b
        assert int(g) == want, (t, int(g), want)


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="abc", min_size=0, max_size=8),
       st.text(alphabet="abc", min_size=0, max_size=8),
       st.integers(min_value=1, max_value=3))
def test_ed_banded_matches_dp(a, b, k):
    """The radius-2 fuzzy join's banded Levenshtein ≡ full DP restricted
    to the ≤k question, for k ∈ {1,2,3} on arbitrary string pairs."""
    from crawlray.pipelines.dataops import _ed_banded

    @functools.lru_cache(None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    assert _ed_banded(a, b, k) == (d(len(a), len(b)) <= k)


@settings(max_examples=250, deadline=None)
@given(st.text(alphabet="abcd", min_size=0, max_size=8),
       st.text(alphabet="abcd", min_size=0, max_size=8))
def test_delk_neighborhoods_complete_radius2(a, b):
    """FastSS completeness at radius 2: whenever ed(a,b) ≤ 2 the two
    deletion-≤2 neighborhoods intersect — so the fuzzy_join2 candidate
    generation can never miss a true match (false candidates are fine;
    the banded verifier removes them)."""
    from crawlray.pipelines.dataops import _delk_variants, _ed_banded

    if _ed_banded(a, b, 2):
        na, _ = _delk_variants([a], radius=2)
        nb, _ = _delk_variants([b], radius=2)
        assert set(na) & set(nb), (a, b)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.frozensets(st.integers(min_value=0, max_value=40),
                              min_size=1, max_size=25),
                min_size=2, max_size=8))
def test_prefix_filter_completeness(sets):
    """The AllPairs prefix-filter theorem set_sim_join rests on: with
    tokens in ANY fixed total order, any pair with Jaccard ≥ τ must
    share a token within each side's first |x| − ⌈τ·|x|⌉ + 1 ordered
    tokens. Exercised over random set families with the integer-exact
    prefix length the engine uses (τ = 4/5)."""
    tau_n, tau_d = 4, 5
    order = sorted({t for s in sets for t in s})
    rank = {t: i for i, t in enumerate(order)}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            union = len(a | b)
            if inter * tau_d < union * tau_n:
                continue  # below threshold — the theorem says nothing
            pa_ = sorted(a, key=rank.get)
            pb = sorted(b, key=rank.get)
            npa = len(a) - (-(-tau_n * len(a) // tau_d)) + 1
            npb = len(b) - (-(-tau_n * len(b) // tau_d)) + 1
            assert set(pa_[:npa]) & set(pb[:npb]), (a, b)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=-100, max_value=100),
                min_size=1, max_size=60))
def test_percentile_disc_index_matches_duckdb(vals):
    """group_quantiles' integer-exact rank index ⌈q·n⌉ ≡ DuckDB's
    PERCENTILE_DISC on arbitrary integer multisets for q ∈ {¼, ½}."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [vals])
    want = con.execute(
        "SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY v), "
        "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) FROM t"
    ).fetchone()
    srt = sorted(vals)
    n = len(vals)
    got = (srt[max(0, -(-n // 4) - 1)], srt[max(0, -(-n // 2) - 1)])
    assert got == want, (vals, got, want)


# ---------------------------------------------------------------------
# winnowing guarantee (Schleimer et al. 2003, Theorem 1): any substring
# match of length >= k + w - 1 = 11 chars shares >= 1 fingerprint
# ---------------------------------------------------------------------

_winnow_text = st.text(alphabet="abcdefgh ", min_size=0, max_size=80)
_shared = st.text(alphabet="abcdefgh ", min_size=11, max_size=30)


@settings(max_examples=150, deadline=None)
@given(pre_a=_winnow_text, post_a=_winnow_text,
       pre_b=_winnow_text, post_b=_winnow_text, shared=_shared)
def test_winnowing_guarantee(pre_a, post_a, pre_b, post_b, shared):
    from crawlray.pipelines.dataops import _winnow_fps

    a = (pre_a + shared + post_a)[:200]
    b = (pre_b + shared + post_b)[:200]
    # the shared run must survive the 200-char prefix truncation whole
    if not (shared in a and shared in b):
        return
    fa = set(_winnow_fps(a).tolist())
    fb = set(_winnow_fps(b).tolist())
    assert fa & fb, "shared >=11-char substring must share a fingerprint"


@settings(max_examples=100, deadline=None)
@given(t=_winnow_text)
def test_winnowing_short_texts_safe(t):
    """Texts below k + w - 1 chars produce no full window and no crash."""
    from crawlray.pipelines.dataops import _winnow_fps

    fps = _winnow_fps(t[:10])
    assert len(fps) == 0
