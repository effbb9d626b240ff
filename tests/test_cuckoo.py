"""Cuckoo filter / SeenSet: zero false negatives ever, bounded FP rate,
snapshot/restore round-trip, deterministic eviction."""

import numpy as np

from crawlray.state.cuckoo import CuckooFilter, SeenSet


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_no_false_negatives():
    cf = CuckooFilter(capacity=1 << 14)
    h = np.unique(_hashes(8000, seed=1))
    cf.add_batch(h)
    assert cf.contains_batch(h).all()


def test_fp_rate_bounded():
    cf = CuckooFilter(capacity=1 << 14)
    inserted = np.unique(_hashes(8000, seed=2))
    cf.add_batch(inserted)
    probe = np.setdiff1d(np.unique(_hashes(50000, seed=3)), inserted)
    fp = cf.contains_batch(probe).mean()
    # 16-bit fingerprints, 4-slot buckets → theoretical ~ 8/2^16 ≈ 0.00012
    assert fp < 0.002, fp


def test_overflow_keeps_correctness():
    # tiny table forced far beyond capacity: overflow set must keep
    # membership exact-positive (no false negatives even when full)
    cf = CuckooFilter(capacity=64, max_kicks=30)
    h = np.unique(_hashes(800, seed=4))
    cf.add_batch(h)
    assert cf.contains_batch(h).all()


def test_snapshot_restore_roundtrip():
    cf = CuckooFilter(capacity=1 << 12)
    h = np.unique(_hashes(3000, seed=5))
    cf.add_batch(h)
    cf2 = CuckooFilter.restore(cf.dump())
    assert (cf2.contains_batch(h) == cf.contains_batch(h)).all()
    probe = _hashes(5000, seed=6)
    assert (cf2.contains_batch(probe) == cf.contains_batch(probe)).all()


def test_deterministic():
    h = np.unique(_hashes(6000, seed=7))
    a = CuckooFilter(capacity=1 << 13)   # ~73% load: evictions happen, no kick storm
    b = CuckooFilter(capacity=1 << 13)
    a.add_batch(h)
    b.add_batch(h)
    assert (a.buckets == b.buckets).all()
    assert a.overflow == b.overflow


def test_seenset_exact_semantics():
    s = SeenSet(capacity=1 << 12)
    h1 = np.unique(_hashes(2000, seed=8))
    new = s.contains_add_batch(h1)
    assert new.all()
    # re-offer: nothing is new
    again = s.contains_add_batch(h1)
    assert not again.any()
    # mixed batch
    h2 = np.unique(_hashes(1000, seed=9))
    fresh = np.setdiff1d(h2, h1)
    mixed = np.concatenate([h1[:100], fresh])
    mask = s.contains_add_batch(mixed)
    assert not mask[:100].any()
    assert mask[100:].all()
    assert len(s) == len(h1) + len(fresh)


def test_seenset_snapshot_roundtrip():
    s = SeenSet(capacity=1 << 12)
    h = np.unique(_hashes(1500, seed=10))
    s.contains_add_batch(h)
    s2 = SeenSet.restore(s.dump())
    assert len(s2) == len(s)
    assert not s2.contains_add_batch(h).any()
