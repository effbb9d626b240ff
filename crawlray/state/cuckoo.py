"""Cuckoo filter — the approximate-membership core of the URL-seen set.

North-rule mandate: "sharded cuckoo-filter URL-seen set keyed by
canonicalized + murmur3-hashed URLs". Partial-key cuckoo hashing
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14 —
public knowledge): B power-of-two buckets × 4 slots of 16-bit
fingerprints; a key's two candidate buckets are ``i1 = h mod B`` and
``i2 = i1 XOR mix(fp)``, so either bucket is derivable from the other
plus the fingerprint (needed for eviction).

False positives are allowed for the *filter*; the parity contract is not.
``SeenSet`` therefore pairs each filter with an exact int64 hash set and
only consults it when the filter says "maybe" — the filter short-circuits
the definite-negatives (the overwhelming majority at steady state), the
exact set guarantees zero false positives and zero false negatives. At
10^10-URL scale the exact side becomes a disk-backed per-shard store;
the in-memory set is the single-node stand-in (documented trade-off).

All membership checks are numpy-vectorized over hash batches; inserts are
per-new-item (new URLs are the minority once the crawl warms up).
"""

from __future__ import annotations

import numpy as np

_FP_MIX = np.uint64(0x5BD1E995)  # odd multiplier decorrelates fp from i1


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, max_kicks: int = 500, seed: int = 42):
        # buckets = next power of two >= capacity/4 slots
        nbuckets = 1
        while nbuckets * 4 < capacity:
            nbuckets *= 2
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.buckets = np.zeros((nbuckets, 4), dtype=np.uint16)  # 0 == empty
        self.max_kicks = max_kicks
        self.n_items = 0
        self.overflow: set[int] = set()  # items that failed insertion after kicks
        self._rng_state = np.uint64(seed * 2 + 1)

    # -- derivation ------------------------------------------------------
    def _fp_i1_i2(self, h_u64: np.ndarray):
        fp = ((h_u64 >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty sentinel
        i1 = (h_u64 & self.mask).astype(np.uint64)
        i2 = (i1 ^ (fp.astype(np.uint64) * _FP_MIX)) & self.mask
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        return int((np.uint64(i) ^ (np.uint64(fp) * _FP_MIX)) & self.mask)

    # -- vectorized membership ------------------------------------------
    def contains_batch(self, h_i64: np.ndarray) -> np.ndarray:
        """Maybe-present mask for int64-reinterpreted hashes (vectorized)."""
        if len(h_i64) == 0:
            return np.zeros(0, dtype=bool)
        h = h_i64.astype(np.int64).view(np.uint64)
        fp, i1, i2 = self._fp_i1_i2(h)
        b1 = self.buckets[i1]  # (n, 4) gather
        b2 = self.buckets[i2]
        hit = (b1 == fp[:, None]).any(axis=1) | (b2 == fp[:, None]).any(axis=1)
        if self.overflow:
            miss = ~hit
            if miss.any():
                ov = np.fromiter(self.overflow, dtype=np.int64, count=len(self.overflow))
                hit[miss] |= np.isin(h_i64[miss], ov)
        return hit

    # -- insertion (pure-int hot path; numpy only for the bucket store) --
    def _next_rand(self) -> int:
        # deterministic xorshift64* — eviction choice must be reproducible
        x = int(self._rng_state)
        x ^= x >> 12
        x = (x ^ (x << 25)) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        self._rng_state = np.uint64(x)
        return ((x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) >> 60

    def add(self, h_i64: int) -> None:
        h = int(h_i64) & 0xFFFFFFFFFFFFFFFF  # reinterpret signed → unsigned
        mask = self.nbuckets - 1
        fp = (h >> 48) & 0xFFFF or 1
        i1 = h & mask
        i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
        buckets = self.buckets
        for i in (i1, i2):
            row = buckets[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    self.n_items += 1
                    return
        # evict loop; record the displacement chain so a failed insertion
        # can be rolled back — a dropped victim fingerprint would be a
        # false negative, which is a parity bug, not a perf bug.
        i = i1 if (self._next_rand() & 1) else i2
        cur = fp
        chain: list[tuple[int, int, int]] = []  # (bucket, slot, old_fp)
        for _ in range(self.max_kicks):
            slot = self._next_rand() & 3
            old = int(buckets[i, slot])
            chain.append((i, slot, old))
            buckets[i, slot] = cur
            cur = old
            i = (i ^ (cur * 0x5BD1E995)) & mask
            row = buckets[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = cur
                    self.n_items += 1
                    return
        for bi, slot, old in reversed(chain):  # roll back, keep table exact
            buckets[bi, slot] = old
        self.overflow.add(int(h_i64))
        self.n_items += 1

    def add_batch(self, h_i64: np.ndarray) -> None:
        for v in h_i64:
            self.add(int(v))

    # -- snapshot / restore (T5 seen_shards payload) ---------------------
    def dump(self) -> dict:
        return {
            "buckets": self.buckets.tobytes(),
            "nbuckets": self.nbuckets,
            "overflow": np.fromiter(self.overflow, dtype=np.int64,
                                    count=len(self.overflow)).tobytes(),
            "n_items": self.n_items,
            "rng": int(self._rng_state),
        }

    @classmethod
    def restore(cls, d: dict) -> "CuckooFilter":
        cf = cls(capacity=d["nbuckets"] * 4)
        cf.buckets = np.frombuffer(d["buckets"], dtype=np.uint16).reshape(
            d["nbuckets"], 4
        ).copy()
        cf.overflow = set(np.frombuffer(d["overflow"], dtype=np.int64).tolist())
        cf.n_items = d["n_items"]
        cf._rng_state = np.uint64(d["rng"])
        return cf


class SeenSet:
    """Cuckoo filter + exact int64 set: filter short-circuits definite
    negatives, exact set removes false positives/negatives (parity)."""

    def __init__(self, capacity: int = 1 << 16, seed: int = 42):
        self.filter = CuckooFilter(capacity=capacity, seed=seed)
        self.exact: set[int] = set()

    def contains_add_batch(self, h_i64: np.ndarray) -> np.ndarray:
        """Returns mask of NEW hashes (True = first sighting) and inserts
        them. Input must be unique within the batch (callers dedup first);
        result is then independent of call order within a wave."""
        h_i64 = np.asarray(h_i64, dtype=np.int64)
        maybe = self.filter.contains_batch(h_i64)
        new = np.ones(len(h_i64), dtype=bool)
        # definite negatives are new; "maybe" goes to the exact set
        for idx in np.where(maybe)[0]:
            new[idx] = int(h_i64[idx]) not in self.exact
        for idx in np.where(new)[0]:
            v = int(h_i64[idx])
            self.exact.add(v)
            self.filter.add(v)
        return new

    def __len__(self) -> int:
        return len(self.exact)

    def dump(self) -> dict:
        d = self.filter.dump()
        d["exact"] = np.fromiter(self.exact, dtype=np.int64, count=len(self.exact)).tobytes()
        return d

    @classmethod
    def restore(cls, d: dict) -> "SeenSet":
        s = cls.__new__(cls)
        s.filter = CuckooFilter.restore(d)
        s.exact = set(np.frombuffer(d["exact"], dtype=np.int64).tolist())
        return s
