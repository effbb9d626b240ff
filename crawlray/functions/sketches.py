"""Mergeable sketches for dedup / approx-distinct at scale (SURVEY §2.7
D6 / G6 + the training-data ops the engine adds beyond the reference):

- MinHash (word-shingle) signatures + LSH banding — near-dup candidates
  via a single ``groupby(band_id, band_hash)`` shuffle.
- SimHash 64-bit — near-dup fingerprints with hamming-ball lookup.
- HyperLogLog (p-bit registers) — approximate distinct counts, mergeable
  per block then combined (the partial→final aggregation pattern).

All numpy-vectorized per batch; hashing derives from murmur3 constants so
results are deterministic and platform-independent.
"""

from __future__ import annotations

import numpy as np

from .murmur3 import hash64_batch

_MERSENNE61 = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42):
    """Deterministic (a, b) pairs for wrapping multiply-shift mixing
    (a forced odd → bijective over Z/2^64). MinHash needs a family of
    deterministic pseudo-permutations, not true universal hashes; the
    wrapping form avoids 64-bit modulo, which has no SIMD path and
    dominates signature cost at corpus scale."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, size=n_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)
    b = rng.integers(0, _MERSENNE61, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles (k consecutive tokens joined)."""
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature(texts: list[str], n_perm: int = 64, k: int = 3,
                      seed: int = 42) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signatures, batch-vectorized: one
    murmur3 pass over all shingles, then wrapping (a*h+b) minimized per
    doc per permutation (empty doc → all-ones sentinel)."""
    a, b = _perm_params(n_perm, seed)
    sigs = np.full((len(texts), n_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                   dtype=np.uint64)
    all_sh: list[str] = []
    bounds = [0]
    for t in texts:
        sh = shingles(t, k)
        all_sh.extend(sh)
        bounds.append(len(all_sh))
    if not all_sh:
        return sigs
    import pyarrow as pa

    # pa.array first: C-speed UTF-8 packing vs per-string Python encode
    h = hash64_batch(pa.array(all_sh, type=pa.string()))  # (n_shingles,)
    starts = np.asarray(bounds[:-1], dtype=np.int64)
    ends = np.asarray(bounds[1:], dtype=np.int64)
    nonempty = np.where(ends > starts)[0]
    if not len(nonempty):
        return sigs
    with np.errstate(over="ignore"):
        # one (n_shingles, n_perm) pass + segment-min per doc — no
        # per-doc Python loop. multiply.outer, NOT h[:,None]*a[None,:]:
        # the stride-0 broadcast takes numpy's slow inner loop (~40×).
        vals = np.multiply.outer(h, a)
        vals += b[None, :]
        sigs[nonempty] = np.minimum.reduceat(vals, starts[nonempty], axis=0)
    return sigs


def lsh_bands(sigs: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n_docs, n_bands) int64 band hashes: rows of the signature are
    split into n_bands groups whose concatenation is hashed (cheap mix)."""
    n, p = sigs.shape
    rows = p // n_bands
    out = np.empty((n, n_bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for bidx in range(n_bands):
            seg = sigs[:, bidx * rows : (bidx + 1) * rows]
            acc = np.zeros(n, dtype=np.uint64)
            for c in range(rows):
                acc = acc * np.uint64(0x9E3779B97F4A7C15) + seg[:, c]
            out[:, bidx] = acc.view(np.int64)
    return out


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


_SIMHASH_TOKEN_CHUNK = 1 << 20  # bound the (tokens, 64) bit plane to ~64 MB


def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over word features (int64 view). Vectorized: one
    murmur3 pass over all tokens, ``np.unpackbits`` on the uint8 view of
    the hashes (one C pass, 8× smaller than the former int64
    ``right_shift.outer`` plane — VERDICT r2 item #2), then a
    segment-sum of bit counts per doc. Bit b is set iff more than half
    the doc's token hashes have bit b set — identical to the ±1-vote
    formulation (2·cnt > n_tokens ⇔ Σ votes > 0), verified bit-equal.
    Docs are processed in token-bounded chunks so the bit plane never
    exceeds ``_SIMHASH_TOKEN_CHUNK`` × 64 bytes regardless of batch
    size."""
    all_toks: list[str] = []
    bounds = [0]
    for t in texts:
        toks = t.split()
        all_toks.extend(toks)
        bounds.append(len(all_toks))
    out = np.zeros(len(texts), dtype=np.uint64)
    if not all_toks:
        return out.view(np.int64)
    import pyarrow as pa

    h = hash64_batch(pa.array(all_toks, type=pa.string()))  # (n_tokens,) u64
    starts = np.asarray(bounds[:-1], dtype=np.int64)
    ends = np.asarray(bounds[1:], dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    lo = 0
    while lo < len(texts):
        # grow the doc slice until its token span hits the chunk budget
        hi = int(np.searchsorted(ends, starts[lo] + _SIMHASH_TOKEN_CHUNK,
                                 side="left"))
        hi = max(hi, lo + 1)
        s, e = starts[lo:hi], ends[lo:hi]
        nonempty = np.where(e > s)[0]
        if len(nonempty):
            seg = h[s[0]:e[-1]]
            # little-endian uint8 view + bitorder="little" ⇒ flat bit j
            # of each row equals (h >> j) & 1
            bits = np.unpackbits(seg[:, None].view(np.uint8), axis=1,
                                 bitorder="little")  # (tokens, 64) u8
            cnt = np.add.reduceat(bits, (s - s[0])[nonempty], axis=0,
                                  dtype=np.int64)  # (docs', 64)
            seglen = (e - s)[nonempty]
            packed = ((cnt * 2 > seglen[:, None]).astype(np.uint64)
                      << shifts).sum(axis=1, dtype=np.uint64)
            out[lo + nonempty] = packed
        lo = hi
    return out.view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.view(np.uint64) ^ b.view(np.uint64)
    # popcount via bit tricks (numpy has no popcount for uint64 pre-2.0)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


class HLL:
    """HyperLogLog with 2^p registers; merge = register-wise max."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h_i64: np.ndarray) -> None:
        h = np.asarray(h_i64, dtype=np.int64).view(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1)  # sentinel stops the count
        # rank = leading zeros of rest + 1
        rank = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        for r in range(1, 64 - self.p + 2):
            zero_top = (cur & mask) == 0
            rank = np.where((rank == 0) & ~zero_top, r, rank).astype(np.uint8)
            cur = cur << np.uint64(1)
            if (rank != 0).all():
                break
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / s
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def dump(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def restore(cls, blob: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h


class CountMin:
    """Count-min sketch (Cormode & Muthukrishnan 2005): depth×width
    int64 counters; point estimate = min over rows; merge = elementwise
    SUM (the sketch is linear, so per-block partials combine exactly
    like any partial aggregate). Row indices derive from one 64-bit
    murmur hash via Kirsch–Mitzenmacher double hashing
    (idx_i = h1 + i·h2 mod width) — no per-row rehash. Guarantees:
    estimate ≥ true count always; estimate ≤ true + ε·N with
    probability 1 − δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉."""

    def __init__(self, depth: int = 4, width: int = 2048):
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _indices(self, h_i64: np.ndarray) -> np.ndarray:
        h = np.asarray(h_i64, dtype=np.int64).view(np.uint64)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        rows = np.arange(self.depth, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + rows * h2[None, :])
                    % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h_i64: np.ndarray, counts: np.ndarray) -> None:
        idx = self._indices(h_i64)
        c = np.asarray(counts, dtype=np.int64)
        for i in range(self.depth):
            np.add.at(self.table[i], idx[i], c)

    def query_hashes(self, h_i64: np.ndarray) -> np.ndarray:
        idx = self._indices(h_i64)
        ests = np.stack([self.table[i, idx[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.table += other.table
        return self

    def dump(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def restore(cls, blob: bytes, depth: int = 4,
                width: int = 2048) -> "CountMin":
        s = cls(depth, width)
        s.table = np.frombuffer(blob, dtype=np.int64) \
            .reshape(depth, width).copy()
        return s
