"""Sharded URL-seen set — S named cuckoo-filter actors (SURVEY A1).

The one piece of genuinely shared mutable state in the engine, so it is
raw Ray actors (the documented escape hatch): the Dataset API cannot
express a cross-wave mutable membership index. Everything around it stays
``map_batches``: tasks batch-route their hashes to shards and apply the
returned novelty mask.

Determinism: callers only offer *wave-deduped unique* hashes, so novelty
is independent of arrival order within a wave (membership state advances
only between waves for any individual URL).

Scale: shard count S spreads both memory and call load; routing is
``unsigned(url_hash) % S`` (murmur3 low bits are uniform). At 10^10 URLs
use S ≈ nodes×4 and the per-shard exact set becomes a disk-backed
store; the cuckoo filter in front keeps the hot path in-memory either
way (see state/cuckoo.py).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import ray

from .cuckoo import SeenSet


@ray.remote
class SeenShard:
    def __init__(self, shard_id: int, capacity: int = 1 << 20, snapshot: bytes | None = None):
        if snapshot is not None:
            self._seen = SeenSet.restore(pickle.loads(snapshot))
        else:
            self._seen = SeenSet(capacity=capacity, seed=42 + shard_id)
        self.shard_id = shard_id

    def contains_add(self, h_i64: np.ndarray) -> np.ndarray:
        return self._seen.contains_add_batch(h_i64)

    def count(self) -> int:
        return len(self._seen)

    def dump(self) -> bytes:
        return pickle.dumps(self._seen.dump())


def make_shards(n_shards: int, capacity: int, snapshots: list[bytes] | None = None):
    return [
        SeenShard.remote(i, capacity=capacity,
                         snapshot=snapshots[i] if snapshots else None)
        for i in range(n_shards)
    ]


def shard_of(h_i64: np.ndarray, n_shards: int) -> np.ndarray:
    return (h_i64.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)


def novelty_mask(shards, h_i64: np.ndarray) -> np.ndarray:
    """Route unique hashes to their shards, return the 'is new' mask.
    Called from inside map_batches tasks; the per-shard calls run
    concurrently and the actor serializes conflicting batches."""
    n = len(h_i64)
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask
    sid = shard_of(h_i64, len(shards))
    pending = []
    for s in range(len(shards)):
        idx = np.where(sid == s)[0]
        if len(idx):
            pending.append((idx, shards[s].contains_add.remote(h_i64[idx])))
    for idx, fut in pending:
        mask[idx] = ray.get(fut)
    return mask


def filter_new(batch: pa.Table, shards) -> pa.Table:
    """Keep only rows whose url_hash is new; marks all offered hashes as
    seen (admission-time semantics — matches the oracle's seen set)."""
    h = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
    return batch.filter(pa.array(novelty_mask(shards, h)))
