"""Cluster-derived shuffle / partition sizing (VERDICT r2 item #3).

The crawl engine has always sized its wave blocks from
``ray.cluster_resources()`` (crawl.py:run_wave); the query surface used
hardcoded widths (4/8/64) that serialize on a big cluster. Every
all-to-all width in the query surface now derives from the live cluster
CPU count through these helpers, so the same code runs 4-wide on a
laptop and 256-wide on a 128-node cluster.
"""

from __future__ import annotations

import ray


def cluster_cpus() -> int:
    """Whole-cluster CPU count (1 when Ray isn't initialized yet — the
    caller is building a lazy plan and Ray Data will init on execute)."""
    try:
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        pass
    return 8


def join_parts(frac: int = 4, floor: int = 4, cap: int = 512) -> int:
    """``num_partitions`` for Dataset.join: ~CPU/4. Each hash-join
    partition carries real fixed cost (an aggregator actor + per-
    partition build); measured at 32 CPUs on sf0.1, 32 partitions ran
    the same join 3× SLOWER than 4 — so size well below the core count
    and let multi-partition parallelism kick in only on big clusters."""
    return int(min(cap, max(floor, cluster_cpus() // frac)))


def bucket_parts(floor: int = 64, cap: int = 4096) -> int:
    """Hash-partition width for the LSH bucket pair stage: at least 64
    (enough spread that one partition holds few hot buckets), scaling
    2× CPUs so the pair stage is never narrower than the cluster."""
    return int(min(cap, max(floor, 2 * cluster_cpus())))


def fold_parts(cap: int = 2048) -> int:
    """Hash-partition width for partition-routed vectorized folds (the
    per-partition np.unique / bincount / nunique plans that replace
    per-key Aggregate machinery): 2× CPUs — wide enough that every core
    folds, cheap enough that the per-partition pandas/numpy pass
    dominates its own dispatch."""
    return int(min(cap, max(2, 2 * cluster_cpus())))


def read_blocks(path: str, min_rows: int = 8192,
                target_rows: int = 65536) -> int | None:
    """``override_num_blocks`` for a SINGLE-FILE parquet read, sized
    from the footer row count (one cheap metadata read, no data I/O).
    Ray's default splits every file ~64 ways for parallelism, which is
    right for a fat fact scan but hands every downstream stage 64
    near-empty blocks on a dimension table — and per-task dispatch
    (~20–70 ms each) then dominates the query (measured: a 15k-row
    map_batches+take_all fell 1.5 s → 0.18 s going 64 → 16 blocks).
    Sizing: enough blocks that no block exceeds ``target_rows``, at
    least the cluster CPU count when the table can fill it (≥
    ``min_rows`` per block), floor 1. Directories / remote URIs return
    None (keep Ray's own heuristic — multi-file reads already split by
    file)."""
    import math
    import os

    try:
        if not os.path.isfile(path):
            return None
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None
    if n <= 0:
        return 1
    return max(1, min(math.ceil(n / min_rows),
                      max(cluster_cpus(), math.ceil(n / target_rows))))
