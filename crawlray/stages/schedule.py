"""A2: per-host politeness scheduling — stateful actor-pool stage run as
``groupby("part").map_groups(HostScheduler, ...)``.

NOTE: the default wave pipeline no longer runs this stage — the same
virtual clock is stamped at frontier-WRITE time by SeqAssigner
(stages/frontier.py), saving one groupby(part) all-to-all per wave.
HostScheduler remains the wave-START scheduling path for transports
where politeness must reflect *measured* fetch times (real HTTP): there
the previous wave's clock can drift, so it is recomputed here before
fetching.

Each group is one frontier partition (hosts never straddle partitions:
part = host_hash % P), so an actor sees every URL of its hosts for the
wave. Politeness is a per-wave virtual clock: a host's j-th fetch (in
``seq`` order) is scheduled at ``j * crawl_delay_ms(host)``. The fetch
stage downstream honors ``scheduled_ms`` ordering; in SimTransport mode
the clock is virtual (the benchmark measures the engine, not sleeps).

The RobotsPolicy is broadcast once via ``ray.put`` and fetched in
``__init__`` — once per actor, not per batch/group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


class HostScheduler:
    def __init__(self, robots_ref, drift_ref=None):
        self._robots = ray.get(robots_ref)
        # politeness drift: {host: drift-floor ms} derived from the
        # previous wave's measured latencies (crawl.py folds them); the
        # effective spacing is max(robots crawl-delay, drift floor)
        self._drift: dict[str, int] = (
            ray.get(drift_ref) if drift_ref is not None else {}
        )
        self._delay_cache: dict[str, int] = {}

    def _delay(self, host: str) -> int:
        d = self._delay_cache.get(host)
        if d is None:
            d = max(self._robots.crawl_delay_ms(host),
                    self._drift.get(host, 0))
            self._delay_cache[host] = d
        return d

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seq", kind="mergesort", ignore_index=True)
        # robots re-check with the CURRENT policy: in robots-fetch mode a
        # host's rules may arrive only after its rows were admitted (with
        # the default-allow policy); denied rows are dropped here — they
        # stay in the seen set (admission-time semantics) but are never
        # fetched. Idempotent for static table policies (rows were
        # already filtered at admission), so it runs unconditionally.
        keep = np.asarray(
            self._robots.allowed_many(df["url_canon"].tolist()), dtype=bool
        )
        df = df[keep].reset_index(drop=True)
        j = df.groupby("host", sort=False).cumcount()
        delays = df["host"].map(self._delay)
        df["scheduled_ms"] = (j * delays).astype(np.float64)
        # deterministic emit order inside the partition
        return df.sort_values(
            ["scheduled_ms", "host", "seq"], kind="mergesort", ignore_index=True
        )


def schedule_hosts(df: pd.DataFrame, *, robots_ref, drift_ref=None
                   ) -> pd.DataFrame:
    """Task-based form of HostScheduler (see taskstate.py)."""
    from .taskstate import instance

    key = (robots_ref, drift_ref)
    h = instance("HostScheduler", key,
                 lambda: HostScheduler(robots_ref, drift_ref=drift_ref))
    return h(df)
