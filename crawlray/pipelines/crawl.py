"""The crawl engine: BFS wave loop over Ray Data pipelines (SURVEY §3.2).

Per wave k (every arrow a streaming Ray Data stage over Arrow blocks):

  frontier_k (parquet)
   → groupby(part).map_groups(HostScheduler)      politeness, actor pool
   → repartition(n_exec_blocks)                   hot-host skew splitting:
        the hot host's partition arrives as ONE group block; re-splitting
        spreads its fetch+parse work across the whole pool while
        scheduled_ms (already assigned per host) keeps politeness intact
   → map_batches(Fetcher)                         actor pool, transport state
   → map_batches(PageParser)                      actor pool, drops bodies
   → write pages/wave=k (parquet checkpoint)      THE fork point: docs sink
                                                  and discovery both re-read
                                                  it column-pruned — no
                                                  double execution, stream
                                                  never materializes in RAM
  pages/wave=k (links columns only)
   → map_batches(explode_links)                   vectorized candidate rows
   → map_batches(partial dedup)                   per-block combiner
   → groupby(url_hash).aggregate(Min...)          SHUFFLE: intra-wave dedup,
                                                  packed-srckey argmin
   → map_batches(filter_new)                      cuckoo seen shards (A1)
   → map_batches(PolicyFilter)                    robots/depth/crawlable
   → groupby(part).map_groups(SeqAssigner)        SHUFFLE: host-hash parts,
                                                  page-cap budget + seq rank
   → write frontier/wave=k+1
  commit: seen snapshots, budgets, metrics, manifest.json (atomic rename)

Only hashes and short strings ever shuffle; bodies live between Fetcher
and PageParser inside one streaming segment. Resume = restore shards +
budgets from the last committed manifest and re-enter at wave k+1
(wave-scoped sink dirs make replay idempotent).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..sources import lance_compat
from ..stages.fetch import Fetcher
from ..stages.frontier import SeqAssigner, admit_seeds, explode_links, policy_filter
from ..stages.parse import PageParser
from ..stages.schedule import HostScheduler
from ..state.robots import RobotsPolicy
from ..state.seen import filter_new, make_shards
from .config import CrawlConfig

_DEDUP_COLS = ["srckey64", "url_canon", "host", "host_hash", "part"]


def _partial_dedup(t: pa.Table) -> pa.Table:
    """Per-block combiner before the global dedup shuffle: one candidate
    row per url_hash per block (min srckey64; other cols are constant
    within a url_hash group)."""
    g = t.group_by("url_hash").aggregate([(c, "min") for c in _DEDUP_COLS])
    return g.rename_columns(["url_hash"] + _DEDUP_COLS)


class PolicyFilter:
    """Actor-pool wrapper for policy_filter with broadcast robots."""

    def __init__(self, robots_ref, max_depth: int):
        self._robots = ray.get(robots_ref)
        self._max_depth = max_depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        return policy_filter(batch, self._robots, self._max_depth)


class CrawlRun:
    def __init__(self, run_dir: str, cfg: CrawlConfig, robots: RobotsPolicy):
        self.run_dir = run_dir
        self.cfg = cfg
        self.robots = robots
        self.robots_ref = ray.put(robots)
        self.budgets: dict[str, int] = {}
        self.shards = None
        self.metrics: list[dict] = []

    # ---------------------------------------------------------- paths
    def _p(self, *parts) -> str:
        return os.path.join(self.run_dir, *parts)

    def _manifest_path(self) -> str:
        return self._p("manifest.json")

    # ------------------------------------------------------- lifecycle
    def start(self, seed_urls: list[str]) -> None:
        os.makedirs(self.run_dir, exist_ok=True)
        self.shards = make_shards(self.cfg.seen_shards, self.cfg.seen_capacity)
        frontier0 = admit_seeds(seed_urls, self.robots, self.shards, self.cfg)
        fdir = self._p("frontier", "wave=0")
        os.makedirs(fdir, exist_ok=True)
        if frontier0 is not None:
            import pyarrow.parquet as pq

            pq.write_table(frontier0, os.path.join(fdir, "part-0.parquet"))
            hosts, counts = np.unique(frontier0["host"].to_numpy(zero_copy_only=False),
                                      return_counts=True)
            self.budgets = dict(zip(hosts.tolist(), counts.tolist()))
        self._commit(-1)

    def resume(self) -> int:
        """Restore from the last committed manifest; returns next wave."""
        with open(self._manifest_path()) as f:
            man = json.load(f)
        last = man["last_wave"]
        with open(self._p("state", f"wave={last}.json")) as f:
            self.budgets = json.load(f)["budgets"]
        snapdir = self._p("seen", f"wave={last}")
        snaps = []
        for i in range(self.cfg.seen_shards):
            with open(os.path.join(snapdir, f"shard-{i}.bin"), "rb") as f:
                snaps.append(f.read())
        self.shards = make_shards(self.cfg.seen_shards, self.cfg.seen_capacity, snaps)
        # drop any partial work past the manifest (idempotent replay)
        for sub, keep in (("pages", last), ("seen", last), ("frontier", last + 1)):
            base = self._p(sub)
            if os.path.isdir(base):
                for d in os.listdir(base):
                    if d.startswith("wave=") and int(d.split("=")[1]) > keep:
                        shutil.rmtree(os.path.join(base, d))
        return last + 1

    def _commit(self, wave: int) -> None:
        sdir = self._p("state")
        os.makedirs(sdir, exist_ok=True)
        lance_compat._atomic_write_json(
            self._p("state", f"wave={wave}.json"), {"budgets": self.budgets}
        )
        snapdir = self._p("seen", f"wave={wave}")
        os.makedirs(snapdir, exist_ok=True)
        for i, blob in enumerate(ray.get([s.dump.remote() for s in self.shards])):
            with open(os.path.join(snapdir, f"shard-{i}.bin"), "wb") as f:
                f.write(blob)
        lance_compat._atomic_write_json(
            self._manifest_path(),
            {"last_wave": wave, "cfg_parts": self.cfg.n_parts,
             "committed_at": time.time()},
        )

    # ------------------------------------------------------ wave logic
    def _frontier_count(self, wave: int) -> int:
        fdir = self._p("frontier", f"wave={wave}")
        if not os.path.isdir(fdir):
            return 0
        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(os.path.join(fdir, f)).num_rows
            for f in os.listdir(fdir)
            if f.endswith(".parquet")
        )

    def _metric(self, wave, stage, rows_in, rows_out, wall_ms, refs=""):
        self.metrics.append(
            {"wave": wave, "part": -1, "stage": stage, "rows_in": int(rows_in),
             "rows_out": int(rows_out), "bytes": 0, "wall_ms": float(wall_ms),
             "input_refs": refs}
        )

    def run_wave(self, wave: int) -> dict:
        cfg = self.cfg
        fdir = self._p("frontier", f"wave={wave}")
        pages_dir = self._p("pages", f"wave={wave}")
        n_front = self._frontier_count(wave)
        if n_front == 0:
            return {"wave": wave, "frontier": 0}

        t0 = time.time()
        ds = rd.read_parquet(fdir)
        sched = ds.groupby("part").map_groups(
            HostScheduler,
            batch_format="pandas",
            fn_constructor_kwargs={"robots_ref": self.robots_ref},
            concurrency=(1, max(2, cfg.n_parts)),
        )
        # hot-host skew splitting: break the per-part group blocks back
        # into evenly sized execution blocks for the fetch/parse pools
        n_exec = int(min(max(2 * cfg.n_parts, n_front // cfg.fetch_batch_size), 512))
        sched = sched.repartition(max(n_exec, 1))
        fetched = sched.map_batches(
            Fetcher,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
            fn_constructor_kwargs={"transport_spec": cfg.transport},
        )
        parsed = fetched.map_batches(
            PageParser,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.parse_batch_size,
            concurrency=cfg.parse_concurrency,
        )
        parsed.write_parquet(pages_dir)
        lance_compat.finalize_fragment_dir(
            pages_dir,
            note="pages wave partition; docs view = status==200 rows, "
                 "columns (doc_id=url_canon, spans)",
        )
        import pyarrow.parquet as pq

        n_pages = sum(
            pq.read_metadata(os.path.join(pages_dir, f)).num_rows
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )
        self._metric(wave, "fetch+parse", n_front, n_pages,
                     (time.time() - t0) * 1000, refs=fdir)

        # ---- frontier build for wave k+1 --------------------------------
        t1 = time.time()
        budget_ref = ray.put(dict(self.budgets))
        shards = self.shards
        pages = rd.read_parquet(pages_dir, columns=["part", "seq", "depth", "links"])
        cands = pages.map_batches(
            lambda b: explode_links(b, cfg.n_parts),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        cands = cands.map_batches(_partial_dedup, batch_format="pyarrow",
                                  zero_copy_batch=True)
        winners = cands.groupby("url_hash").aggregate(
            *[Min(c, alias_name=c) for c in _DEDUP_COLS]
        )
        fresh = winners.map_batches(
            lambda b: filter_new(b, shards), batch_format="pyarrow"
        )
        admitted = fresh.map_batches(
            PolicyFilter,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"robots_ref": self.robots_ref,
                                   "max_depth": cfg.max_depth},
        )
        seqed = admitted.groupby("part").map_groups(
            SeqAssigner,
            batch_format="pandas",
            fn_constructor_kwargs={"budget_ref": budget_ref,
                                   "cap": cfg.max_pages_per_host,
                                   "wave": wave + 1},
            concurrency=(1, max(2, cfg.n_parts)),
        )
        next_dir = self._p("frontier", f"wave={wave + 1}")
        seqed.write_parquet(next_dir)
        n_next = self._frontier_count(wave + 1)
        self._metric(wave, "frontier_build", n_pages, n_next,
                     (time.time() - t1) * 1000, refs=pages_dir)

        # budgets += admitted counts per host (small driver-side agg)
        if n_next:
            stats = (
                rd.read_parquet(next_dir, columns=["host"])
                .groupby("host")
                .count()
                .take_all()
            )
            for r in stats:
                self.budgets[r["host"]] = self.budgets.get(r["host"], 0) + int(r["count()"])
        self._commit(wave)
        return {"wave": wave, "frontier": n_front, "pages": n_pages, "next": n_next}

    def finish(self) -> None:
        if self.metrics:
            mdir = self._p("metrics")
            os.makedirs(mdir, exist_ok=True)
            import pyarrow.parquet as pq

            pq.write_table(
                pa.Table.from_pylist(self.metrics), os.path.join(mdir, "metrics.parquet")
            )


def run_crawl(
    run_dir: str,
    seed_urls: list[str],
    robots_table,
    cfg: CrawlConfig,
    resume: bool = False,
) -> dict:
    """Entry point B/C (SURVEY §3.2/§3.3). Returns a run summary."""
    robots = RobotsPolicy.from_arrow(robots_table, cfg.default_delay_ms)
    run = CrawlRun(run_dir, cfg, robots)
    if resume and os.path.exists(run._manifest_path()):
        start = run.resume()
    else:
        if os.path.isdir(run_dir):
            shutil.rmtree(run_dir)
        run.start(seed_urls)
        start = 0
    waves = []
    for wave in range(start, cfg.max_waves):
        w = run.run_wave(wave)
        if w.get("frontier", 0) == 0:
            break
        waves.append(w)
    run.finish()
    total_fetched = sum(w.get("pages", 0) for w in waves)
    seen_total = sum(ray.get([s.count.remote() for s in run.shards]))
    return {
        "run_dir": run_dir,
        "waves": waves,
        "pages_fetched": total_fetched,
        "urls_seen": seen_total,
    }
