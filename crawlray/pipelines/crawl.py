"""The crawl engine: BFS wave loop, ONE streaming Ray Data pipeline per
wave (SURVEY §3.2):

  frontier_k (parquet in ≤ frontier_rows_per_file chunks; rows already in
              per-part fetch order with scheduled_ms stamped at write time)
   → read_parquet(override_num_blocks=n_exec)     read-time block split:
                                                  every part's work (hot
                                                  hosts included) spreads
                                                  across the pool with NO
                                                  repartition all-to-all
   → map_batches(fetch_batch)                     TASK stage, transport state
                                                  memoized per worker process
                                                  (stages/taskstate.py: a
                                                  per-wave actor pool costs
                                                  ~1 s spawn per stage per
                                                  wave; tasks reuse Ray's
                                                  long-lived workers)
   → map_batches(parse_and_sink_batch)            TASK stage: parse, side-
                                                  write pages/wave=k fragment
                                                  per batch (deterministic
                                                  names, retry-idempotent),
                                                  forward ONLY the (part,
                                                  seq, depth, links)
                                                  discovery projection
   → map_batches(explode + partial dedup)         vectorized candidates, per-
                                                  block combiner
   → groupby(part).map_groups(PartFrontierBuilder) THE wave's one shuffle
                                                  (host-hash): min-srckey
                                                  dedup + cuckoo novelty (A1)
                                                  + robots/depth policy +
                                                  page-cap budget + seq rank +
                                                  politeness clock for k+1 +
                                                  per-host admitted counts →
                                                  WaveStats fold (A6; the
                                                  driver never re-reads the
                                                  frontier). url_hash dedup
                                                  needs no shuffle of its
                                                  own: a URL's part is a
                                                  function of its host, so
                                                  all copies of a url_hash
                                                  meet in one group.
     [hot wave: groupby(gpart).map_groups(DedupNoveltyPolicy) —
      salt = url_hash % m spreads a hot host's dedup volume over m
      groups — then groupby(part).map_groups(SeqAssigner) sequences the
      admitted survivors with the host's SHARED cap/clock budget;
      byte-identical output, tested]
   → write frontier/wave=k+1 (small chunked files)
  commit: seen snapshots, budgets+wave_counts, metrics, manifest.json
  (atomic rename)

The fork the Dataset API can't express (pages sink AND discovery from
one parse pass) is a per-batch side-effect write inside ParseAndSink —
wave-granular idempotence, no re-read, no double execution. Only hashes
and short strings ever shuffle; bodies live only between Fetcher and
ParseAndSink inside one streaming segment. Scheduling politeness at
frontier-write time (SeqAssigner) removes the wave-start groupby(part)
sort the naive design needs. Resume = restore shards + budgets from the
last committed manifest and re-enter at wave k+1 (wave-scoped sink dirs
make replay idempotent).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..sources import lance_compat
from ..stages.fetch import fetch_batch
from ..stages.frontier import (
    admit_seeds,
    assign_seq,
    build_part_frontier,
    dedup_novelty_policy,
    explode_links,
    salt_gparts,
)
from ..stages.parse import parse_and_sink_batch
from ..state.robots import RobotsPolicy
from ..state.seen import make_shards
from ..state.wavestats import WaveStats
from .config import CrawlConfig

_DEDUP_COLS = ["srckey64", "url_canon", "host", "host_hash", "part"]


def _partial_dedup(t: pa.Table) -> pa.Table:
    """Per-block combiner before the global dedup shuffle: one candidate
    row per url_hash per block (min srckey64; other cols are constant
    within a url_hash group; seen_only is MAX-merged — a mark (1) beats
    plain rows (the body is stored either way), and a Retry-After retry
    (2) dominates both: the url was fetched and throttled, so re-fetching
    is the correct end state; lastmod_us is max-merged — the freshest
    feed stamp observed for the url wins, which is exactly the
    refresh-crawl version semantics)."""
    g = t.group_by("url_hash").aggregate(
        [(c, "min") for c in _DEDUP_COLS]
        + [("seen_only", "max"), ("lastmod_us", "max")])
    return g.rename_columns(
        ["url_hash"] + _DEDUP_COLS + ["seen_only", "lastmod_us"])


_NEVER_DUE = 1 << 62


def load_versions(run_dir: str, base: dict | None = None) -> dict[int, int]:
    """Max-merge every committed version fragment of a run
    (``versions/wave=*/group-*.parquet``, written by the frontier-build
    groups via ``fold_versions``) into a url_hash → lastmod_us dict —
    the refetch baseline a refresh run (or a resume) starts from. Size
    is bounded by the number of DATED feed/sitemap entries ever
    observed, not by the crawl; at a scale where that outgrows one
    broadcast dict, shard this by ``part`` and feed each builder group
    its slice (the fragments are already keyed to support it)."""
    import pyarrow.parquet as pq

    out = dict(base) if base else {}
    vroot = os.path.join(run_dir, "versions")
    if not os.path.isdir(vroot):
        return out
    for d in sorted(os.listdir(vroot)):
        wdir = os.path.join(vroot, d)
        if not (d.startswith("wave=") and os.path.isdir(wdir)):
            continue
        for f in sorted(os.listdir(wdir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(wdir, f))
            for h, lm in zip(t["url_hash"].to_pylist(),
                             t["lastmod_us"].to_pylist()):
                if lm > out.get(h, -1):
                    out[h] = lm
    return out


def load_validators(run_dir: str, base: dict | None = None) -> dict:
    """Merge every committed validator fragment of a run
    (``validators/wave=*/frag-*.parquet``, written by ParseAndSink) into
    a url_hash → (etag, last_modified_us) dict — the conditional-refetch
    baseline. Waves merge in NUMERIC order so a later wave's re-fetch
    overrides an earlier baseline (a URL is fetched at most once per
    wave, so intra-wave order is irrelevant). Size is bounded by pages
    actually fetched; at a scale where one broadcast dict outgrows the
    driver, shard by ``part`` exactly like the versions store (the
    fragments carry url_hash, so the split is a filter)."""
    import pyarrow.parquet as pq

    out = dict(base) if base else {}
    vroot = os.path.join(run_dir, "validators")
    if not os.path.isdir(vroot):
        return out
    waves = sorted(
        (int(d.split("=")[1]) for d in os.listdir(vroot)
         if d.startswith("wave=")))
    for w in waves:
        wdir = os.path.join(vroot, f"wave={w}")
        for f in sorted(os.listdir(wdir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(wdir, f))
            for h, e, lm in zip(t["url_hash"].to_pylist(),
                                t["etag"].to_pylist(),
                                t["last_modified_us"].to_pylist()):
                out[h] = (e, lm)
    return out


@ray.remote
def _disco_task(urls: list[str], transport_spec: dict, n_parts: int):
    """One discovery chunk fetched+parsed in a single Ray task — the
    small-batch fast path of _wave_discovery (a full Dataset pipeline
    costs seconds of actor-pool spinup that a 100-URL feed probe doesn't
    earn). Returns (candidate table, sitemap-index child URLs)."""
    import pyarrow.compute as pc_

    from ..sources.feeds import discover_batch, feed_candidates
    from ..sources.transport import make_transport

    transport = make_transport(transport_spec)
    results = transport.fetch_many(urls)
    fetched = pa.table({
        "url_canon": pa.array(urls, type=pa.string()),
        "content_type": pa.array([r[1] for r in results], type=pa.string()),
        "body": pa.array([r[2] for r in results], type=pa.large_binary()),
    })
    rows = discover_batch(fetched)
    cands = _partial_dedup(feed_candidates(rows, n_parts))
    children = rows.filter(
        pc_.equal(rows["via"], pa.scalar("sitemap_index"))
    )["url"].to_pylist()
    return cands, children




class CrawlRun:
    def __init__(self, run_dir: str, cfg: CrawlConfig, robots: RobotsPolicy):
        self.run_dir = run_dir
        self.cfg = cfg
        self.robots = robots
        self.robots_ref = ray.put(robots)
        # run-scoped identity of cfg.transport for the task-stage
        # instance cache (stages/taskstate.py): dicts don't hash, and a
        # uuid is collision-free across the many runs one Ray session
        # may execute
        self._spec_token = uuid.uuid4().hex
        self.budgets: dict[str, int] = {}
        self.shards = None
        self.metrics: list[dict] = []
        self.hot_hosts: set[str] = set()
        # per-wave admitted counts of the NEXT frontier (A6 detection +
        # resume), folded inside the builder groups — never re-read
        self.wave_counts: dict[str, int] = {}
        self.stats = WaveStats.remote()
        # D1 discovery state: hosts whose feeds were already probed, and
        # sitemap-index children queued for the next wave
        self.disco_done: set[str] = set()
        self.pending_disco: list[str] = []
        # politeness drift: per-host delay floor from the previous wave's
        # measured latencies (cfg.politeness_drift)
        self.drift_ms: dict[str, int] = {}
        # refresh crawling (S3/S4 incremental harvest): recorded feed
        # stamps url_hash → lastmod_us, max-merged from the builder
        # groups' version fragments after each wave; prior_hosts = hosts
        # known to a PRIOR run whose feeds a refresh run re-probes even
        # though nothing admitted them this run
        self.versions: dict[int, int] = {}
        self.prior_hosts: set[str] = set()
        # conditional-refetch baseline: url_hash → (etag, lastmod_us)
        # recorded from response headers (merged from validator
        # fragments post-wave; a refresh run starts from the prior
        # run's merged store)
        self.validators: dict[int, tuple] = {}
        # adaptive-revisit clock (cfg.adaptive_revisit): url_hash ->
        # [due_run, interval]; folded from the PRIOR run's outcomes at
        # load_prior_state, spent entries parked at _NEVER_DUE once they
        # reach a frontier (the interval must survive for the next fold)
        self.revisit: dict[int, list] = {}
        self.run_idx: int = 0

    # ---------------------------------------------------------- paths
    def _p(self, *parts) -> str:
        return os.path.join(self.run_dir, *parts)

    def _detect_hot(self, counts: dict[str, int]) -> set[str]:
        """A6 hot-host classification over one wave's admitted counts:
        absolute threshold AND relative skew (see config)."""
        total = sum(counts.values())
        bar = self.cfg.hot_skew_factor * total / max(1, self.cfg.n_parts)
        return {
            h for h, c in counts.items()
            if c >= self.cfg.hot_host_threshold and c >= bar
        }

    def _manifest_path(self) -> str:
        return self._p("manifest.json")

    # ------------------------------------------------------- lifecycle
    def start(self, seed_urls: list[str], prior: dict | None = None) -> None:
        os.makedirs(self.run_dir, exist_ok=True)
        if prior is not None:
            # refresh run: chain off a prior completed run's state — the
            # seen set (so only refreshed/new URLs are admitted), the
            # version store (the refetch baseline), and the prior host
            # list (whose feeds are re-probed at wave 0). Per-host page
            # budgets start FRESH: a refresh is its own harvest session.
            self.shards = make_shards(self.cfg.seen_shards,
                                      self.cfg.seen_capacity,
                                      prior["snaps"])
            self.versions = dict(prior["versions"])
            self.prior_hosts = set(prior["hosts"])
            self.validators = dict(prior.get("validators", {}))
            self.revisit = {int(h): list(v)
                            for h, v in prior.get("revisit", {}).items()}
            self.run_idx = int(prior.get("run_idx", 0))
        else:
            self.shards = make_shards(self.cfg.seen_shards, self.cfg.seen_capacity)
        frontier0 = admit_seeds(
            seed_urls, self.robots, self.shards, self.cfg,
            revisit_due=({h: v[0] for h, v in self.revisit.items()}
                         if self.cfg.adaptive_revisit and self.revisit
                         else None),
            run_idx=self.run_idx)
        fdir = self._p("frontier", "wave=0")
        os.makedirs(fdir, exist_ok=True)
        if frontier0 is not None:
            import pyarrow.parquet as pq

            # chunked write: wave 0's seed pages are often the heaviest
            # (site roots with huge link fanout) — one file would read as
            # ONE block and serialize their fetch+parse; ≤32 chunks give
            # the wave-0 pool real parallelism
            n = frontier0.num_rows
            chunk = max(1, min(self.cfg.frontier_rows_per_file,
                               -(-n // 32)))
            for i, off in enumerate(range(0, n, chunk)):
                pq.write_table(frontier0.slice(off, chunk),
                               os.path.join(fdir, f"part-{i:05d}.parquet"))
            hosts, counts = np.unique(frontier0["host"].to_numpy(zero_copy_only=False),
                                      return_counts=True)
            self.budgets = dict(zip(hosts.tolist(), counts.tolist()))
            self.wave_counts = dict(self.budgets)
            self.hot_hosts = self._detect_hot(self.wave_counts)
            if self.cfg.adaptive_revisit and self.revisit:
                self._spend_revisit(
                    frontier0["url_hash"].to_numpy(zero_copy_only=False))
        self._commit(-1)

    def resume(self) -> int:
        """Restore from the last committed manifest; returns next wave."""
        with open(self._manifest_path()) as f:
            man = json.load(f)
        last = man["last_wave"]
        with open(self._p("state", f"wave={last}.json")) as f:
            state = json.load(f)
        self.budgets = state["budgets"]
        # hot-host detection for the wave about to run comes from the
        # persisted per-wave counts (folded at commit time by WaveStats) —
        # NOT from re-reading the frontier's host column (VERDICT r1 #4)
        self.wave_counts = state.get("wave_counts", {})
        self.hot_hosts = self._detect_hot(self.wave_counts)
        self.disco_done = set(state.get("disco_done", []))
        self.pending_disco = list(state.get("pending_disco", []))
        self.drift_ms = dict(state.get("drift_ms", {}))
        self.prior_hosts = set(state.get("prior_hosts", []))
        self.revisit = {int(h): list(v)
                        for h, v in state.get("revisit", {}).items()}
        self.run_idx = int(state.get("run_idx", 0))
        snapdir = self._p("seen", f"wave={last}")
        snaps = []
        for i in range(self.cfg.seen_shards):
            with open(os.path.join(snapdir, f"shard-{i}.bin"), "rb") as f:
                snaps.append(f.read())
        self.shards = make_shards(self.cfg.seen_shards, self.cfg.seen_capacity, snaps)
        # drop any partial work past the manifest (idempotent replay)
        for sub, keep in (("pages", last), ("seen", last),
                          ("frontier", last + 1), ("versions", last),
                          ("validators", last)):
            base = self._p(sub)
            if os.path.isdir(base):
                for d in os.listdir(base):
                    if d.startswith("wave=") and int(d.split("=")[1]) > keep:
                        shutil.rmtree(os.path.join(base, d))
        # the version/validator stores are derived state: re-merge the
        # committed fragments (≤ last) instead of persisting a json
        self.versions = load_versions(self.run_dir, base=self.versions)
        self.validators = load_validators(self.run_dir,
                                          base=self.validators)
        return last + 1

    def _commit(self, wave: int) -> None:
        sdir = self._p("state")
        os.makedirs(sdir, exist_ok=True)
        lance_compat._atomic_write_json(
            self._p("state", f"wave={wave}.json"),
            {"budgets": self.budgets, "wave_counts": self.wave_counts,
             "disco_done": sorted(self.disco_done),
             "pending_disco": list(self.pending_disco),
             "drift_ms": self.drift_ms,
             "prior_hosts": sorted(self.prior_hosts),
             "revisit": {str(h): v for h, v in self.revisit.items()},
             "run_idx": self.run_idx,
             # response-validator baseline (url_hash -> [etag, lm_us]):
             # persisted so a page skipped for a WHOLE run (adaptive
             # backoff) keeps its conditional-refetch baseline — the
             # per-wave fragments only cover pages fetched THIS run
             "validators": {str(h): [e, lm] for h, (e, lm)
                            in self.validators.items()}},
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

    # ------------------------------------------------------ robots (S2)
    def _ensure_robots(self) -> None:
        """robots_mode='fetch': fetch+parse /robots.txt for every
        admitted host that has no policy entry yet, through the normal
        transport (RobotsFetcher actor pool), then re-broadcast the
        policy. One row per host comes back to the driver — the policy
        is a driver-held broadcast dict by design (SURVEY J1), so this
        adds no new driver-side scaling class."""
        if self.cfg.robots_mode != "fetch":
            return
        from ..state.robots import fetch_robots_batch

        missing = sorted(set(self.budgets) - self.robots.known())
        if not missing:
            return
        cfg = self.cfg
        rows = (
            rd.from_arrow(pa.table({"host": pa.array(missing, type=pa.string())}))
            .map_batches(
                fetch_robots_batch, batch_format="pyarrow", batch_size=128,
                concurrency=max(2, cfg.fetch_concurrency[1] // 2),
                num_cpus=cfg.fetch_num_cpus,
                fn_kwargs={"spec_token": self._spec_token,
                           "transport_spec": cfg.transport,
                           "default_delay_ms": cfg.default_delay_ms},
            )
            .take_all()
        )
        self.robots.add_rows(rows)
        self.robots_ref = ray.put(self.robots)

    # ------------------------------------------------------ discovery
    def _wave_discovery(self, wave: int):
        """D1: fetch+parse the wave's discovery documents (feeds of hosts
        first admitted this wave, plus sitemap-index children queued by
        the previous wave) and return their frontier candidates as a
        Dataset in the link-candidate schema — the caller unions it into
        the wave's ONE admission shuffle. Returns None when there is
        nothing to discover.

        The parsed discovery rows (url/via/src/idx — no bodies) must be
        pinned so the tiny sitemap-index-children pass does not
        re-execute the fetches. Small waves (≤ cfg.disco_inline_limit
        probe URLs) run as chunked plain tasks; bigger waves stream the
        parsed rows through a wave-scoped parquet SIDE-WRITE (the
        manifest sink, delete+rewrite idempotent under wave replay) so a
        10^9-feed-entries wave never holds its discovery output in the
        object store."""
        cfg = self.cfg
        if not cfg.discover_feeds:
            return None
        from ..sources.feeds import discover_batch, feed_candidates

        # refresh runs re-probe the feeds of every host the PRIOR run
        # knew, even though the seen set admits none of their seeds
        new_hosts = sorted((set(self.budgets) | self.prior_hosts)
                           - self.disco_done)
        self.disco_done.update(new_hosts)
        # probe set per host: robots-declared Sitemap: URLs (RFC 9309 —
        # populated by fetch-mode parsing or a `sitemaps` robots-table
        # column) ∪ the /sitemap.xml + /rss.xml defaults, first
        # occurrence wins
        disco_urls = list(self.pending_disco)
        probed = set(disco_urls)
        for h in new_hosts:
            declared = self.robots.sitemaps_for(h)
            for u in (*declared, f"https://{h}/sitemap.xml",
                      f"https://{h}/rss.xml"):
                if u not in probed:
                    probed.add(u)
                    disco_urls.append(u)
        self.pending_disco = []
        if not disco_urls:
            return None
        if len(disco_urls) <= cfg.disco_inline_limit:
            # small-batch fast path: chunked plain tasks instead of a
            # full Dataset pipeline (saves actor-pool spinup + an extra
            # materialize/take_all execution per wave)
            chunk = 64
            futs = [
                _disco_task.remote(disco_urls[i:i + chunk], cfg.transport,
                                   cfg.n_parts)
                for i in range(0, len(disco_urls), chunk)
            ]
            tables = []
            for cands_t, children in ray.get(futs):
                if cands_t.num_rows:
                    tables.append(cands_t)
                self.pending_disco.extend(children)
            if not tables:
                return None
            return rd.from_arrow(pa.concat_tables(tables))
        import json as _json
        import shutil

        import pyarrow.compute as pc_

        from ..sources.ray_io import ManifestParquetDatasink

        src = rd.from_arrow(
            pa.table({"url_canon": pa.array(disco_urls, type=pa.string())})
        )
        parsed = (
            src.map_batches(
                fetch_batch, batch_format="pyarrow", batch_size=64,
                concurrency=max(2, cfg.fetch_concurrency[1] // 2),
                num_cpus=cfg.fetch_num_cpus,
                fn_kwargs={"spec_token": self._spec_token,
                           "transport_spec": cfg.transport},
            )
            .map_batches(discover_batch, batch_format="pyarrow")
        )
        # wave-scoped side-write: discovery output streams to disk with
        # backpressure (never held whole in the object store); a wave
        # replay after a crash deletes and rewrites — idempotent
        disco_dir = self._p("disco", f"wave={wave}")
        if os.path.isdir(disco_dir):
            shutil.rmtree(disco_dir)
        parsed.write_datasink(ManifestParquetDatasink(disco_dir))
        with open(os.path.join(disco_dir, "manifest.json")) as fh:
            frags = _json.load(fh)["fragments"]
        files = [os.path.join(disco_dir, f["file"]) for f in frags
                 if f["rows"]]
        if not files:
            return None
        back = rd.read_parquet(files)
        self.pending_disco = [
            r["url"] for r in back.map_batches(
                lambda b: b.filter(
                    pc_.equal(b["via"], pa.scalar("sitemap_index"))
                ).select(["url"]),
                batch_format="pyarrow",
            ).take_all()
        ]
        return back.map_batches(
            lambda b: _partial_dedup(feed_candidates(b, cfg.n_parts)),
            batch_format="pyarrow",
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

    def _spend_revisit(self, hashes) -> None:
        """Park the revisit entry of every url_hash that reached a
        frontier at _NEVER_DUE: the url revisits at most once per run,
        but its interval SURVIVES for the next run's doubling fold."""
        for h in hashes:
            e = self.revisit.get(int(h))
            if e is not None:
                e[0] = _NEVER_DUE

    def run_wave(self, wave: int) -> dict:
        cfg = self.cfg
        fdir = self._p("frontier", f"wave={wave}")
        pages_dir = self._p("pages", f"wave={wave}")
        n_front = self._frontier_count(wave)
        # a wave can be DISCOVERY-ONLY: empty frontier but pending
        # discovery work — a refresh run's wave 0 (prior hosts' feeds
        # re-probed against the carried seen set) or queued
        # sitemap-index children outliving the link frontier
        has_disco = cfg.discover_feeds and (
            bool(self.pending_disco)
            or bool((set(self.budgets) | self.prior_hosts) - self.disco_done)
        )
        if n_front == 0 and not has_disco:
            return {"wave": wave, "frontier": 0}

        t0 = time.time()
        self._ensure_robots()
        budget_ref = ray.put(dict(self.budgets))
        # refresh-crawl version plumbing: groups always FOLD observed
        # feed stamps (a normal run records the baseline a later refresh
        # compares against); the refetch override only activates with
        # cfg.refetch_if_newer
        versions_dir = (self._p("versions", f"wave={wave}")
                        if cfg.discover_feeds else None)
        versions_ref = (ray.put(dict(self.versions))
                        if cfg.refetch_if_newer else None)
        # conditional-refetch broadcast: only refetch-override
        # re-admissions can hit a recorded validator, so a fresh run
        # (empty store) skips the broadcast entirely
        validators_ref = (ray.put(dict(self.validators))
                          if cfg.refetch_if_newer and self.validators
                          else None)
        revisit_ref = (ray.put({h: v[0] for h, v in self.revisit.items()})
                       if cfg.adaptive_revisit and self.revisit else None)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        cands = (self._page_candidates(wave, fdir, pages_dir, n_front, ncpu,
                                       validators_ref)
                 if n_front else None)
        # D1: sitemap/RSS discovery for hosts first admitted this wave —
        # same candidate schema, same admission shuffle as page links
        disco_cands = self._wave_discovery(wave)
        if disco_cands is not None:
            cands = (cands.union(disco_cands) if cands is not None
                     else disco_cands)
        if cands is None:
            # discovery-only wave that discovered nothing admittable:
            # the probe state (disco_done) still advanced — commit it
            self._commit(wave)
            return {"wave": wave, "frontier": 0, "next": 0}
        return self._admit_and_commit(wave, cands, fdir, pages_dir, n_front,
                                      budget_ref, versions_dir, versions_ref,
                                      revisit_ref, t0)

    def _page_candidates(self, wave: int, fdir: str, pages_dir: str,
                         n_front: int, ncpu: int, validators_ref=None):
        """The wave's fetch → parse+sink → link-explode pipeline over a
        non-empty frontier, returning the candidate Dataset."""
        cfg = self.cfg
        # Read-time block splitting replaces the round-1 hot-wave
        # repartition all-to-all: the frontier is written in
        # ≤ frontier_rows_per_file files (below), so override_num_blocks
        # splits EVERY part's fetch+parse work across the pool at file
        # granularity for free — a hot part's rows land in many blocks
        # while its politeness clock (stamped once per host at
        # frontier-write time) stays the single shared budget. Capped at
        # 8×CPUs: fine enough that fetch/parse tasks pack the pool evenly
        # (at 4× the last-wave stragglers cost ~40% wall, measured), while
        # the downstream shuffle width stays governed by the coalesce
        # stage's big batches, not the read block count.
        n_exec = int(min(max(2 * cfg.n_parts, n_front // cfg.fetch_batch_size),
                         8 * ncpu))
        ds = rd.read_parquet(fdir, override_num_blocks=max(1, n_exec))
        if cfg.schedule_mode == "wave_start":
            # live-HTTP politeness path: re-derive the per-host clock at
            # wave start (A2 proper) instead of trusting the clock the
            # previous wave wrote — identical values for deterministic
            # transports (tested), fresher ones when real fetch latency
            # feeds back into budgets
            from ..stages.schedule import schedule_hosts

            drift_ref = (ray.put(dict(self.drift_ms))
                         if (cfg.politeness_drift or self.drift_ms)
                         else None)
            ds = ds.groupby("part").map_groups(
                schedule_hosts,
                batch_format="pandas",
                fn_kwargs={"robots_ref": self.robots_ref,
                           "drift_ref": drift_ref},
                concurrency=max(2, cfg.n_parts),
                num_cpus=cfg.seq_num_cpus,
            )
        # batch sizes scaled to the wave: a small wave of heavy pages
        # must split into per-page batches or one task serializes it
        fbs = max(1, min(cfg.fetch_batch_size,
                         n_front // (2 * cfg.fetch_concurrency[1])))
        pbs = max(1, min(cfg.parse_batch_size,
                         n_front // (2 * cfg.parse_concurrency[1])))
        # fetch/parse are TASK stages (stages/taskstate.py): no per-wave
        # actor-pool spawn, no min-pool ramp — concurrency is just the
        # in-flight task cap
        fetched = ds.map_batches(
            fetch_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=fbs,
            concurrency=cfg.fetch_concurrency[1],
            num_cpus=cfg.fetch_num_cpus,
            fn_kwargs={"spec_token": self._spec_token,
                       "transport_spec": cfg.transport,
                       "validators_ref": validators_ref},
        )
        sunk = fetched.map_batches(
            parse_and_sink_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=pbs,
            concurrency=cfg.parse_concurrency[1],
            num_cpus=cfg.parse_num_cpus,
            fn_kwargs={"pages_dir": pages_dir,
                       "extractors": cfg.extractors,
                       # stats feeds latency drift AND Retry-After
                       # penalties; the latter apply whenever the
                       # wave-start scheduler can honor floors
                       "stats": (self.stats
                                 if (cfg.politeness_drift
                                     or cfg.schedule_mode == "wave_start")
                                 else None),
                       "fold_latency": cfg.politeness_drift,
                       "retry_rate_limited": cfg.retry_rate_limited,
                       "wave": wave,
                       "validators_dir":
                           self._p("validators", f"wave={wave}"),
                       "keep_languages": cfg.keep_languages},
        )
        # coalesce the parse stream into few big blocks: (a) the
        # per-block dedup combiner sees more duplicates, (b) the
        # downstream sort shuffle's intermediate-object count is
        # B_in × n_parts — tiny B_in keeps its scheduling tail flat.
        # For a TINY wave of high-fanout pages (seed roots) drop to
        # per-page batches so the explode runs parallel; everywhere else
        # few-big-blocks wins (the shuffle tail scales with B_in).
        lb = 32768 if n_front > 16 * ncpu else max(1, n_front // (2 * ncpu))
        return sunk.map_batches(
            lambda b: _partial_dedup(explode_links(b, cfg.n_parts)),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=lb,
        )

    def _admit_and_commit(self, wave: int, cands, fdir: str, pages_dir: str,
                          n_front: int, budget_ref, versions_dir,
                          versions_ref, revisit_ref, t0: float) -> dict:
        """The wave's ONE admission shuffle over the unioned candidate
        stream (links ∪ feeds ∪ redirect marks), frontier write, version
        merge, budgets fold and commit."""
        cfg = self.cfg
        if self.hot_hosts:
            # A6 salted-part split (SURVEY §4.2): the heavy dedup/novelty/
            # policy work for a hot host spreads over hot_salt_parts
            # groups (salt = url_hash % m, so all copies of a URL still
            # meet in one group); the light per-part cap/seq/clock pass
            # then runs over admitted survivors only — one group per
            # part, so a hot host's page budget and politeness clock stay
            # SHARED across its salted groups. Outputs are byte-identical
            # to the fused path (asserted in tests).
            hot = set(self.hot_hosts)
            m = max(1, cfg.hot_salt_parts)
            salted = cands.map_batches(
                lambda b: salt_gparts(b, hot, cfg.n_parts, m),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            admitted = salted.groupby("gpart").map_groups(
                dedup_novelty_policy,
                batch_format="pandas",
                fn_kwargs={"shards": self.shards,
                           "robots_ref": self.robots_ref,
                           "max_depth": cfg.max_depth,
                           "allowed_hosts": cfg.allowed_hosts,
                           "versions_dir": versions_dir,
                           "versions_ref": versions_ref,
                           "revisit_ref": revisit_ref,
                           "run_idx": self.run_idx},
                concurrency=max(2, cfg.n_parts),
                num_cpus=cfg.seq_num_cpus,
            )
            seqed = admitted.groupby("part").map_groups(
                assign_seq,
                batch_format="pandas",
                fn_kwargs={"budget_ref": budget_ref,
                           "cap": cfg.max_pages_per_host,
                           "wave": wave + 1,
                           "robots_ref": self.robots_ref,
                           "stats": self.stats},
                concurrency=max(2, cfg.n_parts),
                num_cpus=cfg.seq_num_cpus,
            )
        else:
            seqed = cands.groupby("part").map_groups(
                build_part_frontier,
                batch_format="pandas",
                fn_kwargs={"shards": self.shards,
                           "robots_ref": self.robots_ref,
                           "budget_ref": budget_ref,
                           "cap": cfg.max_pages_per_host,
                           "wave": wave + 1,
                           "max_depth": cfg.max_depth,
                           "stats": self.stats,
                           "allowed_hosts": cfg.allowed_hosts,
                           "versions_dir": versions_dir,
                           "versions_ref": versions_ref,
                           "revisit_ref": revisit_ref,
                           "run_idx": self.run_idx},
                concurrency=max(2, cfg.n_parts),
                num_cpus=cfg.seq_num_cpus,
            )
        next_dir = self._p("frontier", f"wave={wave + 1}")
        seqed.write_parquet(next_dir,
                            max_rows_per_file=cfg.frontier_rows_per_file)
        if revisit_ref is not None and os.path.isdir(next_dir):
            import pyarrow.parquet as pq

            for f in sorted(os.listdir(next_dir)):
                if f.endswith(".parquet"):
                    self._spend_revisit(
                        pq.read_table(os.path.join(next_dir, f),
                                      columns=["url_hash"])["url_hash"]
                        .to_numpy(zero_copy_only=False))
        if os.environ.get("CRAWLRAY_STATS"):
            sdir = self._p("stats")
            os.makedirs(sdir, exist_ok=True)
            with open(os.path.join(sdir, f"wave={wave}.txt"), "w") as f:
                f.write(seqed.stats())

        if os.path.isdir(pages_dir):   # absent on a discovery-only wave
            lance_compat.finalize_fragment_dir(
                pages_dir,
                note="pages wave partition; docs view = status==200 rows, "
                     "columns (doc_id=final_url — the canonical identity "
                     "after redirects, equals url_canon for direct fetches; "
                     "spans)",
            )
        import pyarrow.parquet as pq

        n_pages = sum(
            pq.read_metadata(os.path.join(pages_dir, f)).num_rows
            for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        ) if os.path.isdir(pages_dir) else 0
        n_next = self._frontier_count(wave + 1)
        self._metric(wave, "wave_pipeline", n_front, n_pages,
                     (time.time() - t0) * 1000, refs=fdir)

        # budgets += admitted counts per host; hot-host detection for the
        # next wave's skew split. The counts were folded INSIDE the
        # builder groups (WaveStats actor) — the driver drains ≤ #hosts
        # dict entries, never a frontier column (VERDICT r1 item #4).
        self.wave_counts = ray.get(self.stats.drain.remote(wave + 1))
        for h, c in self.wave_counts.items():
            self.budgets[h] = self.budgets.get(h, 0) + c
        self.hot_hosts = self._detect_hot(self.wave_counts)
        if versions_dir is not None and os.path.isdir(versions_dir):
            # merge this wave's observed feed stamps (written by the
            # builder groups behind the wave barrier) so wave k+1's
            # refetch decisions see them
            self._merge_wave_versions(versions_dir)
        vdir = self._p("validators", f"wave={wave}")
        if os.path.isdir(vdir):
            # merge this wave's recorded response validators so a later
            # wave (or a chained refresh run) revalidates conditionally
            self._merge_wave_validators(vdir)
        if cfg.politeness_drift:
            # next wave's delay floor = drift_factor × this wave's mean
            # measured latency per host (exact for integral-ms fixtures —
            # float sums of integers are order-independent)
            lat = ray.get(self.stats.drain_latency.remote(wave))
            self.drift_ms = {
                h: int(round(cfg.drift_factor * s / n))
                for h, (s, n) in lat.items() if n
            }
        if cfg.politeness_drift or cfg.schedule_mode == "wave_start":
            # RFC 9110 Retry-After: a 429/503's delay-seconds raises the
            # host's NEXT-wave politeness floor (max with any drift
            # floor). Without latency drift the floors are penalties
            # only, so they RESET each wave — a Retry-After shields the
            # wave after it was served, not the rest of the crawl.
            pen = ray.get(self.stats.drain_penalty.remote(wave))
            if not cfg.politeness_drift:
                self.drift_ms = {}
            for h, ms in pen.items():
                if ms > self.drift_ms.get(h, 0):
                    self.drift_ms[h] = ms
        self._commit(wave)
        return {"wave": wave, "frontier": n_front, "pages": n_pages, "next": n_next}

    def _merge_wave_versions(self, versions_dir: str) -> None:
        import pyarrow.parquet as pq

        for f in sorted(os.listdir(versions_dir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(versions_dir, f))
            for h, lm in zip(t["url_hash"].to_pylist(),
                             t["lastmod_us"].to_pylist()):
                if lm > self.versions.get(h, -1):
                    self.versions[h] = lm

    def _merge_wave_validators(self, vdir: str) -> None:
        import pyarrow.parquet as pq

        for f in sorted(os.listdir(vdir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(vdir, f))
            for h, e, lm in zip(t["url_hash"].to_pylist(),
                                t["etag"].to_pylist(),
                                t["last_modified_us"].to_pylist()):
                self.validators[h] = (e, lm)

    def finish(self) -> None:
        if self.metrics:
            mdir = self._p("metrics")
            os.makedirs(mdir, exist_ok=True)
            import pyarrow.parquet as pq

            pq.write_table(
                pa.Table.from_pylist(self.metrics), os.path.join(mdir, "metrics.parquet")
            )
            lance_compat.finalize_fragment_dir(
                mdir, note="per-(wave, stage) lineage: rows in/out, wall ms, "
                           "input refs (S8; [B:L14])",
            )


def _fold_revisit(prior_run_dir: str, state: dict, cap: int) -> dict:
    """Adaptive-revisit fold at chain time: the prior run's parked store
    (url_hash -> [due, interval]) updated with its observed fetch
    OUTCOMES — a 304 (revalidated unchanged) DOUBLES the url's interval
    up to ``cap``, a 200 resets it to 1; either way the new due run is
    prior_run_idx + interval. Outcomes come from the prior run's pages
    fragments with only (url_hash, status) columns read — parquet column
    pruning keeps this a metadata-scale scan. Store size is bounded by
    urls ever fetched on the chain (the version-dict scaling class; the
    same part-sharding escape hatch applies past one broadcast)."""
    import pyarrow.parquet as pq

    store = {int(h): [int(v[0]), int(v[1])]
             for h, v in state.get("revisit", {}).items()}
    p_idx = int(state.get("run_idx", 0))
    proot = os.path.join(prior_run_dir, "pages")
    outcomes: dict[int, bool] = {}   # url_hash -> changed
    if os.path.isdir(proot):
        for d in sorted(os.listdir(proot)):
            wdir = os.path.join(proot, d)
            if not (d.startswith("wave=") and os.path.isdir(wdir)):
                continue
            for f in sorted(os.listdir(wdir)):
                if not f.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(wdir, f),
                                  columns=["url_hash", "status"])
                for h, st in zip(t["url_hash"].to_pylist(),
                                 t["status"].to_pylist()):
                    if st == 200:
                        outcomes[int(h)] = True
                    elif st == 304 and int(h) not in outcomes:
                        outcomes[int(h)] = False
    for h, changed in outcomes.items():
        prev_iv = store.get(h, (0, 1))[1]
        iv = 1 if changed else min(prev_iv * 2, cap)
        store[h] = [p_idx + iv, iv]
    return store


def load_prior_state(prior_run_dir: str, cfg: CrawlConfig) -> dict:
    """State a refresh run chains from: the prior completed run's seen
    snapshots, version store, host list (feeds re-probed), and — with
    cfg.adaptive_revisit — the folded revisit clock + chain position.
    Shard count must match — snapshots are shard-aligned."""
    with open(os.path.join(prior_run_dir, "manifest.json")) as f:
        last = json.load(f)["last_wave"]
    with open(os.path.join(prior_run_dir, "state", f"wave={last}.json")) as f:
        state = json.load(f)
    snaps = []
    snapdir = os.path.join(prior_run_dir, "seen", f"wave={last}")
    for i in range(cfg.seen_shards):
        with open(os.path.join(snapdir, f"shard-{i}.bin"), "rb") as f:
            snaps.append(f.read())
    base_validators = {int(h): (v[0], int(v[1]))
                       for h, v in state.get("validators", {}).items()}
    return {
        "snaps": snaps,
        "versions": load_versions(prior_run_dir),
        "validators": load_validators(prior_run_dir,
                                      base=base_validators),
        "hosts": set(state["budgets"]) | set(state.get("prior_hosts", [])),
        "revisit": (_fold_revisit(prior_run_dir, state,
                                  int(cfg.adaptive_revisit))
                    if cfg.adaptive_revisit else {}),
        "run_idx": int(state.get("run_idx", 0)) + 1,
    }


def run_crawl(
    run_dir: str,
    seed_urls: list[str],
    robots_table,
    cfg: CrawlConfig,
    resume: bool = False,
    prior_run_dir: str | None = None,
) -> dict:
    """Entry point B/C (SURVEY §3.2/§3.3). Returns a run summary.

    Shuffle strategy note (re-tested 2026-08-19, round 4: a minimal
    groupby().map_groups repro under HASH_SHUFFLE now HANGS outright in
    this Ray 2.49.2 build — worse than the crash below; still
    unusable): Ray 2.49's HASH_SHUFFLE would be the natural
    fit for the host-hash groupby (n_parts-wide fan-out, streaming
    aggregators), but its aggregator ``finalize`` crashes on empty
    partitions (schema-less block → ``sort_by('part')`` ArrowInvalid),
    which small waves hit constantly. We stay on the sort shuffle and
    instead bound its B×B intermediate-object count by coalescing the
    candidate stream into few, large blocks before the groupby."""
    robots = RobotsPolicy.from_arrow(robots_table, cfg.default_delay_ms)
    run = CrawlRun(run_dir, cfg, robots)
    prior = (load_prior_state(prior_run_dir, cfg)
             if prior_run_dir is not None else None)
    if resume and os.path.exists(run._manifest_path()):
        if prior is not None:
            # the refresh baseline precedes this run's own fragments —
            # resume() max-merges the latter on top
            run.versions = dict(prior["versions"])
            run.validators = dict(prior.get("validators", {}))
        start = run.resume()
    else:
        if os.path.isdir(run_dir):
            shutil.rmtree(run_dir)
        run.start(seed_urls, prior=prior)
        start = 0
    waves = []
    for wave in range(start, cfg.max_waves):
        w = run.run_wave(wave)
        # a wave can fetch nothing yet still discover (refresh wave 0 /
        # queued sitemap-index children): stop only when BOTH are empty
        if w.get("frontier", 0) == 0 and w.get("next", 0) == 0:
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
