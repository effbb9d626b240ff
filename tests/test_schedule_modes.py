"""A2 politeness placement: the write-time clock (PartFrontierBuilder)
and the wave-start clock (HostScheduler, the live-HTTP path) must agree
exactly on deterministic transports — same fetch log, same schedule."""

import dataclasses
import glob

import pyarrow as pa
import pyarrow.parquet as pq

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

COLS = ["wave", "part", "host", "seq", "url_canon", "scheduled_ms", "status"]


def _log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=COLS) for f in files])
    return sorted(tuple(r[c] for c in COLS) for r in t.to_pylist())


def test_write_and_wave_start_schedules_agree(ray_session, tmp_path):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web

    paths = write_web(str(tmp_path / "web"), n_hosts=5, pages_per_host=10,
                      hot_factor=3)
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    base = CrawlConfig(
        n_parts=3, seen_shards=2, max_depth=5, max_waves=3,
        max_pages_per_host=25,
        fetch_concurrency=(1, 2), parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": paths["pages"]},
    )
    run_crawl(str(tmp_path / "run_write"), seeds, robots_t, base)
    run_crawl(str(tmp_path / "run_wavestart"), seeds, robots_t,
              dataclasses.replace(base, schedule_mode="wave_start"))
    a = _log(str(tmp_path / "run_write"))
    b = _log(str(tmp_path / "run_wavestart"))
    assert len(a) > 20
    assert a == b
    # and the clock really spaces same-host fetches by the crawl delay
    robots = RobotsPolicy.from_arrow(robots_t)
    per_host_wave = {}
    for r in a:
        per_host_wave.setdefault((r[0], r[2]), []).append(r[5])
    for (w, h), times in per_host_wave.items():
        times.sort()
        d = robots.crawl_delay_ms(h)
        assert all(t2 - t1 >= d for t1, t2 in zip(times, times[1:])), (w, h)
