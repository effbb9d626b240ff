"""A2 politeness drift feedback: measured per-host fetch latency feeds
the NEXT wave's delay budget (spacing = max(crawl-delay, drift_factor ×
previous-wave mean latency)). Engine folds latencies inside the parse
stage (batch-keyed, retry-idempotent); the wave-start scheduler applies
the floors. Parity: engine and oracle produce identical drift-scaled
clocks; the drift demonstrably changes the schedule vs the plain run.
"""

import dataclasses
import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=FETCH_COLS) for f in files])
    return sorted(tuple(r[c] for c in FETCH_COLS) for r in t.to_pylist())


@pytest.fixture(scope="module")
def drift_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("drift")
    # fixture latencies are 20–99 ms integral; crawl delays 50–250 ms —
    # with drift_factor=4 many hosts' floors (80–396 ms) exceed their
    # robots delay, so drift visibly reshapes the clock
    paths = write_web(str(root / "web"), n_hosts=6, pages_per_host=12,
                      hot_factor=4)
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    cfg = CrawlConfig(
        n_parts=4, seen_shards=2, max_depth=6, max_waves=4,
        max_pages_per_host=60,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
        schedule_mode="wave_start", politeness_drift=True, drift_factor=4.0,
    )
    run_dir = str(root / "run")
    run_crawl(run_dir, seeds, robots_t, cfg)
    oracle = crawl_oracle(
        seeds, RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms),
        build_pages_index(pq.read_table(paths["pages"])), cfg,
    )
    return {"root": root, "paths": paths, "seeds": seeds,
            "robots_t": robots_t, "cfg": cfg, "run_dir": run_dir,
            "oracle": oracle}


def test_drift_clock_parity(drift_env):
    eng = _log(drift_env["run_dir"])
    ora = sorted(tuple(r[c] for c in FETCH_COLS)
                 for r in drift_env["oracle"].fetch_log)
    assert len(eng) > 50
    assert eng == ora


def test_drift_changes_schedule(drift_env, ray_session):
    """Turning drift off must yield a DIFFERENT clock for waves ≥ 1
    (same fetched URL set — drift only re-times, never re-routes)."""
    from crawlray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(drift_env["cfg"], politeness_drift=False)
    run2 = str(drift_env["root"] / "run_nodrift")
    run_crawl(run2, drift_env["seeds"], drift_env["robots_t"], cfg)
    drift = _log(drift_env["run_dir"])
    plain = _log(run2)
    assert {k[4] for k in drift} == {k[4] for k in plain}  # same URLs
    d_sched = {(k[0], k[4]): k[6] for k in drift}
    p_sched = {(k[0], k[4]): k[6] for k in plain}
    changed = [k for k in d_sched if k[0] >= 1 and d_sched[k] != p_sched[k]]
    assert changed, "drift floors never altered the clock"


def test_drift_spacing_respected(drift_env):
    """Within a wave, a host's fetches are spaced by at least its
    effective delay (>= robots crawl-delay; >= the drift floor implied
    by the observed spacing — checked via the robots lower bound)."""
    robots = RobotsPolicy.from_arrow(drift_env["robots_t"])
    by = {}
    for k in _log(drift_env["run_dir"]):
        by.setdefault((k[0], k[2]), []).append(k[6])
    for (w, h), times in by.items():
        times.sort()
        d = robots.crawl_delay_ms(h)
        for a, b in zip(times, times[1:]):
            assert b - a >= d, (w, h)


def test_drift_requires_wave_start():
    with pytest.raises(ValueError):
        CrawlConfig(politeness_drift=True)  # schedule_mode defaults to write
