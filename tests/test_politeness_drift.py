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


def test_retry_after_penalty_parity(ray_session, tmp_path):
    """RFC 9110 Retry-After: a 429 whose delay-seconds value the
    transport surfaces (body channel, like 3xx Location) raises the
    host's NEXT-wave politeness floor — and ONLY the next wave's (no
    latency drift ⇒ penalty floors reset per wave). Engine ≡ oracle on
    the full fetch log including the penalty-scaled clocks."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "rl.nl"

    def html(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"<html><head><title>t</title></head>"
                f"<body>{body}</body></html>").encode()

    p = [f"https://{host}/p{i}" for i in range(3)]
    q = [f"https://{host}/q{i}" for i in range(3)]
    urls = [f"https://{host}/", f"https://{host}/throttle"] + p + q
    pages = pa.table({
        "url": urls,
        "host": [host] * len(urls),
        "status": pa.array([200, 429] + [200] * 6, type=pa.int16()),
        "content_type": ["text/html"] * len(urls),
        "html": pa.array(
            [html(p + [f"https://{host}/throttle"]),
             b"5"]                       # Retry-After: 5 (seconds)
            + [html(q) for _ in p]
            + [html([]) for _ in q], type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * len(urls), type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=5, max_waves=5,
        max_pages_per_host=50, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2), discover_feeds=False,
        transport={"kind": "sim", "pages_path": pages_path},
        schedule_mode="wave_start", politeness_drift=False,
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    rows = _log(run_dir)
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert rows == sorted(tuple(r[c] for c in FETCH_COLS)
                          for r in ora.fetch_log)
    by_wave = {}
    for r in rows:
        by_wave.setdefault(r[0], []).append(r)
    # wave 1 fetched the 429 (spacing still the 10 ms robots delay)
    assert any(r[7] == 429 for r in by_wave[1])
    assert max(r[6] for r in by_wave[1]) == 30.0      # 4 fetches × 10 ms
    # wave 2's clock is spaced by the 5000 ms Retry-After penalty
    assert sorted(r[6] for r in by_wave[2]) == [0.0, 5000.0, 10000.0]


def test_retry_rate_limited_refetches_under_penalty(ray_session, tmp_path):
    """The retry half of Retry-After (cfg.retry_rate_limited): a 429'd
    URL re-enters the next wave's frontier through the seen-set-bypass
    force channel and is fetched again under the raised floor — every
    wave, for as long as the server keeps throttling. Engine ≡ oracle on
    the full fetch log (repeated rows per retry included)."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "rl.nl"

    def html(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"<html><head><title>t</title></head>"
                f"<body>{body}</body></html>").encode()

    p = [f"https://{host}/p{i}" for i in range(3)]
    q = [f"https://{host}/q{i}" for i in range(3)]
    throttle = f"https://{host}/throttle"
    urls = [f"https://{host}/", throttle] + p + q
    pages = pa.table({
        "url": urls,
        "host": [host] * len(urls),
        "status": pa.array([200, 429] + [200] * 6, type=pa.int16()),
        "content_type": ["text/html"] * len(urls),
        "html": pa.array([html(p + [throttle]), b"5"]
                         + [html(q) for _ in p]
                         + [html([]) for _ in q], type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * len(urls), type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=5, max_waves=4,
        max_pages_per_host=50, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2), discover_feeds=False,
        transport={"kind": "sim", "pages_path": pages_path},
        schedule_mode="wave_start", politeness_drift=False,
        retry_rate_limited=True,
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    rows = _log(run_dir)
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert rows == sorted(tuple(r[c] for c in FETCH_COLS)
                          for r in ora.fetch_log)
    # the throttled URL was retried every remaining wave
    t_waves = sorted(r[0] for r in rows if r[4] == throttle)
    assert t_waves == [1, 2, 3]
    # wave 2 runs the 3 q-pages AND the retry under the 5 s floor
    w2 = sorted(r[6] for r in rows if r[0] == 2)
    assert w2 == [0.0, 5000.0, 10000.0, 15000.0]
