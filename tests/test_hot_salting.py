"""A6 salted-part split (VERDICT r1 item #4): forcing every host hot
(threshold=1) must produce BYTE-IDENTICAL crawl outputs to the fused
single-shuffle path — the salt only spreads dedup work; cap, seq ranks
and the politeness clock still come from one group per part. Also checks
the WaveStats fold: budgets/hot detection survive resume without any
frontier re-read.
"""

import dataclasses
import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=FETCH_COLS) for f in files])
    return sorted(tuple(r[c] for c in FETCH_COLS) for r in t.to_pylist())


@pytest.fixture(scope="module")
def salted_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web

    root = tmp_path_factory.mktemp("salt")
    paths = write_web(str(root / "web"), n_hosts=6, pages_per_host=12,
                      hot_factor=6)
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    base = CrawlConfig(
        n_parts=4, seen_shards=2, max_depth=6, max_waves=4,
        max_pages_per_host=40,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
    )
    run_fused = str(root / "fused")
    run_salted = str(root / "salted")
    sum_fused = run_crawl(run_fused, seeds, robots_t, base)
    cfg_salted = dataclasses.replace(base, hot_host_threshold=1,
                                     hot_skew_factor=0.0, hot_salt_parts=3)
    sum_salted = run_crawl(run_salted, seeds, robots_t, cfg_salted)
    return {"root": root, "paths": paths, "seeds": seeds,
            "robots_t": robots_t, "base": base, "cfg_salted": cfg_salted,
            "run_fused": run_fused, "run_salted": run_salted,
            "sum_fused": sum_fused, "sum_salted": sum_salted}


def test_salted_output_byte_identical(salted_env):
    fused = _log(salted_env["run_fused"])
    salted = _log(salted_env["run_salted"])
    assert len(fused) > 50
    assert fused == salted


def test_salted_summary_identical(salted_env):
    a, b = salted_env["sum_fused"], salted_env["sum_salted"]
    assert a["pages_fetched"] == b["pages_fetched"]
    assert a["urls_seen"] == b["urls_seen"]


def test_wave_counts_persisted_and_hot_detected(salted_env):
    """The committed state carries the per-wave admitted counts (the
    WaveStats fold) and the salted run actually classified hosts hot."""
    states = sorted(glob.glob(f"{salted_env['run_salted']}/state/wave=*.json"))
    assert states
    with open(states[-1]) as f:
        st = json.load(f)
    assert "wave_counts" in st and "budgets" in st
    # threshold=1 → every host with admissions is hot in some wave
    mid = [s for s in states if "wave=1" in s or "wave=0" in s]
    hot_any = False
    for s in mid:
        with open(s) as f:
            wc = json.load(f)["wave_counts"]
        hot_any |= any(c >= 1 for c in wc.values())
    assert hot_any


def test_salted_resume_parity(salted_env):
    """Kill after wave 2 and resume UNDER THE SALTED CONFIG: hot-host
    state must reconstruct from persisted wave_counts (no frontier read)
    and the final log must match the uninterrupted salted run."""
    from crawlray.pipelines.crawl import run_crawl

    cfg = salted_env["cfg_salted"]
    run3 = str(salted_env["root"] / "salted_resumed")
    run_crawl(run3, salted_env["seeds"], salted_env["robots_t"],
              dataclasses.replace(cfg, max_waves=2))
    run_crawl(run3, salted_env["seeds"], salted_env["robots_t"], cfg,
              resume=True)
    assert _log(run3) == _log(salted_env["run_salted"])
