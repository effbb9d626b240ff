"""Crawl parity: the distributed engine vs the sequential oracle
(SURVEY §5.2 parity tests 1–4) on the deterministic mini-web.

Exercises: intra-wave dedup winners, cross-wave seen-set novelty,
robots deny rules, per-host page-cap budgets, politeness virtual-clock
spacing, deterministic (wave, part, host, seq) ordering, span-sequence
equality per doc (BASELINE.json input_hint invariant), and
checkpoint/resume idempotence.
"""

import glob
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.functions.murmur3 import hash64s
from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _cfg(pages_path):
    return CrawlConfig(
        n_parts=4,
        seen_shards=2,
        max_depth=6,
        max_waves=5,
        max_pages_per_host=35,       # exercised: hot host exceeds it
        fetch_concurrency=(1, 4),
        parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": pages_path},
    )


def _engine_log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=FETCH_COLS + ["spans"]) for f in files]
    )
    return t.to_pylist()


def _key(r):
    return tuple(r[c] for c in FETCH_COLS)


@pytest.fixture(scope="module")
def crawl_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("crawl")
    paths = write_web(str(root / "web"), n_hosts=8, pages_per_host=14,
                      hot_factor=8)
    cfg = _cfg(paths["pages"])
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    run_dir = str(root / "run")
    summary = run_crawl(run_dir, seeds, robots_t, cfg)
    oracle = crawl_oracle(
        seeds,
        RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms),
        build_pages_index(pq.read_table(paths["pages"])),
        cfg,
    )
    return {
        "paths": paths, "cfg": cfg, "seeds": seeds, "robots_t": robots_t,
        "run_dir": run_dir, "summary": summary, "oracle": oracle,
        "root": root,
    }


def test_fetch_log_parity(crawl_env):
    eng = sorted(_key(r) for r in _engine_log(crawl_env["run_dir"]))
    ora = sorted(_key(r) for r in crawl_env["oracle"].fetch_log)
    assert len(eng) > 100  # the fixture actually crawls something
    assert eng == ora


def test_seen_set_parity(crawl_env):
    last = crawl_env["summary"]["waves"][-1]["wave"]
    hashes = set()
    for f in sorted(glob.glob(f"{crawl_env['run_dir']}/seen/wave={last}/shard-*.bin")):
        d = pickle.loads(open(f, "rb").read())
        hashes |= set(np.frombuffer(d["exact"], dtype=np.int64).tolist())
    assert hashes == {hash64s(u) for u in crawl_env["oracle"].seen}


def test_span_sequence_parity(crawl_env):
    rows = _engine_log(crawl_env["run_dir"])
    eng_docs = {
        r["url_canon"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
        for r in rows
        if r["status"] == 200
    }
    ora_docs = crawl_env["oracle"].docs
    assert set(eng_docs) == set(ora_docs)
    for k in ora_docs:
        assert eng_docs[k] == ora_docs[k], k


def test_politeness_never_violated(crawl_env):
    robots = RobotsPolicy.from_arrow(crawl_env["robots_t"])
    by_host_wave = {}
    for r in _engine_log(crawl_env["run_dir"]):
        by_host_wave.setdefault((r["wave"], r["host"]), []).append(r["scheduled_ms"])
    for (w, h), times in by_host_wave.items():
        times.sort()
        d = robots.crawl_delay_ms(h)
        for a, b in zip(times, times[1:]):
            assert b - a >= d, (w, h)


def test_host_cap_respected(crawl_env):
    cap = crawl_env["cfg"].max_pages_per_host
    counts = {}
    for r in _engine_log(crawl_env["run_dir"]):
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    assert max(counts.values()) <= cap
    # the hot host actually hits the cap (fixture guarantees pressure)
    assert max(counts.values()) == cap


def test_robots_denied_never_fetched(crawl_env):
    for r in _engine_log(crawl_env["run_dir"]):
        assert "/prive/" not in r["url_canon"]


def test_resume_parity(crawl_env):
    """Kill after wave 2, resume, final fetch log identical (parity test 4)."""
    from crawlray.pipelines.crawl import run_crawl
    import dataclasses

    cfg = crawl_env["cfg"]
    run2 = str(crawl_env["root"] / "run_resumed")
    cfg_short = dataclasses.replace(cfg, max_waves=2)
    run_crawl(run2, crawl_env["seeds"], crawl_env["robots_t"], cfg_short)
    run_crawl(run2, crawl_env["seeds"], crawl_env["robots_t"], cfg, resume=True)
    eng1 = sorted(_key(r) for r in _engine_log(crawl_env["run_dir"]))
    eng2 = sorted(_key(r) for r in _engine_log(run2))
    assert eng1 == eng2


def test_metrics_lineage_reconciles(crawl_env):
    """S8: the persisted metrics table's per-wave lineage must reconcile
    with ground truth — rows_in == the oracle's frontier size per wave,
    rows_out == the fetch-log rows of that wave, wall time and input
    refs populated."""
    from collections import Counter

    t = pq.read_table(f"{crawl_env['run_dir']}/metrics/metrics.parquet")
    waves = {r["wave"]: r for r in t.to_pylist() if r["stage"] == "wave_pipeline"}
    assert sorted(waves) == list(range(len(crawl_env["oracle"].waves)))
    for w, size in enumerate(crawl_env["oracle"].waves):
        assert waves[w]["rows_in"] == size, w
    per_wave = Counter(r["wave"] for r in _engine_log(crawl_env["run_dir"]))
    for w, m in waves.items():
        assert m["rows_out"] == per_wave.get(w, 0), w
        assert m["wall_ms"] > 0
        assert m["input_refs"].endswith(f"wave={w}")


def test_docs_manifest_written(crawl_env):
    from crawlray.sources.lance_compat import read_manifest

    man = read_manifest(f"{crawl_env['run_dir']}/pages/wave=0")
    assert man is not None
    assert man["num_rows"] > 0
    names = [f["name"] for f in man["schema"]]
    assert "spans" in names and "url_canon" in names
