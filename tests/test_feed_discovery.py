"""D1 integrated discovery parity (VERDICT r1 item #2): sitemap/RSS are
wired INTO the wave loop — pages reachable ONLY via a host's sitemap or
feed (never linked) must be discovered, admitted through the same dedup/
policy shuffle as page links, and fetched in the exact same order by the
engine and the sequential oracle. Includes sitemap-index recursion (the
child urlset's page arrives one wave later) and a robots-denied feed
entry that must never be fetched.
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _engine_log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=FETCH_COLS) for f in files])
    return t.to_pylist()


def _key(r):
    return tuple(r[c] for c in FETCH_COLS)


@pytest.fixture(scope="module")
def feed_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("feeds")
    paths = write_web(str(root / "web"), n_hosts=5, pages_per_host=12,
                      hot_factor=4, with_feeds=True)
    cfg = CrawlConfig(
        n_parts=4, seen_shards=2, max_depth=6, max_waves=5,
        max_pages_per_host=100,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
        discover_feeds=True,
    )
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
    return {"paths": paths, "cfg": cfg, "seeds": seeds, "robots_t": robots_t,
            "run_dir": run_dir, "summary": summary, "oracle": oracle,
            "root": root}


def test_feed_discovery_fetch_log_parity(feed_env):
    eng = sorted(_key(r) for r in _engine_log(feed_env["run_dir"]))
    ora = sorted(_key(r) for r in feed_env["oracle"].fetch_log)
    assert len(eng) > 50
    assert eng == ora


def test_sitemap_only_pages_fetched(feed_env):
    """/archief/stuk-* pages are in no page's links — only the sitemap
    lists them; /feed/item-* only the RSS does. Both must be crawled."""
    urls = {r["url_canon"] for r in _engine_log(feed_env["run_dir"])}
    arch = {u for u in urls if "/archief/stuk-" in u}
    feed = {u for u in urls if "/feed/item-" in u}
    assert len(arch) >= 8, arch   # ≥2 per non-index host
    assert len(feed) >= 8, feed


def test_sitemap_index_child_followed(feed_env):
    """Host 0's sitemap is an INDEX → /sitemap-extra.xml → the deep page
    arrives one wave after the other feed discoveries."""
    log = _engine_log(feed_env["run_dir"])
    deep = [r for r in log if r["url_canon"].endswith("/archief/diep-0")]
    assert len(deep) == 1
    direct = [r for r in log if "/feed/item-0" in r["url_canon"]
              and r["host"] == "news-0.nl"]
    assert direct and deep[0]["wave"] > direct[0]["wave"]


def test_denied_feed_entry_never_fetched(feed_env):
    for r in _engine_log(feed_env["run_dir"]):
        assert "/prive/" not in r["url_canon"]


def test_feed_urls_join_seen_set(feed_env):
    """Feed-discovered URLs are marked seen (admission-time semantics) —
    oracle seen set equality covers the union of both channels."""
    import pickle

    import numpy as np

    from crawlray.functions.murmur3 import hash64s

    last = feed_env["summary"]["waves"][-1]["wave"]
    hashes = set()
    for f in sorted(glob.glob(
            f"{feed_env['run_dir']}/seen/wave={last}/shard-*.bin")):
        d = pickle.loads(open(f, "rb").read())
        hashes |= set(np.frombuffer(d["exact"], dtype=np.int64).tolist())
    assert hashes == {hash64s(u) for u in feed_env["oracle"].seen}


def test_discovery_off_means_feeds_unreachable(feed_env, ray_session):
    """With discover_feeds=False, engine and oracle agree AND no archive
    page is ever found (proves those pages really are link-unreachable)."""
    import dataclasses

    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    cfg = dataclasses.replace(feed_env["cfg"], discover_feeds=False)
    run_dir = str(feed_env["root"] / "run_nofeeds")
    run_crawl(run_dir, feed_env["seeds"], feed_env["robots_t"], cfg)
    eng = sorted(_key(r) for r in _engine_log(run_dir))
    oracle = crawl_oracle(
        feed_env["seeds"],
        RobotsPolicy.from_arrow(feed_env["robots_t"], cfg.default_delay_ms),
        build_pages_index(pq.read_table(feed_env["paths"]["pages"])),
        cfg,
    )
    assert eng == sorted(_key(r) for r in oracle.fetch_log)
    assert not any("/archief/" in k[4] or "/feed/item" in k[4] for k in eng)


def test_sidewrite_discovery_parity(feed_env, ray_session):
    """disco_inline_limit=0 forces every discovery wave through the
    parquet SIDE-WRITE path (the 10^9-feed-entries shape: parsed rows
    stream to a wave-scoped manifest-sink directory instead of an
    object-store materialize). The fetch log must be byte-identical to
    the inline-tasks run, and the side-write dirs must exist with
    committed manifests."""
    import dataclasses
    import json
    import os

    from crawlray.pipelines.crawl import run_crawl

    cfg = dataclasses.replace(feed_env["cfg"], disco_inline_limit=0)
    run_dir = str(feed_env["root"] / "run_sidewrite")
    run_crawl(run_dir, feed_env["seeds"], feed_env["robots_t"], cfg)
    eng = sorted(_key(r) for r in _engine_log(run_dir))
    ora = sorted(_key(r) for r in feed_env["oracle"].fetch_log)
    assert eng == ora
    disco_dirs = sorted(glob.glob(f"{run_dir}/disco/wave=*"))
    assert disco_dirs, "side-write path was not taken"
    for d in disco_dirs:
        man = json.load(open(os.path.join(d, "manifest.json")))
        assert man["rows"] == sum(f["rows"] for f in man["fragments"])
