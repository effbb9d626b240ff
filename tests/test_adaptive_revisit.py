"""Adaptive revisit scheduling (config.adaptive_revisit, Cho &
Garcia-Molina 2003): stampless seen URLs re-fetch on an exponential-
backoff clock — a revisit that revalidates as a 304 DOUBLES its
interval (up to the cap), a changed 200 resets it to 1 — with
engine ≡ oracle parity on the full fetch log across a 4-run chain.

Fixture web: a root page linking two articles, all served with ETags
(so unchanged revisits 304) but NO feed stamps for the articles (the
stamp rule alone would never refetch them). /static never changes;
/live changes every run.
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

HOST = "revisit.nl"


def _html(links, marker):
    body = "".join(f'<a href="{u}">link</a>' for u in links)
    return (f"<html><head><title>{marker}</title></head>"
            f"<body><p>inhoud {marker}.</p>{body}</body></html>").encode()


def _sitemap(paths):
    rows = "".join(f"<url><loc>https://{HOST}{p}</loc></url>"
                   for p in paths)
    return (f"<?xml version='1.0'?><urlset "
            f"xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
            f"{rows}</urlset>").encode()


def _pages(version: int):
    """Version v of the web: /live's body (and etag) changes per
    version, /static and the root never change. The sitemap lists both
    articles WITHOUT lastmod stamps — the stampless channel that makes
    them candidates every run (a 304'd root yields no links), so the
    adaptive clock alone decides their refetches."""
    urls = [f"https://{HOST}/", f"https://{HOST}/sitemap.xml",
            f"https://{HOST}/static", f"https://{HOST}/live"]
    bodies = [_html(["/static", "/live"], "root-v1"),
              _sitemap(["/static", "/live"]),
              _html([], "static-v1"),
              _html([], f"live-v{version}")]
    etags = ["e-root-v1", None, "e-static-v1", f"e-live-v{version}"]
    ctypes = ["text/html", "application/xml", "text/html", "text/html"]
    n = len(urls)
    return pa.table({
        "url": urls,
        "host": [HOST] * n,
        "status": pa.array([200] * n, type=pa.int16()),
        "content_type": ctypes,
        "html": pa.array(bodies, type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * n, type=pa.float32()),
        "etag": etags,
        "last_modified_us": pa.array([-1] * n, type=pa.int64()),
    })


def _cfg(pages_path, cap=4):
    return CrawlConfig(
        n_parts=2, seen_shards=2, max_depth=4, max_waves=5,
        max_pages_per_host=50, refetch_if_newer=True,
        adaptive_revisit=cap,
        fetch_concurrency=(1, 2), parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )


def _robots_t():
    return pa.table({
        "host": [HOST], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })


def _log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    if not files:
        return []
    t = pa.concat_tables([
        pq.read_table(f, columns=["wave", "part", "host", "seq",
                                  "url_canon", "scheduled_ms", "status"])
        for f in files
    ])
    return t.to_pylist()


def _key(r):
    return (r["wave"], r["part"], r["host"], r["seq"], r["url_canon"],
            r["scheduled_ms"], r["status"])


@pytest.fixture(scope="module")
def chain(ray_session, tmp_path_factory):
    """4-run chain over the fixture web; /live changes at every run."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("adaptive")
    seeds = [f"https://{HOST}/"]
    robots_t = _robots_t()
    robots = RobotsPolicy.from_arrow(robots_t)
    runs, oras, cfgs = [], [], []
    prior_dir, prior_ora = None, None
    for i in range(4):
        web = _pages(version=i + 1)
        pth = str(root / f"web_v{i + 1}.parquet")
        pq.write_table(web, pth)
        cfg = _cfg(pth)
        rdir = str(root / f"run{i + 1}")
        run_crawl(rdir, seeds, robots_t, cfg, prior_run_dir=prior_dir)
        ora = crawl_oracle(seeds, robots, build_pages_index(web), cfg,
                           prior=prior_ora)
        runs.append(rdir)
        oras.append(ora)
        cfgs.append(cfg)
        prior_dir, prior_ora = rdir, ora
    return {"runs": runs, "oras": oras, "root": root, "seeds": seeds,
            "robots_t": robots_t}


def test_run1_fetches_everything(chain):
    urls = {r["url_canon"] for r in _log(chain["runs"][0])}
    assert urls == {f"https://{HOST}/", f"https://{HOST}/static",
                    f"https://{HOST}/live"}


def test_run2_revisits_all_then_backoff(chain):
    """Run 2: every run-1 page is due (interval 1). Unchanged pages
    revalidate as 304s, the changed page re-fetches as a 200."""
    st = {r["url_canon"]: r["status"] for r in _log(chain["runs"][1])}
    assert st == {f"https://{HOST}/": 304,
                  f"https://{HOST}/static": 304,
                  f"https://{HOST}/live": 200}


def test_run3_skips_backed_off_pages(chain):
    """Run 3: the 304'd pages doubled to interval 2 (due run 3+... not
    yet); only /live (reset to 1) re-fetches — and changes again."""
    st = {r["url_canon"]: r["status"] for r in _log(chain["runs"][2])}
    assert st == {f"https://{HOST}/live": 200}


def test_run4_backed_off_pages_come_due(chain):
    """Run 4: the interval-2 pages (due = run1_idx(1) + 2 = 3 = run4's
    run_idx) come due again and 304; /live re-fetches as usual."""
    st = {r["url_canon"]: r["status"] for r in _log(chain["runs"][3])}
    assert st == {f"https://{HOST}/": 304,
                  f"https://{HOST}/static": 304,
                  f"https://{HOST}/live": 200}


def test_engine_equals_oracle_full_chain(chain):
    for rdir, ora in zip(chain["runs"], chain["oras"]):
        assert (sorted(_key(r) for r in _log(rdir))
                == sorted(_key(r) for r in ora.fetch_log)), rdir


def test_config_validation():
    with pytest.raises(ValueError):
        CrawlConfig(adaptive_revisit=2, refetch_if_newer=False)


def test_resume_mid_chain_parity(chain, tmp_path):
    """A refresh run killed after its first committed wave and resumed
    produces the same fetch log as the uninterrupted run (the revisit
    clock and run_idx ride the per-wave state commits)."""
    from crawlray.pipelines.crawl import run_crawl

    web = _pages(version=2)
    pth = str(tmp_path / "web.parquet")
    pq.write_table(web, pth)
    cfg = _cfg(pth)
    straight = str(tmp_path / "straight")
    run_crawl(straight, chain["seeds"], chain["robots_t"], cfg,
              prior_run_dir=chain["runs"][0])
    resumed = str(tmp_path / "resumed")
    cfg1 = _cfg(pth)
    object.__setattr__(cfg1, "max_waves", 1) \
        if not hasattr(cfg1, "__dict__") else setattr(cfg1, "max_waves", 1)
    run_crawl(resumed, chain["seeds"], chain["robots_t"], cfg1,
              prior_run_dir=chain["runs"][0])
    run_crawl(resumed, chain["seeds"], chain["robots_t"], cfg,
              resume=True, prior_run_dir=chain["runs"][0])
    assert (sorted(_key(r) for r in _log(resumed))
            == sorted(_key(r) for r in _log(straight)))
