"""Refresh / re-crawl scheduling (VERDICT r2 item #9): a second run
chained off a prior run's state (seen set + feed-stamp version store)
re-fetches EXACTLY the pages whose feed entry is newer, plus genuinely
new entries — with engine ≡ oracle parity on the full fetch log.

The version signal is the feed's pubDate/lastmod (config.refetch_if_newer):
strictly-newer than the recorded stamp re-admits an already-seen URL;
URLs without a recorded baseline never refetch; every run records
observed stamps as the next run's baseline (versions/ store).
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

HOST = "nieuws.nl"


def _html(links, marker="v1"):
    body = "".join(f'<a href="{u}">link</a>' for u in links)
    return (f"<html><head><title>{marker}</title></head>"
            f"<body><p>inhoud {marker}.</p>{body}</body></html>").encode()


def _rss(items):
    """items: [(path, rfc822_date)]"""
    rows = "".join(
        f"<item><title>t</title><link>https://{HOST}{p}</link>"
        f"<pubDate>{d}</pubDate></item>"
        for p, d in items
    )
    return (f"<?xml version='1.0'?><rss version='2.0'><channel>{rows}"
            f"</channel></rss>").encode()


def _pages(rss_items, marker2="v1", extra=()):
    """The fixture web: root links artikel-1..3; /rss.xml lists them with
    pubDates. ``marker2`` varies artikel-2's body between versions."""
    arts = ["/artikel-1", "/artikel-2", "/artikel-3"]
    urls = [f"https://{HOST}/", f"https://{HOST}/rss.xml"] + [
        f"https://{HOST}{p}" for p in arts
    ] + [f"https://{HOST}{p}" for p, _ in extra]
    bodies = [
        _html(arts),
        _rss(rss_items),
        _html([], "a1-v1"),
        _html([], f"a2-{marker2}"),
        _html([], "a3-v1"),
    ] + [_html([], m) for _, m in extra]
    n = len(urls)
    return pa.table({
        "url": urls,
        "host": [HOST] * n,
        "status": pa.array([200] * n, type=pa.int16()),
        "content_type": ["text/html"] * 3 + ["text/html"] * (n - 3),
        "html": pa.array(bodies, type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * n, type=pa.float32()),
    }).set_column(3, "content_type", pa.array(
        ["text/html", "application/rss+xml"] + ["text/html"] * (n - 2)))


D1 = "Mon, 05 Feb 2024 10:00:00 GMT"
D2 = "Tue, 06 Feb 2024 10:00:00 GMT"
D3 = "Wed, 07 Feb 2024 09:30:00 GMT"  # the bumped stamp


def _cfg(pages_path):
    return CrawlConfig(
        n_parts=2, seen_shards=2, max_depth=4, max_waves=5,
        max_pages_per_host=50, refetch_if_newer=True,
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
        pq.read_table(f, columns=["wave", "part", "host", "seq", "url_canon",
                                  "scheduled_ms", "status", "final_url",
                                  "title"])
        for f in files
    ])
    return t.to_pylist()


def _key(r):
    return (r["wave"], r["part"], r["host"], r["seq"], r["url_canon"],
            r["scheduled_ms"], r["status"])


@pytest.fixture(scope="module")
def refresh_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("refresh")
    v1 = _pages([("/artikel-1", D1), ("/artikel-2", D1), ("/artikel-3", D2)])
    v2 = _pages(
        [("/artikel-1", D1), ("/artikel-2", D3), ("/artikel-3", D2),
         ("/artikel-4", D3)],
        marker2="v2", extra=[("/artikel-4", "a4-v2")],
    )
    p1 = str(root / "web_v1.parquet")
    p2 = str(root / "web_v2.parquet")
    pq.write_table(v1, p1)
    pq.write_table(v2, p2)
    seeds = [f"https://{HOST}/"]
    robots_t = _robots_t()
    cfg1, cfg2 = _cfg(p1), _cfg(p2)
    run1, run2 = str(root / "run1"), str(root / "run2")
    run_crawl(run1, seeds, robots_t, cfg1)
    run_crawl(run2, seeds, robots_t, cfg2, prior_run_dir=run1)
    ora1 = crawl_oracle(seeds, RobotsPolicy.from_arrow(robots_t),
                        build_pages_index(v1), cfg1)
    ora2 = crawl_oracle(seeds, RobotsPolicy.from_arrow(robots_t),
                        build_pages_index(v2), cfg2, prior=ora1)
    return {"root": root, "seeds": seeds, "robots_t": robots_t,
            "p2": p2, "cfg2": cfg2, "run1": run1, "run2": run2,
            "ora1": ora1, "ora2": ora2, "v2": v2}


def test_first_run_fetches_everything(refresh_env):
    got = {r["url_canon"] for r in _log(refresh_env["run1"])}
    assert got == {f"https://{HOST}/", f"https://{HOST}/artikel-1",
                   f"https://{HOST}/artikel-2", f"https://{HOST}/artikel-3"}
    assert (sorted(_key(r) for r in _log(refresh_env["run1"]))
            == sorted(_key(r) for r in refresh_env["ora1"].fetch_log))


def test_refresh_fetches_exactly_updated_and_new(refresh_env):
    """The 'Done' criterion: the second run over the updated feed
    re-fetches exactly the updated page (newer pubDate) and the new
    entry — nothing else — and the re-fetched doc carries v2 content."""
    rows = _log(refresh_env["run2"])
    got = {r["url_canon"] for r in rows}
    assert got == {f"https://{HOST}/artikel-2", f"https://{HOST}/artikel-4"}
    titles = {r["url_canon"]: r["title"] for r in rows}
    assert titles[f"https://{HOST}/artikel-2"] == "a2-v2"
    assert titles[f"https://{HOST}/artikel-4"] == "a4-v2"


def test_refresh_parity_with_oracle(refresh_env):
    assert (sorted(_key(r) for r in _log(refresh_env["run2"]))
            == sorted(_key(r) for r in refresh_env["ora2"].fetch_log))


def test_validators_match_kernel():
    """RFC 9110 precedence: etag equality wins when both sides have
    one; otherwise Last-Modified not-newer; otherwise never a 304."""
    from crawlray.sources.transport import validators_match

    assert validators_match("e1", -1, "e1", -1)
    assert not validators_match("e1", 100, "e2", 100)  # etag outranks lm
    assert validators_match(None, 100, None, 100)
    assert validators_match(None, 100, None, 50)
    assert not validators_match(None, 100, None, 200)  # server newer
    assert not validators_match(None, -1, None, 100)   # no client stamp
    assert not validators_match(None, 100, None, -1)   # no server stamp
    assert not validators_match(None, -1, "e1", 100)   # no condition


def _cond_pages(rss_items, a1_marker, a1_etag, a1_lm, a2_etag, a2_lm):
    """Conditional-refetch fixture web on cond.nl: root links artikel-1/2,
    /rss.xml stamps them; server validators (etag + Last-Modified) per
    page. artikel-2's body never changes across versions."""
    host = "cond.nl"
    arts = ["/artikel-1", "/artikel-2"]
    urls = [f"https://{host}/", f"https://{host}/rss.xml"] + [
        f"https://{host}{p}" for p in arts]
    rows = "".join(
        f"<item><title>t</title><link>https://{host}{p}</link>"
        f"<pubDate>{d}</pubDate></item>" for p, d in rss_items)
    rss = (f"<?xml version='1.0'?><rss version='2.0'><channel>{rows}"
           f"</channel></rss>").encode()
    bodies = [_html(arts), rss, _html([], f"a1-{a1_marker}"),
              _html([], "a2-v1")]
    return pa.table({
        "url": urls,
        "host": [host] * 4,
        "status": pa.array([200] * 4, type=pa.int16()),
        "content_type": ["text/html", "application/rss+xml",
                         "text/html", "text/html"],
        "html": pa.array(bodies, type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * 4, type=pa.float32()),
        "etag": [None, None, a1_etag, a2_etag],
        "last_modified_us": pa.array([-1, -1, a1_lm, a2_lm],
                                     type=pa.int64()),
    })


def test_conditional_refetch_304(ray_session, tmp_path):
    """VERDICT r3 'Next round' #5 'Done' criterion: a refresh run over a
    feed whose stamps were bumped re-fetches conditionally — the page
    whose content (etag) is unchanged revalidates as a 304-style no-op
    (no body re-download, no doc re-store), the genuinely-changed page
    re-fetches as a 200 with the new content. Engine ≡ oracle on the
    full fetch log including the 304 statuses."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "cond.nl"
    v1 = _cond_pages([("/artikel-1", D1), ("/artikel-2", D1)],
                     "v1", "e-a1-v1", 1_000, "e-a2-v1", 2_000)
    # both feed stamps bumped; only artikel-1's content actually changed
    v2 = _cond_pages([("/artikel-1", D3), ("/artikel-2", D3)],
                     "v2", "e-a1-v2", 9_000, "e-a2-v1", 2_000)
    p1, p2 = str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")
    pq.write_table(v1, p1)
    pq.write_table(v2, p2)
    seeds = [f"https://{host}/"]
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg1, cfg2 = _cfg(p1), _cfg(p2)
    run1, run2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    run_crawl(run1, seeds, robots_t, cfg1)
    run_crawl(run2, seeds, robots_t, cfg2, prior_run_dir=run1)
    rows2 = _log(run2)
    statuses = {r["url_canon"]: r["status"] for r in rows2}
    assert statuses == {f"https://{host}/artikel-1": 200,
                        f"https://{host}/artikel-2": 304}
    titles = {r["url_canon"]: r["title"] for r in rows2}
    assert titles[f"https://{host}/artikel-1"] == "a1-v2"
    assert titles[f"https://{host}/artikel-2"] is None  # no re-parse
    # oracle parity on the full log, 304s included
    ora1 = crawl_oracle(seeds, RobotsPolicy.from_arrow(robots_t),
                        build_pages_index(v1), cfg1)
    ora2 = crawl_oracle(seeds, RobotsPolicy.from_arrow(robots_t),
                        build_pages_index(v2), cfg2, prior=ora1)
    assert (sorted(_key(r) for r in rows2)
            == sorted(_key(r) for r in ora2.fetch_log))
    assert set(ora2.docs) == {f"https://{host}/artikel-1"}
    # a third run over the SAME web is a full no-op (stamps not newer)
    run3 = str(tmp_path / "run3")
    run_crawl(run3, seeds, robots_t, cfg2, prior_run_dir=run2)
    assert _log(run3) == []


def test_rerefresh_is_a_noop(refresh_env, ray_session):
    """Chaining a third run off the refresh with an UNCHANGED feed
    fetches nothing: equal stamps are not strictly newer. Oracle
    agrees."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    run3 = str(refresh_env["root"] / "run3")
    run_crawl(run3, refresh_env["seeds"], refresh_env["robots_t"],
              refresh_env["cfg2"], prior_run_dir=refresh_env["run2"])
    assert _log(run3) == []
    ora3 = crawl_oracle(
        refresh_env["seeds"],
        RobotsPolicy.from_arrow(refresh_env["robots_t"]),
        build_pages_index(refresh_env["v2"]), refresh_env["cfg2"],
        prior=refresh_env["ora2"],
    )
    assert ora3.fetch_log == []
