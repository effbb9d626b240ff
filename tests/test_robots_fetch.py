"""S2 robots.txt text parsing + fetch mode (VERDICT r1 item #3): the
grammar parser (User-agent groups, Allow/Disallow, Crawl-delay), parity
of fetch-derived policy vs the pre-parsed table policy, and full crawl
parity engine-vs-oracle with robots_mode='fetch'.
"""

import dataclasses
import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import (
    DEFAULT_UA,
    RobotsPolicy,
    parse_robots_txt,
)

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=FETCH_COLS) for f in files])
    return sorted(tuple(r[c] for c in FETCH_COLS) for r in t.to_pylist())


# ------------------------------------------------------------- grammar

SAMPLE = """
# comment line
Disallow: /ignored-before-any-group/

User-agent: googlebot
Disallow: /

User-agent: crawlray
User-agent: anderebot
Disallow: /prive/
Allow: /prive/openbaar/
Crawl-delay: 0.25

User-agent: *
Disallow: /alles/
"""


def test_parse_selects_most_specific_group():
    allow, deny, delay = parse_robots_txt(SAMPLE, "crawlray")
    assert deny == ["/prive/"]
    assert allow == ["/prive/openbaar/"]
    assert delay == 250


def test_parse_falls_back_to_star_group():
    allow, deny, delay = parse_robots_txt(SAMPLE, "onbekendebot",
                                          default_delay_ms=700)
    assert deny == ["/alles/"]
    assert allow == []
    assert delay == 700  # * group has no Crawl-delay → default


def test_parse_other_named_group():
    _a, deny, _d = parse_robots_txt(SAMPLE, "googlebot")
    assert deny == ["/"]


def test_parse_no_groups_means_allow_all():
    allow, deny, delay = parse_robots_txt("just noise\n\n", "crawlray",
                                          default_delay_ms=123)
    assert (allow, deny, delay) == ([], [], 123)


def test_parse_merges_groups_with_same_agent():
    txt = """User-agent: crawlray
Disallow: /a/

User-agent: crawlray
Disallow: /b/
Crawl-delay: 2
"""
    allow, deny, delay = parse_robots_txt(txt, "crawlray")
    assert deny == ["/a/", "/b/"]
    assert delay == 2000


def test_parse_empty_disallow_is_allow_all():
    txt = "User-agent: *\nDisallow:\n"
    allow, deny, _ = parse_robots_txt(txt, "crawlray")
    assert deny == [] and allow == []


def test_fixture_robots_txt_matches_table_policy():
    """Parsing the fixture's robots.txt bodies must reproduce the robots
    TABLE's decisions exactly (same deny set + crawl delay per host)."""
    from crawlray.sources.miniweb import make_web

    _s, robots_t, pages = make_web(n_hosts=5, pages_per_host=4,
                                   hot_factor=1, with_robots_txt=True)
    table_pol = RobotsPolicy.from_arrow(robots_t)
    bodies = {
        h: b for h, b, u in zip(pages["host"].to_pylist(),
                                pages["html"].to_pylist(),
                                pages["url"].to_pylist())
        if u.endswith("/robots.txt")
    }
    assert len(bodies) == 5
    for h, body in bodies.items():
        allow, deny, delay = parse_robots_txt(body.decode(), DEFAULT_UA)
        assert deny == ["/prive/"], h
        assert delay == table_pol.crawl_delay_ms(h), h
        fetched_pol = RobotsPolicy(
            [{"host": h, "allow": allow, "deny": deny, "crawl_delay_ms": delay}]
        )
        for path in ("/", "/sectie/1/artikel-3", "/prive/geheim-1",
                     "/prive/", "/alles/x"):
            u = f"https://{h}{path}"
            assert fetched_pol.allowed(u) == table_pol.allowed(u), (h, path)


# ------------------------------------------------------- crawl parity


@pytest.fixture(scope="module")
def robots_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web

    root = tmp_path_factory.mktemp("robots")
    paths = write_web(str(root / "web"), n_hosts=5, pages_per_host=12,
                      hot_factor=4, with_robots_txt=True)
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    base = CrawlConfig(
        n_parts=4, seen_shards=2, max_depth=6, max_waves=4,
        max_pages_per_host=60,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
        schedule_mode="wave_start",
    )
    run_table = str(root / "run_table")
    run_fetch = str(root / "run_fetch")
    run_crawl(run_table, seeds, robots_t, base)
    cfg_fetch = dataclasses.replace(base, robots_mode="fetch")
    run_crawl(run_fetch, seeds, None, cfg_fetch)
    return {"root": root, "paths": paths, "seeds": seeds,
            "robots_t": robots_t, "base": base, "cfg_fetch": cfg_fetch,
            "run_table": run_table, "run_fetch": run_fetch}


def test_fetch_mode_matches_table_mode(robots_env):
    """Identical allow/deny/delay decisions → identical crawls."""
    a = _log(robots_env["run_table"])
    b = _log(robots_env["run_fetch"])
    assert len(a) > 50
    assert a == b


def test_fetch_mode_oracle_parity(robots_env):
    from crawlray.state.robots import RobotsPolicy as RP
    from tests.oracle import build_pages_index, crawl_oracle

    cfg = robots_env["cfg_fetch"]
    oracle = crawl_oracle(
        robots_env["seeds"],
        RP([], default_delay_ms=cfg.default_delay_ms),  # starts EMPTY
        build_pages_index(pq.read_table(robots_env["paths"]["pages"])),
        cfg,
    )
    eng = _log(robots_env["run_fetch"])
    ora = sorted(tuple(r[c] for c in FETCH_COLS) for r in oracle.fetch_log)
    assert eng == ora


def test_fetch_mode_denied_never_fetched(robots_env):
    for k in _log(robots_env["run_fetch"]):
        assert "/prive/" not in k[4]


def test_robots_mode_validation():
    with pytest.raises(ValueError):
        CrawlConfig(robots_mode="fetch")  # requires wave_start
    with pytest.raises(ValueError):
        CrawlConfig(robots_mode="nonsense")


def test_parse_foreign_token_containing_ua_does_not_win():
    """RFC 9309: the group token must be a substring of the crawler UA —
    'crawlray-images' contains 'crawlray' but is NOT our group (ADVICE
    r2: bidirectional substring matching let it outrank the exact
    group)."""
    txt = """User-agent: crawlray-images
Disallow: /img/

User-agent: crawlray
Disallow: /doc/
"""
    _a, deny, _d = parse_robots_txt(txt, "crawlray")
    assert deny == ["/doc/"]


def test_robots_fetcher_5xx_is_transient_deny_all(tmp_path):
    """5xx robots.txt → temporary deny-all that is NOT cached as known
    (retried next wave); 4xx → allow-all, cached; 200 → parsed rules
    (ADVICE r2 / RFC 9309 §2.3.1.4)."""
    from crawlray.state.robots import RobotsFetcher

    pages = pa.table({
        "url": ["https://ok.nl/robots.txt", "https://down.nl/robots.txt"],
        "status": [200, 503],
        "content_type": ["text/plain", "text/html"],
        "html": [b"User-agent: *\nDisallow: /x/\n", b""],
        "latency_ms": [5.0, 5.0],
    })
    p = tmp_path / "pages.parquet"
    pq.write_table(pages, str(p))
    fetcher = RobotsFetcher({"kind": "sim", "pages_path": str(p)},
                            default_delay_ms=700)
    rows = fetcher(pa.table({
        "host": ["ok.nl", "down.nl", "absent.nl"]})).to_pylist()
    by = {r["host"]: r for r in rows}
    assert by["ok.nl"]["fetched_ok"] and by["ok.nl"]["deny"] == ["/x/"]
    assert not by["down.nl"]["fetched_ok"]
    assert by["down.nl"]["deny"] == ["/"]          # temporary deny-all
    assert by["absent.nl"]["fetched_ok"]           # 404 is definitive
    assert by["absent.nl"]["deny"] == []

    pol = RobotsPolicy([], default_delay_ms=700)
    pol.add_rows(rows)
    assert pol.known() == {"ok.nl", "absent.nl"}   # down.nl retried
    assert not pol.allowed("https://down.nl/anything")
    assert pol.allowed("https://absent.nl/anything")
    # the retry succeeds later → host becomes durably known
    pol.add_rows([{"host": "down.nl", "allow": [], "deny": [],
                   "crawl_delay_ms": 700, "fetched_ok": True}])
    assert "down.nl" in pol.known()
    assert pol.allowed("https://down.nl/anything")


def test_parse_robots_sitemaps():
    """Sitemap: directives are group-independent (RFC 9309 / sitemaps
    .org): collected from anywhere in the file, order-preserving,
    deduped; absent directive → []."""
    from crawlray.state.robots import parse_robots_sitemaps

    txt = """Sitemap: https://a.nl/deep/map-1.xml
User-agent: googlebot
Disallow: /
Sitemap: https://a.nl/map-2.xml

User-agent: crawlray
Disallow: /x/
Sitemap: https://a.nl/deep/map-1.xml
"""
    assert parse_robots_sitemaps(txt) == [
        "https://a.nl/deep/map-1.xml", "https://a.nl/map-2.xml"]
    assert parse_robots_sitemaps(SAMPLE) == []


def test_robots_declared_sitemap_discovered(ray_session, tmp_path):
    """A robots.txt `Sitemap:` directive pointing at a NON-default path
    is probed as a discovery channel: its pages (linked nowhere, absent
    from /sitemap.xml and /rss.xml) are crawled — engine ≡ oracle on
    the full fetch log."""
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.state.robots import RobotsPolicy as RP
    from tests.oracle import build_pages_index, crawl_oracle

    host = "smap.nl"
    robots_txt = (b"User-agent: *\nDisallow: /prive/\nCrawl-delay: 0.01\n"
                  b"Sitemap: https://smap.nl/deep/custom-map.xml\n")
    sm = (b"<?xml version='1.0'?>"
          b"<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
          b"<url><loc>https://smap.nl/verborgen/artikel-9</loc></url>"
          b"</urlset>")
    html = (b"<html><head><title>t</title></head>"
            b"<body><p>inhoud.</p></body></html>")
    pages = pa.table({
        "url": [f"https://{host}/robots.txt",
                f"https://{host}/deep/custom-map.xml",
                f"https://{host}/",
                f"https://{host}/verborgen/artikel-9"],
        "host": [host] * 4,
        "status": pa.array([200] * 4, type=pa.int16()),
        "content_type": ["text/plain", "application/xml",
                         "text/html", "text/html"],
        "html": pa.array([robots_txt, sm, html, html],
                         type=pa.large_binary()),
        "latency_ms": pa.array([5.0] * 4, type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=4, max_waves=4,
        max_pages_per_host=20, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2), robots_mode="fetch",
        schedule_mode="wave_start",
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], None, cfg)
    eng = _log(run_dir)
    fetched = {k[4] for k in eng}
    assert f"https://{host}/verborgen/artikel-9" in fetched
    ora = crawl_oracle(
        [f"https://{host}/"], RP([], default_delay_ms=cfg.default_delay_ms),
        build_pages_index(pages), cfg,
    )
    assert eng == sorted(tuple(r[c] for c in FETCH_COLS)
                         for r in ora.fetch_log)


def test_wildcard_rule_matching():
    """RFC 9309 §2.2.2: `*` matches any byte sequence (incl. empty), a
    trailing `$` anchors the end of the path, the match target includes
    the query string, and the longest matching rule wins (allow beats
    deny on equal length)."""
    pol = RobotsPolicy([{
        "host": "w.nl",
        "allow": ["/archief/*/open"],
        "deny": ["/archief/", "/*.pdf$", "/zoek?*sessie="],
        "crawl_delay_ms": 10,
    }])
    assert not pol.allowed("https://w.nl/archief/2020/x")
    # longer allow rule beats the shorter deny prefix
    assert pol.allowed("https://w.nl/archief/2020/open")
    # $ anchors: .pdf at the end is denied, .pdf in the middle is not
    assert not pol.allowed("https://w.nl/docs/rapport.pdf")
    assert pol.allowed("https://w.nl/docs/rapport.pdf.html")
    # query string participates in matching
    assert not pol.allowed("https://w.nl/zoek?q=x&sessie=42")
    assert pol.allowed("https://w.nl/zoek?q=x")
    # * can match empty
    assert not pol.allowed("https://w.nl/archief/")
    assert pol.allowed("https://w.nl/archief/open/open")


def test_wildcard_rules_crawl_parity(ray_session, tmp_path):
    """End-to-end: wildcard deny rules gate the crawl identically in
    the engine and the oracle (shared RobotsPolicy — the parity is
    structural, this pins the wiring)."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "wild.nl"

    def html(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"<html><head><title>t</title></head><body><p>tekst.</p>"
                f"{body}</body></html>").encode()

    urls = [f"https://{host}/", f"https://{host}/a/rapport.pdf",
            f"https://{host}/a/rapport.pdf.html",
            f"https://{host}/archief/2020/x",
            f"https://{host}/archief/2020/open"]
    pages = pa.table({
        "url": urls,
        "host": [host] * 5,
        "status": pa.array([200] * 5, type=pa.int16()),
        "content_type": ["text/html"] * 5,
        "html": pa.array([html([u for u in urls[1:]]), html([]), html([]),
                          html([]), html([])], type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * 5, type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host],
        "allow": [["/archief/*/open"]],
        "deny": [["/archief/", "/*.pdf$"]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=3, max_waves=3,
        max_pages_per_host=20, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    eng = _log(run_dir)
    fetched = {k[4] for k in eng}
    assert fetched == {f"https://{host}/",
                       f"https://{host}/a/rapport.pdf.html",
                       f"https://{host}/archief/2020/open"}
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert eng == sorted(tuple(r[c] for c in FETCH_COLS)
                         for r in ora.fetch_log)
