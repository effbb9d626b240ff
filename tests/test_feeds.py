"""S3/S4 discovery-channel parsers + SynthTransport fidelity + job CLI."""

import json

import pyarrow as pa
import pytest

from crawlray.sources.feeds import discover_batch, parse_feed, parse_sitemap

SITEMAP = b"""<?xml version='1.0'?>
<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>
 <url><loc>https://news-0.nl/a</loc><lastmod>2024-03-05</lastmod></url>
 <url><loc> https://news-0.nl/b </loc></url>
 <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

SITEMAP_INDEX = b"""<?xml version='1.0'?>
<sitemapindex xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>
 <sitemap><loc>https://news-0.nl/sitemap-1.xml</loc></sitemap>
 <sitemap><loc>https://news-0.nl/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

RSS = b"""<?xml version='1.0'?><rss version='2.0'><channel>
 <item><title>Artikel 1</title><link>https://news-0.nl/1</link>
  <pubDate>Mon, 04 Mar 2024 10:00:00 GMT</pubDate></item>
 <item><link>https://news-0.nl/2</link></item>
 <item><title>kapot</title></item>
</channel></rss>"""

ATOM = b"""<?xml version='1.0'?><feed xmlns='http://www.w3.org/2005/Atom'>
 <entry><title>A</title><link rel='alternate' href='https://news-0.nl/x'/>
  <published>2024-03-04T10:00:00Z</published></entry>
 <entry><title>B</title><link href='https://news-0.nl/y'/>
  <updated>2024-03-05T11:00:00+01:00</updated></entry>
</feed>"""


def test_parse_sitemap_urlset():
    pages, children = parse_sitemap(SITEMAP)
    assert children == []
    assert [u for u, _ in pages] == ["https://news-0.nl/a", "https://news-0.nl/b"]
    assert pages[0][1].strftime("%Y-%m-%d") == "2024-03-05"
    assert pages[1][1] is None


def test_parse_sitemap_index():
    pages, children = parse_sitemap(SITEMAP_INDEX)
    assert pages == []
    assert children == ["https://news-0.nl/sitemap-1.xml",
                        "https://news-0.nl/sitemap-2.xml"]


def test_parse_rss():
    items = parse_feed(RSS)
    assert [(u, t) for u, t, _ in items] == [
        ("https://news-0.nl/1", "Artikel 1"),
        ("https://news-0.nl/2", None),
    ]
    assert items[0][2].strftime("%H:%M") == "10:00"


def test_parse_atom_tz_normalized():
    items = parse_feed(ATOM)
    assert [u for u, _, _ in items] == ["https://news-0.nl/x", "https://news-0.nl/y"]
    # +01:00 published time normalized to UTC-naive
    assert items[1][2].strftime("%H:%M") == "10:00"


@pytest.mark.parametrize("junk", [b"", b"<html>not xml", b"<urlset><url>"])
def test_malformed_yields_nothing(junk):
    assert parse_sitemap(junk) == ([], [])
    assert parse_feed(junk) == []


def test_discover_batch_union_channels():
    batch = pa.table({
        "url_canon": ["https://news-0.nl/sitemap.xml",
                      "https://news-0.nl/sitemapindex.xml",
                      "https://news-0.nl/rss"],
        "content_type": ["application/xml", "application/xml", "application/rss+xml"],
        "body": [SITEMAP, SITEMAP_INDEX, RSS],
    })
    out = discover_batch(batch)
    vias = out["via"].to_pylist()
    assert vias.count("sitemap") == 2
    assert vias.count("sitemap_index") == 2
    assert vias.count("feed") == 2
    assert out["src"].to_pylist()[0] == "https://news-0.nl/sitemap.xml"


def test_synth_transport_matches_materialized_web():
    """SynthTransport must be byte-identical to the make_web pages table
    for the same parameters, and 404 everything else."""
    from crawlray.sources.miniweb import make_web, synth_page

    kw = dict(n_hosts=5, pages_per_host=12, seed=7, hot_host=1,
              hot_factor=3, fanout=3, heft=2)
    _, _, pages = make_web(**kw)
    spec = dict(kw)
    for row in pages.to_pylist():
        assert synth_page(spec, row["url"]) == (
            row["status"], row["content_type"], row["html"], row["latency_ms"]
        ), row["url"]
    for miss in ("https://news-9.nl/", "https://news-0.nl/weg/x",
                 "https://news-0.nl/sectie/1/artikel-999999",
                 "https://news-0.nl/sectie/2/artikel-1",
                 "https://elders.nl/"):
        assert synth_page(spec, miss)[0] == 404


def test_job_cli_runs_config(ray_session, tmp_path):
    """python -m crawlray.job --config ... end-to-end over SimTransport."""
    import pyarrow.parquet as pq

    from crawlray.job import main
    from crawlray.sources.miniweb import write_web

    paths = write_web(str(tmp_path / "web"), n_hosts=3, pages_per_host=6)
    conf = {
        "run_dir": str(tmp_path / "run"),
        "seeds_path": paths["seeds"],
        "robots_path": paths["robots"],
        "n_parts": 2, "seen_shards": 2, "max_waves": 2,
        "fetch_concurrency": [1, 2], "parse_concurrency": [1, 2],
        "transport": {"kind": "sim", "pages_path": paths["pages"]},
    }
    cfg_path = tmp_path / "crawl.json"
    cfg_path.write_text(json.dumps(conf))
    assert main(["--config", str(cfg_path)]) == 0
    assert (tmp_path / "run" / "manifest.json").exists()
    # resume path exercises checkpoint restore
    assert main(["--config", str(cfg_path), "--resume"]) == 0
