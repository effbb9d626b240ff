"""§2.10 custom Datasource / Datasink round-trips (crawlray/sources/ray_io.py)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <item><link>https://a.nl/x</link><title>X</title>
    <pubDate>Mon, 05 Jan 2026 10:00:00 GMT</pubDate></item>
  <item><link>https://a.nl/y</link><title>Y</title></item>
</channel></rss>
"""

SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://b.nl/p1</loc><lastmod>2026-02-01</lastmod></url>
  <url><loc>https://b.nl/p2</loc></url>
</urlset>
"""


@pytest.fixture()
def feed_dir(tmp_path):
    for i in range(3):
        (tmp_path / f"rss{i}.xml").write_text(RSS.replace("a.nl", f"a{i}.nl"))
    (tmp_path / "map.xml").write_text(SITEMAP)
    (tmp_path / "broken.xml").write_text("<not-xml")
    (tmp_path / "ignored.txt").write_text("nope")
    return str(tmp_path)


def test_feed_datasource_reads_all_files(ray_session, feed_dir):
    from crawlray.sources.ray_io import FeedFileDatasource

    ds = rd.read_datasource(FeedFileDatasource(feed_dir))
    df = ds.to_pandas().sort_values(["src_file", "url"], ignore_index=True)
    # 3 RSS files x 2 items + 2 sitemap pages; broken.xml contributes 0
    assert len(df) == 8
    assert set(df["kind"]) == {"feed", "sitemap"}
    rss0 = df[df["src_file"] == "rss0.xml"]
    assert list(rss0["url"]) == ["https://a0.nl/x", "https://a0.nl/y"]
    assert list(rss0["title"]) == ["X", "Y"]
    # absent pubDate → -1 (the lastmod_to_us convention the refresh
    # version store shares)
    assert rss0["stamp_us"].iloc[0] > 0 and rss0["stamp_us"].iloc[1] == -1
    sm = df[df["kind"] == "sitemap"]
    assert set(sm["url"]) == {"https://b.nl/p1", "https://b.nl/p2"}


def test_feed_datasource_parallel_tasks(ray_session, feed_dir):
    from crawlray.sources.ray_io import FeedFileDatasource

    src = FeedFileDatasource(feed_dir)
    tasks = src.get_read_tasks(parallelism=4)
    assert 1 < len(tasks) <= 4
    # every xml file is covered by exactly one task
    covered = [f for t in tasks for f in t.metadata.input_files]
    assert sorted(os.path.basename(f) for f in covered) == [
        "broken.xml", "map.xml", "rss0.xml", "rss1.xml", "rss2.xml"]
    # high parallelism must not outnumber files
    assert len(src.get_read_tasks(parallelism=100)) <= 5


def test_manifest_datasink_roundtrip(ray_session, tmp_path):
    from crawlray.sources.ray_io import ManifestParquetDatasink

    out = str(tmp_path / "sink")
    tbl = pa.table({"k": list(range(100)), "v": [f"s{i}" for i in range(100)]})
    ds = rd.from_arrow(tbl).repartition(4)
    ds.write_datasink(ManifestParquetDatasink(out))

    with open(os.path.join(out, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 100
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files == sorted(f["file"] for f in manifest["fragments"])
    assert sum(f["rows"] for f in manifest["fragments"]) == 100
    back = pq.read_table(
        [os.path.join(out, f) for f in files]
    ).to_pandas().sort_values("k", ignore_index=True)
    assert list(back["k"]) == list(range(100))
    assert list(back["v"]) == [f"s{i}" for i in range(100)]


def test_manifest_datasink_fragment_names_deterministic(ray_session, tmp_path):
    """Same dataset written twice lands identical fragment names (the
    retry-idempotence property: a re-executed write task replaces its own
    fragment instead of adding a new one)."""
    from crawlray.sources.ray_io import ManifestParquetDatasink

    tbl = pa.table({"k": list(range(40))})
    names = []
    for run in range(2):
        out = str(tmp_path / f"sink{run}")
        rd.from_arrow(tbl).repartition(2).write_datasink(
            ManifestParquetDatasink(out))
        names.append(sorted(f for f in os.listdir(out)
                            if f.endswith(".parquet")))
    assert names[0] == names[1]
