"""§2.10 extension surface: custom Ray Data Datasource / Datasink.

SURVEY §2.10 promises "custom sources/sinks via read_datasource /
write_datasink"; this module makes both hooks real:

- ``FeedFileDatasource`` — reads a directory/list of sitemap / RSS /
  Atom XML files as a distributed Ray Data source: files are split
  across ``parallelism`` ReadTasks, each task parses its shard with the
  same stdlib parsers the crawl loop uses (sources/feeds.py) and yields
  one Arrow block of (url, title, stamp_us, kind, src_file) rows. At
  100 TB this is the "re-ingest a feed dump" path: no driver-side
  parsing, blocks sized by file shards, metadata carries input files
  for lineage.
- ``ManifestParquetDatasink`` — the checkpoint-sink pattern the crawl
  engine uses (deterministic fragment names, atomic rename, manifest
  commit) formalized as a reusable ``ray.data.Datasink``: each write
  task lands ``part-{task_idx:05d}-{block_idx}.parquet`` fragments
  (idempotent under Ray task retry — a re-executed task overwrites its
  own fragment, never duplicates it), and ``on_write_complete`` commits
  a ``manifest.json`` naming every fragment + row count. A run that
  died mid-write leaves NO manifest → a resume sees "not written" and
  rewrites; a finished directory is immutable.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Datasource, ReadTask
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasink

from .feeds import lastmod_to_us, parse_feed, parse_sitemap

_FEED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.string()),
    ("stamp_us", pa.int64()),
    ("kind", pa.string()),
    ("src_file", pa.string()),
])


def _parse_feed_file(path: str) -> pa.Table:
    """One XML file → one Arrow table. Sitemap urlsets contribute
    (url, lastmod); RSS/Atom contribute (url, title, pubDate). Malformed
    XML yields zero rows (same policy as the crawl loop: a broken feed
    is absent, not fatal)."""
    with open(path, "rb") as fh:
        body = fh.read()
    urls: list[str] = []
    titles: list = []
    stamps: list[int] = []
    kinds: list[str] = []
    pages, children = parse_sitemap(body)
    if pages or children:
        for url, lastmod in pages:
            urls.append(url)
            titles.append(None)
            stamps.append(lastmod_to_us(lastmod))
            kinds.append("sitemap")
        for url in children:
            urls.append(url)
            titles.append(None)
            stamps.append(lastmod_to_us(None))
            kinds.append("sitemap_index")
    else:
        for url, title, published in parse_feed(body):
            urls.append(url)
            titles.append(title)
            stamps.append(lastmod_to_us(published))
            kinds.append("feed")
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "title": pa.array(titles, type=pa.string()),
        "stamp_us": pa.array(stamps, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "src_file": pa.array([os.path.basename(path)] * len(urls),
                             type=pa.string()),
    }, schema=_FEED_SCHEMA)


class FeedFileDatasource(Datasource):
    """Distributed reader for a feed-XML dump (directory or file list)."""

    def __init__(self, paths: str | list[str]):
        if isinstance(paths, str):
            self._paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".xml"))
        else:
            self._paths = sorted(paths)

    def get_name(self) -> str:
        return "FeedFiles"

    def estimate_inmemory_data_size(self):
        try:
            return sum(os.path.getsize(p) for p in self._paths)
        except OSError:
            return None

    def get_read_tasks(self, parallelism: int) -> List[ReadTask]:
        parallelism = max(1, min(parallelism, len(self._paths)))
        shards = [self._paths[i::parallelism] for i in range(parallelism)]

        def make_read(shard: list[str]):
            def read() -> Iterable[pa.Table]:
                tables = [_parse_feed_file(p) for p in shard]
                yield pa.concat_tables(tables) if tables else _FEED_SCHEMA.empty_table()
            return read

        tasks = []
        for shard in shards:
            if not shard:
                continue
            meta = BlockMetadata(
                num_rows=None,
                size_bytes=sum(os.path.getsize(p) for p in shard),
                exec_stats=None,
                input_files=shard,
            )
            tasks.append(ReadTask(make_read(shard), meta))
        return tasks


class ManifestParquetDatasink(Datasink):
    """Parquet fragments with deterministic retry-idempotent names plus
    an atomic ``manifest.json`` commit (the S7 checkpoint discipline as
    a reusable write_datasink)."""

    def __init__(self, out_dir: str):
        self._dir = out_dir

    def get_name(self) -> str:
        return "ManifestParquet"

    def on_write_start(self) -> None:
        os.makedirs(self._dir, exist_ok=True)

    def write(self, blocks: Iterable, ctx) -> list[dict]:
        frags: list[dict] = []
        for i, block in enumerate(blocks):
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            name = f"part-{ctx.task_idx:05d}-{i:03d}.parquet"
            tmp = os.path.join(self._dir, f".{name}.tmp-{os.getpid()}")
            pq.write_table(block, tmp)
            os.replace(tmp, os.path.join(self._dir, name))  # idempotent
            frags.append({"file": name, "rows": block.num_rows})
        return frags

    def on_write_complete(self, write_result) -> None:
        frags = [f for task_frags in write_result.write_returns
                 for f in task_frags]
        frags.sort(key=lambda f: f["file"])
        tmp = os.path.join(self._dir, ".manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"fragments": frags,
                       "rows": sum(f["rows"] for f in frags)}, fh)
        os.replace(tmp, os.path.join(self._dir, "manifest.json"))

    def on_write_failed(self, error: Exception) -> None:
        # no manifest → the directory reads as "not written"; fragments
        # from the failed attempt are overwritten by the retry
        pass
