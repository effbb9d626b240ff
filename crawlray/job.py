"""Entry point B (SURVEY §3.2): the crawl job CLI.

    ray job submit --working-dir . -- python -m crawlray.job --config crawl.json
    python -m crawlray.job --config crawl.json --resume

The config JSON maps 1:1 onto CrawlConfig plus run inputs:

    {
      "run_dir": "/data/run1",
      "seeds": ["https://news-0.nl/", ...],      # or "seeds_path": parquet
      "robots_path": "robots.parquet",           # host/allow/deny/crawl_delay_ms
      "n_parts": 32, "seen_shards": 8, "max_waves": 8, ...,
      "transport": {"kind": "http"}              # or sim/synth specs
    }

This is the ONLY crawlray module that may own a Ray session, and only
when none exists (``ray job submit`` starts one; standalone runs
auto-init). Library code never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys

import pyarrow.parquet as pq


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="crawlray.job")
    ap.add_argument("--config", required=True, help="path to crawl config JSON")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the run_dir's last committed wave")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        conf = json.load(f)

    from .pipelines.config import CrawlConfig
    from .pipelines.crawl import run_crawl

    run_dir = conf.pop("run_dir")
    seeds = conf.pop("seeds", None)
    seeds_path = conf.pop("seeds_path", None)
    if seeds is None:
        if seeds_path is None:
            ap.error("config needs 'seeds' (list) or 'seeds_path' (parquet)")
        seeds = pq.read_table(seeds_path, columns=["url"])["url"].to_pylist()
    robots_path = conf.pop("robots_path", None)
    robots_table = pq.read_table(robots_path) if robots_path else None
    known = set(CrawlConfig.__dataclass_fields__)
    cfg_kwargs = {k: v for k, v in conf.items() if k in known}
    unknown = set(conf) - known
    if unknown:
        ap.error(f"unknown config keys: {sorted(unknown)}")
    if "fetch_concurrency" in cfg_kwargs:
        cfg_kwargs["fetch_concurrency"] = tuple(cfg_kwargs["fetch_concurrency"])
    if "parse_concurrency" in cfg_kwargs:
        cfg_kwargs["parse_concurrency"] = tuple(cfg_kwargs["parse_concurrency"])
    cfg = CrawlConfig(**cfg_kwargs)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(include_dashboard=False)
    try:
        summary = run_crawl(run_dir, seeds, robots_table, cfg, resume=args.resume)
        print(json.dumps(summary))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
