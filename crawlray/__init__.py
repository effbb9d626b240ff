"""crawlray — a from-scratch Ray-Data-native URL-frontier + fetch scheduler.

Capabilities of the reference (`RoelvandenBerg/nlnieuwscrawler`, a sequential
Dutch-news harvesting loop — see SURVEY.md §0 for the provenance ledger: the
reference mount is empty this session, so behavior is specified by
BASELINE.json's north rule plus the sequential oracle in tests/oracle.py),
re-expressed Ray-Data-first:

- ``ray.data.Dataset`` per logical table, ``map_batches`` over zero-copy
  Arrow batches everywhere, actor pools for stateful stages.
- Sharded cuckoo-filter URL-seen set over canonicalized + murmur3-hashed
  URLs (state/), per-host politeness priority queues, host-hash partitioned
  shuffles with hot-host skew splitting (pipelines/crawl.py).
- Lance-shaped interleaved text+media docs output (sources/lance_compat.py),
  per-partition checkpoints + lineage + metrics.

Never calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by the
driver, bench.py, and the test fixture only.
"""

__version__ = "0.1.0"
